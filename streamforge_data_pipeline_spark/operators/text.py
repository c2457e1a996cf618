"""Text-analysis operators (E4 + training-pipeline surface).

All pure Column expressions (split/filter/aggregate higher-order
functions) — tokenization-heavy work stays inside whole-stage codegen;
no Python in the hot path. Each has a matching ANSI-SQL oracle in
registry.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from streamforge_data_pipeline_spark.functions import fan_out, finalize_released, local_rows, tokens

# Tiny function-word marker sets for deterministic language ID.
# (A production pipeline would use fastText/CLD3 via a Pandas UDF; the
# heuristic keeps the operator engine-portable and dependency-free.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}


def term_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """E4: tokenize -> explode -> hash-agg count per term."""
    return (
        fan_out(df).select(F.explode(tokens(text)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def token_count(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    return df.select(
        id_col, F.size(tokens(text)).cast("long").alias("n_tokens")
    )


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Language ID by function-word voting; argmax with deterministic
    tie-break on language code order; 'und' when no marker hits."""
    toks = tokens(text)
    scored = df.select(
        id_col,
        *[_marker_hits(toks, ms).alias(f"s_{lang}") for lang, ms in LANG_MARKERS.items()],
    )
    langs = sorted(LANG_MARKERS)  # de, en, es, fr — deterministic order
    best = F.greatest(*[F.col(f"s_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:
        pred = pred.when(F.col(f"s_{l}") == best, F.lit(l))
    return scored.select(id_col, pred.alias("lang_pred"))


def quality_expr(text: str = "text") -> Column:
    """The raw (un-rounded) quality score as a Column — shared by
    quality_score and quality_prune so both gates rank identically.

    Components (each deterministic double arithmetic):
    - length_score: min(1, n_tokens/64)
    - distinct_ratio: distinct tokens / tokens (repetition penalty)
    - stop_ratio: 'the|a|of|and|is' share (natural-language-ness)
    """
    toks = tokens(text)
    n_tok = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    stop = _marker_hits(toks, LANG_MARKERS["en"]).cast("double")
    length_score = F.least(F.lit(1.0), n_tok / F.lit(64.0))
    distinct_ratio = F.when(n_tok > 0, n_distinct / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
    return length_score * distinct_ratio + stop_ratio


def quality_score(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Length/stopword/uniqueness heuristics -> [0,1] quality (see
    quality_expr for the component definitions)."""
    toks = tokens(text)
    n_tok = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    distinct_ratio = F.when(n_tok > 0, n_distinct / n_tok).otherwise(F.lit(0.0))
    quality = quality_expr(text)
    return df.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text — the canonical-form hash used for near-exact dedup."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text)), r"\s+", " "))
    return df.select(id_col, F.md5(norm).alias("fingerprint"))


def sample_split(df: DataFrame, id_col: str = "doc_id",
                 train_pct: int = 80) -> DataFrame:
    """Deterministic hash-based train/test assignment.

    Content-stable (hash of the id, not rand()): re-running the
    pipeline or re-sharding the data never flips a document's split —
    the property training pipelines need for held-out integrity.
    """
    from streamforge_data_pipeline_spark.functions import hash60

    bucket = hash60(F.col(id_col).cast("string")) % 100
    return df.select(
        id_col,
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("test")).alias("split"),
    )


def repetition_filter(df: DataFrame, id_col: str = "doc_id", text: str = "text",
                      max_top_bigram_frac: float = 0.18) -> DataFrame:
    """Gopher-style repetition gate: flag docs whose most frequent
    bigram accounts for more than `max_top_bigram_frac` of all bigrams
    (boilerplate/spam indicator). Emits the fraction for inspection."""
    from pyspark.sql import Window

    # ONE doc-keyed exchange with a cores floor, placed BEFORE the
    # explode (r11, the _dedup_within_cells rule): the bigram window
    # needs hash(id) partitioning anyway, but its shuffle count rides
    # spark.sql.shuffle.partitions, which the streaming drains derive
    # from input BYTES — correct for their bookkeeping stages, wrong
    # for this CPU-dense-per-byte stage (measured 0.78 s single-task
    # inside the funnel drain). Repartitioning the raw docs by id also
    # spreads the explode itself (what fan_out did round-robin) and the
    # window then reuses the partitioning — one exchange total, of doc
    # rows rather than exploded token rows. At production confs the
    # max() equals the conf and the plan is the window's usual shape.
    spark = df.sparkSession
    n_part = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    toks = tokens(text)
    tok = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col), F.posexplode(toks).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bigrams = (
        tok.select(
            id_col,
            F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w)).alias("bg"),
            F.lead("tok", 1).over(w).alias("__nxt"),
        )
        .filter(F.col("__nxt").isNotNull())
        .drop("__nxt")
    )
    counts = bigrams.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy(id_col).agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_c")
    )
    frac = F.col("top_c") / F.col("total_c")
    return per_doc.select(
        id_col,
        F.round(frac, 4).alias("top_bigram_frac"),
        (frac > max_top_bigram_frac).alias("flagged"),
    )


EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Email scrubbing (the PII-removal pass of a training pipeline).
    Deterministic synthetic emails are appended first so the operator
    is exercised on data that contains PII-shaped strings."""
    with_pii = F.concat(
        F.col(text), F.lit(" contact: user"), F.col(id_col).cast("string"),
        F.lit("@example.com"),
    )
    scrubbed = F.regexp_replace(with_pii, EMAIL_RE, "[EMAIL]")
    return df.select(
        F.col(id_col),
        F.substring(scrubbed, -30, 30).alias("tail30"),
        (F.length(with_pii) - F.length(scrubbed)).cast("long").alias("chars_removed"),
    )


IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+1 555-\d{4}"


def pii_scrub_multi(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Multi-entity PII redaction — the full scrub pass a training
    pipeline runs before release (emails, IPv4 addresses, phone
    numbers), extending :func:`pii_scrub`'s email-only rule. Emits per
    doc the redaction counts and the md5 of the scrubbed text, so the
    differential checks the REPLACEMENT result, not just the counts.

    Deterministic synthetic PII is injected first (the testdata corpus
    carries none): different doc_id residues get an email, an IP, a
    phone, or combinations — so docs with 0, 1, 2 and 3 entity classes
    all occur. All three patterns are portable between Java regex
    (Spark, codegen'd — no UDF) and RE2 (DuckDB): character classes,
    bounded repeats and word boundaries only. Emails are replaced
    first so no later pattern can match inside an unreplaced longer
    entity (and IPs are counted on the email-scrubbed text for the
    same reason). md5 rather than sha1/sha2 for the scrub digest: the
    one digest both engines expose identically. One narrow projection;
    scrubbing 100 TB is a map-only job.
    """
    with_pii = F.concat(
        F.col(text),
        F.when(
            F.col(id_col) % 3 == 0,
            F.concat(
                F.lit(" mail user"),
                F.col(id_col).cast("string"),
                F.lit("@test.org"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col(id_col) % 4 == 1,
            F.concat(
                F.lit(" ip 10."),
                (F.col(id_col) % 256).cast("string"),
                F.lit(".0.9"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col(id_col) % 5 == 2,
            F.concat(
                F.lit(" call +1 555-"),
                F.lpad((F.col(id_col) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(with_pii, EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(with_pii, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(
            F.regexp_replace(with_pii, EMAIL_RE, "<EMAIL>"), F.lit(IPV4_RE)
        ).cast("int").alias("n_ips"),
        F.regexp_count(with_pii, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
        F.md5(scrubbed.cast("binary")).alias("clean_md5"),
    )


def corpus_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """One-row corpus profile: doc count, token total, distinct-text
    count (exact dup rate), mean doc length — the dashboard numbers a
    corpus build reports after each stage."""
    toks = tokens(text)
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks).cast("long")).alias("total_tokens"),
        F.countDistinct(F.sha2(F.col(text), 256)).alias("distinct_texts"),
        F.round(
            F.round(F.sum(F.length(text).cast("decimal(28,10)")), 2).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_chars"),
    )


# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit
# runs, punctuation runs, each optionally space-prefixed. Portable
# between Java regex (Spark) and RE2 (DuckDB).
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def bpe_token_count(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Subword-style token counting (BPE-ish pre-tokenization regex) —
    the token-budget estimator a training pipeline runs over a corpus."""
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(F.lower(F.col(text)), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def json_extract_int(df: DataFrame, col: str, path: str, alias: str) -> DataFrame:
    """Typed JSON field extraction (events.props '{"k": 69}')."""
    return df.withColumn(
        alias, F.get_json_object(F.col(col), f"$.{path}").try_cast("int")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", k: int = 3
) -> DataFrame:
    """Top-k terms per document by tf-idf (tf * ln(N/df)).

    One shuffle per reduction: (doc, term) term frequencies, a
    term-keyed document frequency, and a row_number window for the
    per-doc top-k. Scores are rounded to 6 places BEFORE ranking so
    sub-ulp ln() differences across engines collapse into ties, which
    the lexical tie-break then resolves identically everywhere.

    Scale notes: df join is vocab-sized (let AQE pick broadcast vs
    shuffle); the window partitions by doc — no global sort; raw
    token rows reduce at the (doc, term) agg before anything wide.
    """
    from pyspark.sql import Window

    toks = fan_out(df).select(id_col, F.explode(tokens(text)).alias("term"))
    # tf feeds both the df aggregation and the score join — persist so
    # tokenization+agg run once.
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    out = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "score", F.col("rk").cast("long").alias("rk"))
    )
    return finalize_released(out, tf)


def chunk_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    width: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Split documents into overlapping character chunks for training
    (width chars per chunk, stride between starts, width-stride
    overlap). Start offsets come from a codegen'd sequence+explode —
    1->N row generation with no Python and no shuffle; chunk content
    is carried as an md5 so downstream dedup/parity work on a fixed
    64-hex column instead of re-shipping text.

    The last chunk may be shorter than ``width`` (substring truncates
    at end-of-doc); starts stop at ``n - overlap`` so every character
    lands in at least one chunk and no fully-redundant tail chunk is
    emitted.
    """
    overlap = width - stride
    n = F.length(F.col(text))
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - F.lit(overlap)), F.lit(stride)
    )
    chunks = fan_out(df).select(id_col, text, F.explode(starts).alias("start"))
    piece = F.expr(f"substring({text}, start, {width})")
    return chunks.select(
        id_col,
        ((F.col("start") - 1) / stride).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.length(piece).cast("long").alias("chunk_len"),
        F.md5(piece).alias("chunk_hash"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    partition_col: str = "source",
    capacity: int = 512,
) -> DataFrame:
    """Assign documents to fixed-capacity training bins by streaming
    fill: within each partition (in stable id order) a doc joins the
    bin its running token total lands in — bin = floor((cumsum-1) /
    capacity). Deterministic, one window pass, no driver state; a doc
    straddling a boundary belongs to the bin its cumsum closes in, so
    bins can overfill by at most one doc (the standard streaming
    approximation of bin packing — exact packing is inherently
    sequential).

    Scale notes: packing is per-``partition_col`` so the sort is
    bounded per group, never global; 10^9 docs across 10^4 sources
    keeps each window partition at ~10^5 rows.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return df.select(
        id_col,
        partition_col,
        F.col(tokens_col).cast("long").alias(tokens_col),
        cum.cast("long").alias("cum_tokens"),
        ((cum - 1) / capacity).cast("long").alias("bin"),
    )


def enrich(df: DataFrame, id_col: str = "doc_id", text: str = "text",
           keep: tuple[str, ...] = ()) -> DataFrame:
    """Single-projection document enrichment: lang_pred + n_tokens +
    quality (the same values lang_id() and quality_score() produce)
    computed from ONE tokenization in ONE scan — the fused form
    pipelines use so composing gates doesn't re-scan or join.

    ``keep`` carries extra passthrough columns (e.g. source). The text
    column itself is kept for downstream content hashing.
    """
    base = df.select(id_col, *keep, text, tokens(text).alias("__ts"))
    ts = F.col("__ts")
    langs = sorted(LANG_MARKERS)
    scored = base.select(
        id_col, *keep, text, ts.alias("__ts"),
        *[_marker_hits(ts, LANG_MARKERS[l]).alias(f"__s_{l}") for l in langs],
    )
    best = F.greatest(*[F.col(f"__s_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:
        pred = pred.when(F.col(f"__s_{l}") == best, F.lit(l))
    n_tok = F.size(ts).cast("double")
    n_distinct = F.size(F.array_distinct(ts)).cast("double")
    stop = F.col("__s_en").cast("double")
    length_score = F.least(F.lit(1.0), n_tok / F.lit(64.0))
    distinct_ratio = F.when(n_tok > 0, n_distinct / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
    return scored.select(
        id_col, *keep, text,
        pred.alias("lang_pred"),
        F.size(ts).cast("long").alias("n_tokens"),
        F.round(length_score * distinct_ratio + stop_ratio, 4).alias("quality"),
    )


def quality_prune(df: DataFrame, id_col: str = "doc_id", text: str = "text",
                  group: str = "source", keep_top: float = 0.5) -> DataFrame:
    """Per-source quality-quantile gate: keep each source's top
    `keep_top` fraction of documents by quality score (the mixture-
    balancing curation step — prune low-quality tails without letting
    one source's quality distribution set another's bar).

    Ranking uses the ROUNDED score with a doc_id tie-break so the cut
    is reproducible cross-engine (raw double ulps can't reorder), and
    percent_rank so the threshold is rank-based, not value-based — a
    50% cut keeps 50% per source regardless of score skew.

    Scale notes: one window shuffle on `group`; no global sort, no
    driver-side quantile estimation. Skewed source sizes are the risk
    at 100 TB — a mega-source becomes one partition — so the window
    key would extend to (source, shard) with per-shard ranks merged
    via approx quantiles; at testdata scale the direct window is the
    right plan.
    """
    from pyspark.sql import Window

    q = F.round(quality_expr(text), 4)
    scored = df.select(F.col(id_col), F.col(group), q.alias("quality"))
    w = Window.partitionBy(group).orderBy("quality", id_col)
    ranked = scored.withColumn("pct_rank", F.round(F.percent_rank().over(w), 4))
    return ranked.filter(F.col("pct_rank") >= F.lit(1.0) - F.lit(keep_top))


def quality_threshold_prune(df: DataFrame, id_col: str = "doc_id",
                            text: str = "text", group: str = "source",
                            keep_top: float = 0.5) -> DataFrame:
    """Per-source quality gate via a HISTOGRAM quantile — the
    100 TB-shaped sibling of :func:`quality_prune` (whose scale notes
    promise exactly this plan when a mega-source outgrows one window
    partition).

    Semantics: per source, the threshold is the highest rounded
    quality value T such that at least ceil(keep_top * n) documents
    score >= T; keep every document with quality >= T. Value-based
    (ties at T all survive) rather than rank-based — the FineWeb-style
    per-domain calibration cut, stated over the 4-dp score domain so
    it is exact and engine-portable.

    Scale notes — why this shape survives a mega-source: the quality
    score is rounded to 4 decimals in [0, ~2], so the (source,
    quality) histogram has AT MOST ~20k rows per source regardless of
    corpus size. The plan is (1) one partial-agg shuffle to build the
    histogram — map-side combine collapses each task's contribution
    to histogram width, so a source with 10^10 docs still ships only
    its distinct score values; (2) windows over the HISTOGRAM (input
    bounded by score cardinality, never doc count — the skew-immunity
    quality_prune's per-doc percent_rank window lacks); (3) a
    broadcast join of the per-source thresholds (|sources| rows) back
    onto the scored docs. No per-doc window, no global sort, no
    driver-side quantile estimation.
    """
    from pyspark.sql import Window

    q = F.round(quality_expr(text), 4)
    scored = df.select(F.col(id_col), F.col(group), q.alias("quality"))
    hist = scored.groupBy(group, "quality").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_all = Window.partitionBy(group)
    w_top = (
        Window.partitionBy(group)
        .orderBy(F.desc("quality"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        F.col(group),
        F.col("quality"),
        F.sum("cnt").over(w_top).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    thresholds = (
        cum.filter(F.col("cum") >= F.ceil(F.col("n") * F.lit(keep_top)))
        .groupBy(group)
        .agg(F.max("quality").alias("threshold"))
    )
    return (
        scored.join(F.broadcast(thresholds), group)
        .filter(F.col("quality") >= F.col("threshold"))
        .select(id_col, group, "quality", "threshold")
    )


def source_overlap(df: DataFrame, text: str = "text",
                   group: str = "source") -> DataFrame:
    """Cross-source contamination matrix: token-3-gram Jaccard between
    every pair of sources — the corpus diagnostic that tells a
    curation pipeline which domains/dumps duplicate each other before
    it weights the mixture (the per-PAIR aggregate view of what
    decontaminate measures per-doc for one split).

    Emits one row per unordered source pair that shares at least one
    shingle: (source_a, source_b, inter, n_a, n_b, jaccard).

    Scale notes: the distinct (source, shingle) relation is built with
    one partial-agg shuffle (map-side combine collapses repeats before
    the exchange), so each source contributes its shingle VOCABULARY,
    not its token stream. The pair counts come from a self-equi-join
    keyed on the shingle — a shingle shared by k sources fans out to
    k(k-1)/2 rows, bounded by |sources|^2 per shingle, and the output
    is |sources|^2/2 rows total, so with a bounded source taxonomy
    (dumps, registries, top-level domains) the join is metadata-scale.
    For a web-scale grouping (millions of hosts) the same relation
    feeds the sibling formulation — df-capped shingles +
    collect_set(source) combinations — without changing semantics;
    this entry point keeps the join form, which is the one the SQL
    oracle can express.
    """
    sh3 = F.concat_ws(
        " ", F.col("__t0"), F.col("__t1"), F.col("__t2")
    )
    toks = fan_out(df).select(F.col(group).alias("__g"), tokens(text).alias("__ts"))
    idx = toks.select(
        "__g",
        F.posexplode(
            F.slice(F.col("__ts"), 1, F.greatest(F.size("__ts") - 2, F.lit(0)))
        ).alias("__x", "__t0"),
        F.col("__ts"),
    ).select(
        "__g",
        "__t0",
        F.col("__ts")[F.col("__x") + 1].alias("__t1"),
        F.col("__ts")[F.col("__x") + 2].alias("__t2"),
    )
    sh = idx.select("__g", sh3.alias("sh")).distinct()
    sizes = sh.groupBy("__g").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("__g").alias("source_a"), "sh")
    b = sh.select(F.col("__g").alias("source_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("__g").alias("source_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("__g").alias("source_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "inter",
            "n_a",
            "n_b",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 4
            ).alias("jaccard"),
        )
    )


def decontaminate(df: DataFrame, id_col: str = "doc_id", text: str = "text",
                  train_pct: int = 80) -> DataFrame:
    """Eval-set decontamination: flag TRAIN documents that share any
    token 3-gram with the held-out split (the benchmark-leakage gate a
    training pipeline runs before packing; cf. sample_split for the
    deterministic hash split it reuses).

    Emits one row per contaminated train doc: overlap size, shingle
    count, overlap fraction.

    Scale notes: the eval shingle set is the small side by
    construction (held-out fraction of the corpus) — broadcast it so
    the train side never shuffles for the probe; at 100 TB the
    eval-side distinct shingle table is still ~1/5th of one source's
    n-grams and, if it outgrows broadcast, the join degrades to a
    shuffled semi-join on the same key with no plan rewrite. The
    shingle relation feeds both the probe and the per-doc sizes, so
    it is persisted and computed once.
    """
    from streamforge_data_pipeline_spark.functions import hash60
    from streamforge_data_pipeline_spark.operators.minhash import shingles

    # The shingle relation feeds the probe join AND the per-doc sizes —
    # persist so tokenize+distinct run once (house pattern; LRU evicts).
    sh = shingles(df, id_col, text).persist()
    is_train = hash60(F.col("doc_id").cast("string")) % 100 < train_pct
    train_sh = sh.filter(is_train)
    eval_sh = sh.filter(~is_train).select("sh").distinct()
    hits = (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    sizes = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    out = sizes.join(hits, "doc_id").select(
        "doc_id",
        "n_hits",
        "n_shingles",
        F.round(F.col("n_hits") / F.col("n_shingles"), 4).alias("overlap_frac"),
    )
    return finalize_released(out, sh)


def ngram_counts(df: DataFrame, id_col: str = "doc_id", text: str = "text",
                 k: int = 50) -> DataFrame:
    """Corpus n-gram statistics: top-k token 3-grams by occurrence
    count with document frequency — the LM-data profiling/boilerplate-
    detection counterpart of term_counts.

    Scale notes: the classic two-level shape — partial counts per
    partition combine before the single shuffle on the n-gram key, and
    the top-k is TakeOrderedAndProject (per-partition heaps, no global
    sort). countDistinct(doc_id) expands to a two-phase distinct-
    aggregate on the same key, so the query still shuffles once.
    Deterministic tie-break on the n-gram string keeps rank-k stable.
    """
    from streamforge_data_pipeline_spark.operators.minhash import shingles_raw

    sh = shingles_raw(df, id_col, text)
    counts = sh.groupBy("sh").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return (
        counts.orderBy(F.col("n").desc(), "sh")
        .limit(k)
        .select(F.col("sh").alias("ngram"), "n", "n_docs")
    )


def inverted_index(df: DataFrame, id_col: str = "doc_id", text: str = "text",
                   min_df: int = 2, max_postings: int = 20) -> DataFrame:
    """Build an inverted index: term -> document frequency + the first
    `max_postings` doc ids (sorted) as a CSV posting preview — the
    search-side artifact of the corpus (tf-idf's sibling; the postings
    cap bounds the row width the way a real index pages its lists).

    Scale notes: distinct (doc_id, term), then a row_number window on
    (term, doc_id) ranks each term's postings BEFORE aggregation, so
    the collect_list only ever sees `rn <= max_postings` ids: for a
    stopword term at 100 TB the aggregation state per group is capped
    at max_postings elements instead of one array holding ~every doc
    id in the corpus on a single reducer. Doc frequency falls out of
    the same window as max(rn) — no second count over the unfiltered
    relation. The window's exchange hash-partitions on term and the
    groupBy reuses that partitioning, so the whole operator is still
    ONE shuffle. The transform lambda runs on <= max_postings
    elements per term — per-row low volume, the HOF-safe regime.
    """
    from pyspark.sql import Window

    toks = fan_out(df).select(F.col(id_col).alias("doc_id"), F.explode(tokens(text)).alias("term")).distinct()
    rn = F.row_number().over(Window.partitionBy("term").orderBy("doc_id"))
    ranked = toks.withColumn("rn", rn)
    grouped = ranked.groupBy("term").agg(
        # rn is dense from 1 within each term, so its max IS the doc
        # frequency — counted without touching the unranked relation
        F.max("rn").alias("n_docs"),
        # collect_list drops the NULLs the `when` produces past the
        # cap: bounded state, and sorted because rn follows doc_id
        F.sort_array(
            F.collect_list(F.when(F.col("rn") <= max_postings, F.col("doc_id")))
        ).alias("__post"),
    )
    return (
        grouped.filter(F.col("n_docs") >= min_df)
        .select(
            "term",
            "n_docs",
            F.concat_ws(",", F.transform(F.col("__post"), lambda x: x.cast("string"))).alias("postings"),
        )
    )


def corpus_mixture(df: DataFrame, budgets: dict[str, int],
                   id_col: str = "doc_id", text: str = "text",
                   source: str = "source", salt: str = "mix1") -> DataFrame:
    """Training-mixture construction: deterministically sample each
    source up to a per-source TOKEN budget — the step that turns raw
    corpora plus a mixture spec ({source: token_budget}) into the
    actual pretraining data mix.

    Selection is a salted-hash prefix per source: docs are ordered by a
    content-independent deterministic hash (re-running, resharding, or
    growing the cluster never changes the sample — df.sample() gives
    none of that), and a doc is kept while the running token total is
    within budget. Changing `salt` redraws the mixture; budgets for
    sources absent from the corpus are no-ops.

    Scale notes: one projection (tokenize+hash) and ONE window shuffle
    on source; the running sum is a bounded frame, the budget table is
    a broadcast of |sources| rows. No global sort, no driver loops —
    at 100 TB each source's prefix scan is an independent partition
    group. Greedy-prefix semantics (an overflowing doc is dropped even
    if a later smaller one would fit) keep the operator one-pass;
    bin-packing lives in seq_packing.
    """
    from pyspark.sql import Window

    from streamforge_data_pipeline_spark.functions import hash60

    spark = df.sparkSession
    b = local_rows(spark, 
        [(s, int(t)) for s, t in budgets.items()], "source string, __budget long"
    )
    h = hash60(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    toks = df.select(
        F.col(id_col),
        F.col(source).alias("source"),
        F.size(tokens(text)).cast("long").alias("n_tokens"),
        h.alias("__h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(b), "source")
        .filter(F.col("cum_tokens") <= F.col("__budget"))
        .select(id_col, "source", "n_tokens", "cum_tokens")
    )


def source_mixture_weights(
    df: DataFrame,
    stratum: str = "source",
    text: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based multinomial sampling weights per source — the
    XLM-R / mT5 mixing rule: sample source i with probability
    proportional to n_i^alpha (alpha < 1 upsamples the tail so small
    sources aren't drowned; alpha=1 is natural sampling, alpha=0
    uniform). Emits per source the token count, the natural share,
    the alpha-tempered share, and the upsampling factor
    (tempered/natural) a sampler applies.

    Determinism: n^alpha at the default alpha=0.5 is sqrt — correctly
    rounded IEEE, identical in both engines — ROUNDED TO 4 DP before
    the normalizing sum, which runs in DECIMAL(28,4) (exact,
    order-independent); the final shares divide two
    identically-derived values and round to 4. Output is
    source-cardinality rows from one hash agg."""
    counts = (
        df.select(F.col(stratum), F.size(tokens(text)).cast("long").alias("__nt"))
        .groupBy(stratum)
        .agg(F.sum("__nt").alias("n_tokens"))
    )
    # sqrt (not pow(x, .5)) at the default: sqrt is correctly-rounded
    # IEEE in BOTH engines; libm pow(x, 0.5) may differ by an ulp
    raw = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    )
    w = F.round(raw, 4)
    weighted = counts.select(
        stratum, "n_tokens", w.cast("decimal(28,4)").alias("__w")
    )
    tot = weighted.agg(
        F.sum("n_tokens").alias("__tn"), F.sum("__w").alias("__tw")
    )
    return weighted.crossJoin(F.broadcast(tot)).select(
        stratum,
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("__tn"), 4).alias("natural_share"),
        F.round(
            F.col("__w").cast("double") / F.col("__tw").cast("double"), 4
        ).alias("tempered_share"),
        F.round(
            (F.col("__w").cast("double") / F.col("__tw").cast("double"))
            / (F.col("n_tokens") / F.col("__tn")),
            4,
        ).alias("upsample_factor"),
    )


def corpus_shuffle(df: DataFrame, id_col: str = "doc_id",
                   n_shards: int = 8, salt: str = "shuf1") -> DataFrame:
    """Deterministic global shuffle for training order: every document
    gets a (shard, pos) drawn from a salted content hash — re-running
    the pipeline, re-sharding the input, or changing cluster size
    never changes the order (rand() and zipWithIndex both would).
    Changing `salt` yields a fresh epoch permutation.

    Scale notes: one hash projection + one window shuffle on shard;
    each shard sorts independently (no global sort barrier). n_shards
    scales with the cluster — at 100 TB you'd set it to O(output
    files) and each shard's sort is an in-partition spillable sort.
    """
    from pyspark.sql import Window

    from streamforge_data_pipeline_spark.functions import hash60

    h = hash60(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), h.alias("h"))
        .withColumn("shard", (F.col("h") % n_shards).cast("integer"))
        .select(
            id_col,
            "shard",
            F.row_number().over(w).alias("pos"),
            "h",
        )
        .drop("h")
    )

def dup_ngram_fraction(df: DataFrame, id_col: str = "doc_id",
                       text: str = "text") -> DataFrame:
    """Per-document duplicated-n-gram fraction: the share of a doc's
    token 3-gram OCCURRENCES whose 3-gram appears more than once
    corpus-wide — the boilerplate/cross-doc-repetition quality signal
    (Gopher's "duplicate n-gram" family; repetition_filter is the
    WITHIN-doc counterpart, this is the ACROSS-corpus one). Downstream
    pruning drops docs whose fraction exceeds a threshold.

    Scale notes: corpus-wide 3-gram occurrence counts via ONE
    partial-agg shuffle on the n-gram key (map-side combine collapses
    per-partition repeats before the wire), then an equi-join back to
    the per-occurrence relation on the same key — AQE broadcasts the
    counts side when the vocabulary is small and falls back to a
    shuffled join (already co-partitioned on sh from the agg) when it
    is not. The final per-doc rollup is the second and last shuffle.
    No collect, no Python; hot (stopword-ish) n-grams are a count
    table row, never a grouped array.
    """
    from streamforge_data_pipeline_spark.operators.minhash import shingles_raw

    # Feeds the counts agg AND the join probe — persist so the
    # tokenize+window shingle pass runs once (house pattern; LRU
    # evicts, and registry/bench isolation clears caches per query).
    occ = shingles_raw(df, id_col, text).persist()
    counts = occ.groupBy("sh").agg(F.count(F.lit(1)).alias("cnt"))
    out = (
        occ.join(counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            F.col("n_dup").cast("long").alias("n_dup"),
            F.round(F.col("n_dup") / F.col("n_ngrams"), 4).alias("dup_frac"),
        )
    )
    return finalize_released(out, occ)


def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text: str = "text", min_chars: int = 15) -> DataFrame:
    """C4-style corpus-wide line deduplication: any dedupable line
    occurring more than once across the corpus is kept only at its
    first occurrence (ordered by (doc_id, line_no)) and removed
    everywhere else; each document is re-assembled from its surviving
    lines. Lines shorter than ``min_chars`` characters are EXEMPT —
    they always survive — so paragraph breaks (the empty line) and
    trivial short lines are never stripped corpus-wide, matching the
    public line-dedup recipes (C4/CCNet/RefinedWeb all exempt or never
    consider short lines); set ``min_chars=0`` for strict all-lines
    dedup. Emits every input doc with (text_clean, n_lines, n_kept) —
    n_kept==0 docs survive with empty text so a downstream length
    prune can drop them explicitly. [C4: Raffel et al. 2020 §2.2
    "three-sentence span" dedup, simplified to exact lines — the
    standard first pass before MinHash; cf. exact_dedup (whole-doc)
    and near_dedup (fuzzy).]

    Scale notes (the r4→r5 de-skew): first occurrence is computed by
    AGGREGATION, not a window — ``groupBy(group key).agg(min(struct(
    doc_id, line_no)))``. An aggregation gets map-side partial
    combine: every map partition contributes ONE row per distinct
    line, so a corpus-hot boilerplate line reaches its reducer as at
    most num_map_partitions rows instead of the billions-of-rows
    single window partition the old ``row_number over (partition by
    line)`` shape forced (un-splittable skew — AQE cannot split a
    window partition). Exempt short lines are folded into the SAME
    single pass by widening the group key with (doc_id, line_no) only
    when the line is short — each short-line occurrence becomes a
    singleton group that trivially wins itself, so there is no second
    scan, no union, and the hottest key in any real corpus (the empty
    line) never concentrates anywhere. The aggregation's output IS the
    kept set — (first.doc_id, first.line_no, line) — so no join back
    to the occurrence relation is needed at all. Reassembly groups by
    doc_id — second shuffle — with sort_array over (line_no, line)
    structs: per-doc state is bounded by document size. The left join
    back to the input restores all-lines-removed docs; it joins on the
    doc key, co-partitioned with the reassembly output.
    """
    lines = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text), "\n")).alias("line_no", "line"),
    )
    exempt = F.length("line") < F.lit(min_chars)
    # Group key: the line itself, plus (doc_id, line_no) ONLY for
    # exempt lines (F.when without otherwise -> typed NULL; groupBy
    # treats NULLs as equal, so dedupable lines group corpus-wide
    # while each exempt occurrence is its own singleton group).
    grp = F.struct(
        F.col("line").alias("l"),
        F.when(exempt, F.col("doc_id")).alias("xd"),
        F.when(exempt, F.col("line_no")).alias("xn"),
    )
    kept = (
        lines.groupBy(grp.alias("g"))
        .agg(F.min(F.struct("doc_id", "line_no")).alias("f"))
        .select(
            F.col("f.doc_id").alias("doc_id"),
            F.col("f.line_no").alias("line_no"),
            F.col("g.l").alias("line"),
        )
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        (F.size(F.split(F.col(text), "\n"))).alias("n_lines"),
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def ngram_lm_score(df: DataFrame, id_col: str = "doc_id",
                   text: str = "text", k: float = 0.5) -> DataFrame:
    """CCNet-style LM quality score: train an add-k-smoothed bigram
    language model on the corpus itself, then score every document by
    its average bigram negative log-likelihood (lower = more typical
    of the corpus; a threshold on the score is the classic
    perplexity-filter pruning step). Emits (doc_id, n_bigrams, nll).
    [CCNet: Wenzek et al. 2020 §4 "LM filtering" — theirs uses a
    pretrained KenLM; training on the corpus itself keeps the operator
    self-contained and dependency-free, same trade as lang_id's
    marker heuristic.]

    Model: P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*V), where c(w1) is
    w1's count as a bigram CONTEXT (so the distribution sums to 1 over
    the vocabulary) and V = |distinct tokens|.

    Scale notes: the model IS two count tables — vocabulary-sized, not
    corpus-sized — built with one partial-agg shuffle each; joining
    them back to the per-occurrence bigram relation is AQE
    broadcast-eligible (a 100 TB corpus's bigram type count is
    bounded by V^2 observed types, typically ~1e8 rows ~ GBs — if it
    outgrows broadcast the join is already co-partitioned on the
    count key from the agg). V rides along as a broadcast scalar
    (crossJoin with a 1-row agg, not a collect). The per-doc rollup
    is one more shuffle. The fp-order hazard of avg(ln ...) is
    neutralized by half-up rounding to 4 decimals via the same
    floor(x*1e4+0.5)/1e4 IEEE op sequence DuckDB runs (the
    min_cost_supplier precedent, PERF_NOTES r4).
    """
    from pyspark.sql import Window

    tok = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        tok.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok", 1).over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = tok.agg(F.countDistinct("tok").alias("v"))
    logp = F.log(
        (F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    )
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(-logp).alias("__nll"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.floor(F.col("__nll") * 1e4 + 0.5) / 1e4).alias("nll"),
        )
    )


def quality_retention_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n_steps: int = 9,
) -> DataFrame:
    """Threshold-calibration curve for perplexity filtering: for a
    grid of nll cutoffs spanning the corpus's observed score range,
    how many documents AND tokens survive "keep docs with
    bigram-LM nll <= tau"? This is the table a pipeline reads before
    choosing its quality threshold — the retained-token fraction is
    the actual training-budget consequence of each candidate cutoff
    (CCNet/Gopher-style filter tuning). One row per grid step:
    (step, tau, n_docs_retained, frac_docs, n_toks_retained,
    frac_toks).

    Determinism: per-doc nll is the already-oracle-checked
    :func:`ngram_lm_score` value (floored to 1e-4); grid taus are
    round(lo + step*(hi-lo)/(n_steps+1), 4) over the exact min/max —
    identical IEEE doubles in both engines, so the <= comparisons
    agree. Scale shape: the grid is n_steps rows — the retention join
    is a broadcast nested-loop against a 9-row table, then one partial
    hash agg; corpus totals ride in on the same broadcast row. Docs
    with no bigrams (single-token) carry no score and are out of
    scope, identically in both engines."""
    scores = ngram_lm_score(df, id_col, text)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(text)).cast("long").alias("n_toks"),
    )
    s = scores.join(toks, "doc_id")
    rng = s.agg(
        F.min("nll").alias("lo"),
        F.max("nll").alias("hi"),
        F.count(F.lit(1)).alias("total_docs"),
        F.sum("n_toks").alias("total_toks"),
    )
    steps = df.sparkSession.range(1, n_steps + 1).select(
        F.col("id").cast("int").alias("step")
    )
    grid = steps.crossJoin(F.broadcast(rng)).select(
        "step",
        F.round(
            F.col("lo")
            + F.col("step") * (F.col("hi") - F.col("lo")) / (n_steps + 1),
            4,
        ).alias("tau"),
        "total_docs",
        "total_toks",
    )
    return (
        s.join(F.broadcast(grid), s["nll"] <= grid["tau"])
        .groupBy("step", "tau", "total_docs", "total_toks")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("n_toks").alias("__t"),
        )
        .select(
            "step",
            "tau",
            F.col("__n").cast("long").alias("n_docs_retained"),
            F.round(F.col("__n") / F.col("total_docs"), 4).alias("frac_docs"),
            F.col("__t").cast("long").alias("n_toks_retained"),
            F.round(F.col("__t") / F.col("total_toks"), 4).alias("frac_toks"),
        )
    )


def vocab_coverage(df: DataFrame, text: str = "text", k: int = 1000) -> DataFrame:
    """Token-vocabulary coverage curve: the top-``k`` terms by
    occurrence count with each term's rank and the CUMULATIVE fraction
    of all token occurrences covered through that rank — the statistic
    a tokenizer/vocab designer reads to size a vocabulary ("how many
    types cover 95% of tokens?"). Ties broken by term for determinism.

    Scale notes: term counts are one partial-agg shuffle
    (vocabulary-sized output, corpus-sized input); the top-k is
    TakeOrderedAndProject (per-partition heaps). The cumulative sum
    then runs over AT MOST k rows in a single partition — bounded by
    the parameter, not the corpus — and the total-occurrences scalar
    rides in via a broadcast 1-row crossJoin, not a collect.
    """
    from pyspark.sql import Window

    counts = (
        fan_out(df).select(F.explode(tokens(text)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("__total"))
    top = counts.orderBy(F.col("n").desc(), "term").limit(k)
    w = Window.orderBy(F.col("n").desc(), "term").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(Window.orderBy(F.col("n").desc(), "term")).alias("rank"),
            "term",
            "n",
            F.round(F.sum("n").over(w) / F.col("__total"), 4).alias("cum_frac"),
        )
    )


def dup_span_removal(df: DataFrame, id_col: str = "doc_id",
                     text: str = "text", k: int = 8) -> DataFrame:
    """ExactSubstr-style duplicated-span detection and removal: any
    token ``k``-gram occurring more than once corpus-wide (including
    twice within one document) marks its ``k`` token positions as
    duplicated; overlapping/adjacent duplicated k-gram hits are merged
    into MAXIMAL spans, and each document is emitted with its span
    stats plus ``text_clean`` — the token stream with every duplicated
    span cut out (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better": the substring-dedup pass that catches the
    partial overlaps whole-doc and near-dup passes both miss; their
    suffix-array length-50 criterion becomes a k-token-gram criterion
    here, the standard map-reduce-able approximation). ``text_clean``
    is the NORMALIZED token stream rejoined with single spaces — the
    same normalization every downstream tokenizer-facing operator in
    this module uses.

    Scale notes: corpus k-gram occurrence counts are ONE partial-agg
    shuffle keyed on the gram (map-side combine collapses repeats
    before the wire; at 100 TB key the shuffle on hash60(gram) to ship
    8-byte keys — kept as the raw string here so the count is exactly
    collision-free). The join back lands only on grams with cnt>=2 —
    the duplicated subset, output-bound. Span merging is a per-doc
    window over duplicated START POSITIONS only (equal-length
    intervals: a new span begins exactly when pos > lag(pos)+k, i.e.
    the next hit neither overlaps nor touches the previous cover), so
    window-partition size is bounded by document length, never corpus
    frequency — the skew shape line_dedup's r5 fix eliminated never
    appears. Cleaned text is rebuilt with an in-row higher-order
    filter against the doc's own collected span list (spans per doc
    are few by construction); no explode-and-reaggregate of the token
    relation, no Python anywhere.
    """
    from pyspark.sql import Window

    tok = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, k)]
    # Feeds the counts agg AND the join probe (house pattern, cf.
    # dup_ngram_fraction): persist so the tokenize+window pass runs
    # once per action.
    grams = (
        tok.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.col("tok"), *leads).alias("gram"),
            leads[-1].alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .select("doc_id", "pos", "gram")
        .persist()
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    dup_starts = grams.join(
        counts.filter(F.col("cnt") >= 2), "gram"
    ).select("doc_id", "pos")
    # Equal-length interval merge (gaps-and-islands): the previous
    # hit covers up to lag(pos)+k-1, so the next hit overlaps or is
    # ADJACENT iff pos <= lag(pos)+k — merged spans are exactly the
    # maximal runs of covered token positions.
    new_span = F.when(
        F.col("pos") > F.coalesce(F.lag("pos").over(w) + k, F.lit(-1)),
        1,
    ).otherwise(0)
    islands = dup_starts.select(
        "doc_id",
        "pos",
        F.sum(new_span).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__isl"),
    )
    spans = islands.groupBy("doc_id", "__isl").agg(
        F.min("pos").alias("s"), (F.max("pos") + (k - 1)).alias("e")
    )
    doc_spans = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__spans"),
    )
    base = df.select(F.col(id_col).alias("doc_id"), tokens(text).alias("__toks"))
    joined = base.join(doc_spans, "doc_id", "left")
    covered = lambda i: F.exists(  # noqa: E731 — readability of the HOF pair
        "__spans", lambda sp: (i >= sp["s"]) & (i <= sp["e"])
    )
    kept = F.when(F.col("n_spans").isNull(), F.col("__toks")).otherwise(
        F.filter("__toks", lambda t, i: ~covered(i))
    )
    n_tok = F.size("__toks").cast("long")
    dup = F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long")
    # floor(x*1e4+0.5)/1e4 instead of round(): the engine-portable
    # half-up recipe (cf. ngram_lm_score; round() half-ties diverge
    # between Spark HALF_UP and DuckDB's double rounding).
    frac = F.when(
        n_tok > 0, F.floor(dup / n_tok * 1e4 + 0.5) / 1e4
    ).otherwise(F.lit(0.0))
    out = joined.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        dup.alias("dup_tokens"),
        frac.alias("dup_frac"),
        F.array_join(kept, " ").alias("text_clean"),
    )
    return finalize_released(out, grams)


def ngram_novelty(df: DataFrame, id_col: str = "doc_id",
                  text: str = "text") -> DataFrame:
    """Per-document n-gram NOVELTY: the share of a doc's token 3-gram
    occurrences whose 3-gram first appears (by lowest doc_id) in THIS
    document — the "how much new content does this doc contribute"
    curation signal, the forward-looking complement of
    dup_ngram_fraction's "how much of this doc is repeated". Docs full
    of already-seen phrasing score near 0; the first carrier of a
    phrase scores it as novel (including repeats within the first
    carrier itself — first-carrier occurrences are all novel by the
    lowest-doc-id rule, which keeps the statistic a pure function of
    the corpus, not of arrival order).

    Scale notes: one partial-agg shuffle builds the gram -> first-doc
    table (min(doc_id) combines map-side; hot grams collapse before
    the wire), then an equi-join back to the occurrence relation on
    the gram key — the dup_ngram_fraction plan shape exactly, with min
    instead of count. Per-doc rollup is the second and last shuffle.
    """
    from streamforge_data_pipeline_spark.operators.minhash import shingles_raw

    occ = shingles_raw(df, id_col, text).persist()
    firsts = occ.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    out = (
        occ.join(firsts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_novel",
            (F.floor(F.col("n_novel") / F.col("n_ngrams") * 1e4 + 0.5) / 1e4)
            .alias("novelty"),
        )
    )
    return finalize_released(out, occ)


def tfidf_cosine_pairs(df: DataFrame, id_col: str = "doc_id",
                       text: str = "text", tau: float = 0.6,
                       scheme: str = "auto",
                       dense_vocab_limit: int = 256,
                       dense_cells_limit: int = 32_000_000) -> DataFrame:
    """Document pairs by tf-idf COSINE >= ``tau`` — bag-of-words
    near-dup detection weighted by term rarity (the classic IR
    similarity), complementing the order-sensitive shingle Jaccard:
    two docs using the same rare vocabulary in different word order
    score high here and low on 3-gram Jaccard. Weights are
    tf * ln(N/df) rounded to 6 (the tfidf_top_terms recipe); terms
    present in every document carry weight exactly 0 and are excluded
    up front — identical semantics, smaller join.

    Cross-engine float discipline: the shared-term dot product and the
    per-doc norms are summed as DECIMAL(28,10) — decimal addition is
    exact and order-free, so the nondeterministic shuffle order of a
    double sum can never flip a pair across the tau boundary between
    engines (the house rule "sums go through DECIMAL(28,10)"). The
    dense scheme preserves this bit-for-bit: NumPy only NOMINATES
    candidates (at tau minus a 1e-6 slack, orders of magnitude wider
    than any 256-dim float64 dot error), and every emitted pair's
    cosine is recomputed by the same decimal fold.

    Scheme selection (the near_dedup auto-scheme story, transplanted):
    the sparse term-equi-join's candidate volume is sum(df^2) over
    surviving terms — fine on Zipf vocabularies where tf-idf's
    weight-0 drop and the rare tail keep buckets thin, but on a
    SATURATED vocabulary (every term in ~every doc) it degenerates to
    |vocab| x (N/|vocab| density)^2 joined rows: measured 93 s at 5k
    docs / 30 terms, infeasible at 50k (~2.5e13 rows). ``auto``
    therefore routes small-vocabulary corpora (vocab <=
    ``dense_vocab_limit`` AND n_docs x vocab <= ``dense_cells_limit``
    (the guard is a BYTE bound in disguise: cells x 8 bytes of float64
    is the broadcast matrix, so the 32M default caps it at ~256 MB —
    halved from r5's 64M after the verdict flagged the 512 MB boundary
    as broadcast-hostile on smaller executors)
    matrix cells, driver-collectable) to a DENSE path: per-doc weight
    vectors, candidate pairs from a blocked NumPy matmul against the
    broadcast matrix (flops-bound: N^2 x vocab multiply-adds, ~75
    GFLOP for 50k x 30 — seconds, vs the join's trillions of rows),
    then the exact decimal rerank on candidates only. Large/Zipf
    vocabularies keep the sparse join. Both schemes return the
    identical result set (equivalence-tested).

    Scale notes (sparse path): everything reduces at (doc, term)
    before anything wide; at 100 TB the standard df cap (drop terms
    with df > max_df, whose weights are ~0 anyway) bounds bucket
    width the same way the shingle pipeline's boilerplate cap does.
    """
    toks = fan_out(df).select(F.col(id_col).alias("doc_id"), F.explode(tokens(text)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .filter(F.col("df") < F.col("n_docs"))  # weight would be exactly 0
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("w"),
        )
    ).persist()
    dec = lambda c: c.cast("decimal(28,10)")  # noqa: E731
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(dec(F.col("w") * F.col("w"))).cast("double")).alias("nrm")
    )

    vocab: list[str] | None = None
    if scheme == "auto":
        # the vocab sketch IS the routing statistic: tiny and saturated
        # -> dense matmul; large/Zipf -> sparse term join
        vocab_rows = (
            w.select("term").distinct().limit(dense_vocab_limit + 1).collect()
        )
        n = df.count()
        dense_ok = (
            len(vocab_rows) <= dense_vocab_limit
            and n * len(vocab_rows) <= dense_cells_limit
        )
        scheme = "dense" if dense_ok else "sparse"
        if dense_ok:
            # the sketch already holds the COMPLETE vocabulary (it hit
            # no limit) — reuse it instead of a second distinct pass
            vocab = sorted(r["term"] for r in vocab_rows)

    if scheme == "dense":
        dots = _tfidf_dense_candidates(df, w, tau, id_col, vocab=vocab)
    elif scheme == "sparse":
        a = w.select(F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa"))
        b = w.select(F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb"))
        dots = (
            a.join(b, "term")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(dec(F.col("wa") * F.col("wb"))).cast("double").alias("dot"))
        )
    else:
        raise ValueError(f"unknown scheme {scheme!r}")
    out = (
        dots.join(norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na")), "doc_a")
        .join(norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb")), "doc_b")
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= F.lit(tau) - F.lit(1e-9))
        .select(
            "doc_a",
            "doc_b",
            (F.floor(F.col("cos") * 1e4 + 0.5) / 1e4).alias("cosine"),
        )
    )
    return finalize_released(out, tf, w)


def _tfidf_dense_candidates(df: DataFrame, w: DataFrame, tau: float,
                            id_col: str,
                            vocab: list[str] | None = None,
                            boundary_band: float = 1e-6) -> DataFrame:
    """(doc_a, doc_b, dot) for the dense small-vocabulary scheme:
    candidate pairs from a blocked NumPy cosine sweep (tau - 1e-6
    slack, superset of the answer); the decimal rerank — the SAME
    order-free fold the sparse scheme's aggregation produces (absent
    terms contribute exact 0.0 products, so the dense fold over the
    full vocabulary equals the sparse sum over shared terms, decimal
    digit for digit) — runs ONLY on boundary-band pairs (r10).

    Why float may decide the rest: the kernel's float64 cosine differs
    from the decimal-exact value by <= ~2e-14 relative (31-element
    dot, |w| <= ~1.1e3), while the two decisions downstream have
    granularity 1e-6-class bands — the tau cutoff (slack 1e-9) and
    the emitted value's 1e-4 rounding grid. A pair whose float cosine
    sits further than ``boundary_band`` (default 1e-6, margin ~5e7x
    over the float error) from BOTH the cutoff and the nearest grid
    half-point is therefore decided and valued identically by float
    and decimal; only pairs inside either band go through the
    interpreted decimal fold. On the saturated sf1 corpus that is
    ~1e4 of 6.7e8 candidate rows — the fold had been the whole wall
    (measured 84-160s run-to-run, pure expression-interpreter
    variance; PERF_NOTES r10.12). Sandwich-tested: boundary_band=1.0
    (everything decimal, the old path) and the default produce
    identical results."""
    import numpy as np

    from pyspark.sql import types as T

    if vocab is None:
        vocab = sorted(r["term"] for r in w.select("term").distinct().collect())
    dim = len(vocab)
    id_type = df.select(id_col).schema.fields[0].dataType

    # per-doc dense weight vector, JVM-side: map lookup per vocab slot
    wmap = w.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "w"))).alias("__m")
    )
    vec = F.transform(
        F.array(*[F.lit(t) for t in vocab]),
        lambda t: F.coalesce(F.element_at(F.col("__m"), t), F.lit(0.0)),
    )
    dense = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(wmap, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__m").isNull(), F.array(*[F.lit(0.0)] * dim))
            .otherwise(vec)
            .alias("vec"),
        )
        .persist()
    )
    rows = dense.collect()  # gated by dense_cells_limit in the caller
    # dtype inferred from the id values: integer ids stay int64,
    # string/other ids become object arrays (elementwise < still
    # works) — the public id_col contract must not assume longs
    ids = np.array([r["doc_id"] for r in rows])
    mat = np.array([r["vec"] for r in rows], dtype=np.float64)
    mnorm = np.sqrt((mat * mat).sum(axis=1))
    mnorm[mnorm == 0] = 1.0
    sc = df.sparkSession.sparkContext
    b = sc.broadcast((ids, mat, mnorm))
    thr = tau - 1e-6

    schema = T.StructType(
        [
            T.StructField("doc_a", id_type),
            T.StructField("doc_b", id_type),
            T.StructField("dot", T.DoubleType()),
        ]
    )
    band = float(boundary_band)

    def _cands(batches):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        bids, bmat, bnorm = b.value
        Q = Decimal("1e-10")

        def decimal_dot(va, vb):
            # bit-identical to Spark's fold: per-product cast(double as
            # decimal(28,10)) == BigDecimal.valueOf(d).setScale(10,
            # HALF_UP); Python's repr(d) parses to the same decimal
            # value as Double.toString(d) (500k-sample differential
            # over the weight-product domain: 0 mismatches), and
            # scale-10 decimal addition is exact, so the sum matches
            # digit for digit; float() is the same nearest-double cast.
            acc = Decimal(0)
            for x, y in zip(va, vb):
                p = x * y
                if p:
                    acc += Decimal(repr(p)).quantize(
                        Q, rounding=ROUND_HALF_UP
                    )
            return float(acc)

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            vn = np.sqrt((v * v).sum(axis=1))
            vn[vn == 0] = 1.0
            vids = pdf["doc_id"].to_numpy()
            # sub-block the sims matrix so memory stays ~100 MB
            step = max(1, 200_000_000 // (8 * max(len(bids), 1)))
            for s in range(0, len(v), step):
                blk = v[s : s + step]
                dots = blk @ bmat.T
                sims = dots / (vn[s : s + step, None] * bnorm[None, :])
                ai, bi = np.nonzero(sims >= thr)
                da, db = vids[s + ai], bids[bi]
                keep = da < db
                if not keep.any():
                    continue
                ai, bi = ai[keep], bi[keep]
                cs = sims[ai, bi]
                out_dot = dots[ai, bi].copy()
                # float decides pairs far from the tau cutoff AND from
                # the nearest 1e-4 rounding half-point; the boundary
                # band gets the exact decimal fold (a handful of rows)
                grid = cs * 1e4 + 0.5
                risky = (np.abs(cs - tau) <= band) | (
                    np.abs(grid - np.rint(grid)) <= band
                )
                for j in np.nonzero(risky)[0]:
                    out_dot[j] = decimal_dot(blk[ai[j]], bmat[bi[j]])
                yield pd.DataFrame(
                    {
                        "doc_a": da[keep],
                        "doc_b": db[keep],
                        "dot": out_dot,
                    }
                )

    # Spread the kernel input across the cluster (r11): `dense` rides
    # the documents scan's partitioning — ONE split at bench SFs — so
    # the matmul + candidate emission ran as a single task (measured
    # 3.05 s single-task stage at sf0.1, ~all of it Python-side
    # emission). Unconditional repartition is scale-safe here because
    # the caller's dense_cells_limit gate bounds this relation to
    # driver-collectable size (~256 MB); the exchange reads the
    # already-materialized cache.
    par = df.sparkSession.sparkContext.defaultParallelism
    out = dense.select("doc_id", "vec").repartition(par).mapInPandas(
        _cands, schema
    )
    return finalize_released(out, dense)
