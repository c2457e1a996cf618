"""Text-analysis operators (E4 + training-pipeline surface).

All pure Column expressions (split/filter/aggregate higher-order
functions) — tokenization-heavy work stays inside whole-stage codegen;
no Python in the hot path. Each has a matching ANSI-SQL oracle in
registry.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from streamforge_data_pipeline_spark.functions import tokens

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
        df.select(F.explode(tokens(text)).alias("term"))
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


def quality_score(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Length/stopword/uniqueness heuristics -> [0,1] quality.

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
    quality = length_score * distinct_ratio + stop_ratio
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

    toks = tokens(text)
    tok = df.select(
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

    toks = df.select(id_col, F.explode(tokens(text)).alias("term"))
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
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "score", F.col("rk").cast("long").alias("rk"))
    )


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
    chunks = df.select(id_col, text, F.explode(starts).alias("start"))
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
