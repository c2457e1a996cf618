"""Deterministic sampling operators.

`df.sample()` is seed-dependent across partitionings and Spark
versions, which makes results unreproducible exactly when a 100 TB
curation run needs an audit trail. These samplers hash a stable key
instead: the same row always makes the same in/out decision, on any
cluster layout, in any engine — so the DuckDB oracle checks them
exactly and reruns are idempotent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from streamforge_data_pipeline_spark.functions import hash60, sql_hash60

BUCKETS = 10_000


def _bucket(key: Column) -> Column:
    return hash60(key.cast("string")) % BUCKETS


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum fraction of rows, chosen by key-hash bucket.

    ``rates`` maps stratum value -> fraction in [0, 1]; strata not
    listed fall back to ``default_rate``. Pure narrow filter — no
    shuffle, no state, fully pushed into the scan stage; at 100 TB
    this is the only sampler shape that costs nothing beyond the scan.
    """
    thresh = F.lit(int(default_rate * BUCKETS))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum) == value, F.lit(int(rate * BUCKETS))
        ).otherwise(thresh)
    return df.filter(_bucket(F.col(key)) < thresh)


def sql_stratified_sample(
    table: str, key: str, stratum: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> str:
    """DuckDB mirror of :func:`stratified_sample` (WHERE clause text)."""
    cases = " ".join(
        f"WHEN {stratum} = '{v}' THEN {int(r * BUCKETS)}"
        for v, r in sorted(rates.items())
    )
    return (
        f"{sql_hash60(f'CAST({key} AS VARCHAR)')} % {BUCKETS} "
        f"< (CASE {cases} ELSE {int(default_rate * BUCKETS)} END)"
    )

def bottomk_sample(
    df: DataFrame, k: int = 100, id_col: str = "doc_id",
    assume_unique: bool = False,
) -> DataFrame:
    """Fixed-SIZE uniform sample: the k rows whose md5-derived key hash
    is smallest (bottom-k / KMV sketch, Bar-Yossef et al. 2002). The
    complement of :func:`stratified_sample`'s fixed-RATE guarantee —
    "give me exactly 10k audit rows" needs bottom-k, "keep 10% of every
    stratum" needs rate sampling.

    Properties that matter at 100 TB:
    - one pass, no shuffle of the data: Spark plans orderBy+limit as
      TakeOrderedAndProject — per-partition partial top-k, then a
      k-row merge; only k rows ever move.
    - MERGEABLE: bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪
      bottom-k(B)), exactly — so partial samples from splits/streams
      combine losslessly (the streaming twin's whole correctness
      argument, and why the multi-batch drain is oracle-exact, not
      just the one-batch drain).
    - deterministic: hash ties break on the id itself; same rows in,
      same sample out, on any partitioning, in any engine.

    Returns (id_col, h) ordered-by-construction; h is kept because the
    max sampled hash doubles as the KMV distinct-count estimator input
    (:func:`kmv_distinct_estimate`).

    ``assume_unique=True`` skips the id dedup when the caller knows
    ``id_col`` is a primary key — that dedup is the plan's only
    Exchange (a corpus-wide shuffle of the 2-column projection); with
    it skipped the whole sample is one scan + a k-row merge.
    """
    h = hash60(F.col(id_col).cast("string"))
    proj = df.select(id_col, h.alias("h"))
    if not assume_unique:
        proj = proj.dropDuplicates([id_col])
    return proj.orderBy("h", id_col).limit(k)


def kmv_distinct_estimate(
    df: DataFrame, k: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct-count estimate from the bottom-k sample: the k-th
    smallest of n uniform 60-bit hashes sits near k/n of the range, so
    n_distinct ~ (k-1) * 2^60 / h_k. One row: (n_sample,
    est_distinct); when fewer than k distinct keys exist the sample IS
    the key set and the estimate is exact by definition.

    Unlike HLL (approx_count_distinct, rows-only), every arithmetic
    step here is a deterministic function of md5 hashes — one IEEE
    multiply of exactly-representable doubles, one divide, one floor —
    so the estimator itself is DuckDB-hash-checkable. Accuracy is
    ~1/sqrt(k-2) relative (pytest-asserted vs the exact count).
    """
    sample = bottomk_sample(df, k=k, id_col=id_col)
    c = float(k - 1) * float(2**60)  # exact: (k-1) has << 53 bits
    return sample.agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("long"))
        .otherwise(
            F.floor(F.lit(c) / F.max("h")).cast("long")
        )
        .alias("est_distinct"),
    )

def shard_manifest(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Deterministic output sharding + manifest — the final "write the
    training shards" step: every document lands in shard
    hash60(id) % n_shards (stable across reruns, cluster layouts and
    engines — re-exports are bit-reproducible), and the manifest rows
    a consumer validates against are (shard, n_docs, n_toks,
    id_checksum) where id_checksum is the exact DECIMAL(38,0) sum of
    the member ids' 60-bit hashes, emitted as a string. The checksum
    is ORDER-INDEPENDENT (addition commutes), so any parallel writer
    that produced the right member set produces the right manifest —
    corrupted/partial shards fail the count or the checksum.

    One hash partial-agg; output is n_shards rows. Writing the shards
    themselves is ``store.append_partitioned(..., ["shard"])`` on the
    same assignment (pytest exercises the write + re-derivation
    round trip)."""
    from streamforge_data_pipeline_spark.functions import tokens

    h = hash60(F.col(id_col).cast("string"))
    base = df.select(
        (h % n_shards).cast("int").alias("shard"),
        F.size(tokens(text)).cast("long").alias("n_toks"),
        h.alias("h"),
    )
    return base.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_toks"),
        F.sum(F.col("h").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("id_checksum"),
    )


def shard_assignment(
    df: DataFrame, n_shards: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """(id, shard) under the :func:`shard_manifest` rule — the column
    a partitioned shard write keys on."""
    return df.select(
        "*",
        (hash60(F.col(id_col).cast("string")) % n_shards)
        .cast("int")
        .alias("shard"),
    )


def eval_split_assign(
    df: DataFrame,
    stratum: str = "source",
    id_col: str = "doc_id",
    k_val: int = 50,
    k_test: int = 50,
) -> DataFrame:
    """Deterministic held-out split construction with EXACT per-stratum
    quotas: within each stratum, rank docs by (hash60(id), id) — the
    samplers' order — and assign rank <= k_val to 'val', the next
    k_test to 'test', the rest to 'train'. Exact-size val/test sets
    per source (a Bernoulli split only hits quotas in expectation),
    stable under reruns, cluster layouts, and engines; adding documents
    to OTHER strata never moves an existing stratum's split.

    One window pass (the per_stratum_bottomk shape); emits
    (id, stratum, split). The per-(stratum, split) manifest a release
    publishes is one groupBy over this."""
    from pyspark.sql import Window

    h = hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum).orderBy("h", id_col)
    rk = F.row_number().over(w)
    return (
        df.select(stratum, id_col, h.alias("h"))
        .dropDuplicates([stratum, id_col])
        .withColumn("__rk", rk)
        .select(
            id_col,
            stratum,
            F.when(F.col("__rk") <= k_val, "val")
            .when(F.col("__rk") <= k_val + k_test, "test")
            .otherwise("train")
            .alias("split"),
        )
    )


def per_stratum_bottomk(
    df: DataFrame, stratum: str, k: int = 20, id_col: str = "doc_id"
) -> DataFrame:
    """Fixed-size sample PER STRATUM (balanced subsets: exactly k docs
    from every source, however skewed the sources are) — the window
    form of :func:`bottomk_sample`: rank by (hash, id) within each
    stratum, keep rank <= k. One hash-partitioned sort per stratum —
    at 100 TB this is the one shuffle a balanced-subset draw costs,
    and a hot stratum skews only its own partition group. Same
    determinism contract as the other samplers.

    Dedup is on (stratum, id) — NOT id alone — so an id appearing
    under two strata contributes one deterministic row to EACH, and
    the oracle's matching SELECT DISTINCT keeps the contract on
    non-PK inputs (r7 ADVICE fix: id-only dedup made the surviving
    stratum arbitrary)."""
    from pyspark.sql import Window

    h = hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum).orderBy("h", id_col)
    return (
        df.select(stratum, id_col, h.alias("h"))
        .dropDuplicates([stratum, id_col])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(stratum, id_col, "h", F.col("rk").cast("int").alias("rk"))
    )


def sequence_pack(
    df: DataFrame,
    ctx_len: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Training-sequence packing: concatenate each shard's documents
    (one EOS slot appended per doc) into a token stream and split it
    into fixed ``ctx_len`` sequences, documents crossing boundaries —
    the standard GPT-pretraining packing (Brown et al. 2020 §2.1;
    docs joined by a delimiter, examples cut at the context length,
    no padding waste). Output is the PACK PLAN, one row per
    (document, sequence) slice:

      (shard, seq_id, doc_id, seq_start, seq_end, doc_start)

    meaning sequence ``seq_id`` of ``shard`` takes the doc's tokens
    [doc_start, doc_start + seq_end - seq_start) into its positions
    [seq_start, seq_end). (Distinct from text.pack_sequences /
    `seq_packing`, the whole-doc streaming-fill bin assignment whose
    bins may overfill by one doc: this plan is token-exact — every
    sequence is full, zero padding — at the price of split docs.) A trainer (or the shard writer) joins the
    plan back to the tokenized text to materialize examples; emitting
    the plan instead of token arrays keeps the operator output ~1% of
    corpus size and engine-checkable exactly.

    Shards follow the :func:`shard_manifest` rule (hash60(id) %
    n_shards), order within a shard is the samplers' (hash, id) — so
    the plan is deterministic across reruns, cluster layouts, and
    engines, and each shard packs independently: ONE hash-partitioned
    window sort is the entire shuffle cost, shards are the parallel
    unit at 100 TB. All arithmetic is integer (DIV, never /): a
    cumulative-sum window gives each doc its absolute slot
    [start, start + n_toks + 1) in the shard stream, and the covered
    sequences are just start DIV L .. (start + slot - 1) DIV L —
    exploded with F.sequence, at most 1 + slot/L rows per doc."""
    return pack_plan(
        pack_accounting(df, n_shards=n_shards, id_col=id_col, text=text),
        ctx_len=ctx_len,
        id_col=id_col,
    )


def pack_accounting(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """The per-doc accounting row :func:`pack_plan` packs from:
    (id, shard, h, slot) where slot = n_toks + 1 (the EOS). This is
    the only pass that touches text — ~16 bytes a doc out of it —
    which is what the streaming twin journals so the plan re-derives
    without re-reading the corpus."""
    from streamforge_data_pipeline_spark.functions import tokens

    h = hash60(F.col(id_col).cast("string"))
    return df.select(
        F.col(id_col),
        (h % n_shards).cast("int").alias("shard"),
        h.alias("h"),
        (F.size(tokens(text)) + 1).cast("long").alias("slot"),
    )


def pack_plan(
    acct: DataFrame, ctx_len: int = 2048, id_col: str = "doc_id"
) -> DataFrame:
    """Pack-plan arithmetic over :func:`pack_accounting` rows — the
    window cumsum + integer-DIV boundary explode shared by the batch
    key and the streaming journal read."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = acct.select(
        "shard",
        id_col,
        "slot",
        F.coalesce(F.sum("slot").over(w), F.lit(0))
        .cast("long")
        .alias("start"),
    )
    L = F.lit(int(ctx_len))
    first = F.expr(f"start DIV {int(ctx_len)}")
    last = F.expr(f"(start + slot - 1) DIV {int(ctx_len)}")
    seq = F.col("seq_id")
    lo = F.greatest(F.col("start"), seq * L)
    hi = F.least(F.col("start") + F.col("slot"), (seq + 1) * L)
    return spans.select(
        "shard",
        id_col,
        "start",
        "slot",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    ).select(
        "shard",
        F.col("seq_id").cast("long").alias("seq_id"),
        id_col,
        (lo - seq * L).cast("int").alias("seq_start"),
        (hi - seq * L).cast("int").alias("seq_end"),
        (lo - F.col("start")).cast("long").alias("doc_start"),
    )
