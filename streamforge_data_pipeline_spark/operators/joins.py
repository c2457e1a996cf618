"""Join operators (SURVEY §2.3).

The reference implements join *semantics* imperatively (set membership,
EXISTS probes); here they are declarative joins so Catalyst picks
broadcast vs shuffled-hash vs sort-merge from statistics, and AQE
re-plans at runtime (skew splitting, dynamic broadcast).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def inner_equi(left: DataFrame, right: DataFrame, on, broadcast_right=True) -> DataFrame:
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, "inner")


def exists_semi(probe: DataFrame, keys: DataFrame, on) -> DataFrame:
    """P3/J3: EXISTS as a left-semi join (existsBy*, ItemRepository.java:13,
    UserRepository.java:17-19) — never materializes right-side columns."""
    return probe.join(keys, on, "left_semi")


def not_exists_anti(probe: DataFrame, keys: DataFrame, on) -> DataFrame:
    return probe.join(keys, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the LATEST right row with
    ``right_ts <= left_ts`` on the same key (time-series enrichment —
    an operator Spark has no primitive for).

    Implemented as the scalable union + last-value-window form: tag
    both sides, union them, and carry each right value forward with
    ``last(..., ignorenulls=True)`` over (key, ts). ONE shuffle on the
    key — never a per-row range probe or a quadratic interval product.
    Right rows sort before left rows at equal ts, giving <= semantics;
    a hash of the right values breaks remaining ties deterministically
    (callers wanting well-defined semantics should keep (key, ts)
    unique on the right, as the registry query does). The same
    formulation is plain ANSI SQL, so the DuckDB oracle checks it
    end-to-end.

    ``tolerance``: bounded staleness (pandas merge_asof's knob) — a
    match older than ``left_ts - tolerance`` yields NULLs instead, so
    a sensor that went quiet stops enriching rows forever. Units:
    seconds for timestamp columns, the column's own units for numeric
    ts. Implemented by also carrying the matched right TIMESTAMP in
    the same window pass — still one shuffle, no extra join.
    """
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType
        ).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    u = l_tagged.unionByName(r_tagged).withColumn(
        "__tie", F.xxhash64(*[f"__r_{c}" for c in value_cols])
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__is_l", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the matched right ROW as one struct (non-null exactly when
    # the row is a right row, so ignorenulls skips only left rows):
    # per-column ignorenulls carries would let a stale non-null value
    # outlive a newer right row whose value column is NULL — and under
    # `tolerance` pair that stale value with the newer row's timestamp.
    # Row semantics match pandas merge_asof: the latest right ROW wins,
    # its values taken verbatim, NULLs included.
    rrow = F.when(
        F.col("__is_l") == 0,
        F.struct(
            F.col("__ts").alias("__rts"),
            *[F.col(f"__r_{c}").alias(f"__rv_{c}") for c in value_cols],
        ),
    )
    carried = u.select(
        "__is_l",
        "__l",
        "__ts",
        F.last(rrow, ignorenulls=True).over(w).alias("__rr"),
    ).select(
        "__is_l",
        "__l",
        "__ts",
        *[F.col(f"__rr.__rv_{c}").alias(f"__rv_{c}") for c in value_cols],
        F.col("__rr.__rts").alias("__rts"),
    )
    if tolerance is None:
        fresh = F.lit(True)
    elif carried.schema["__ts"].dataType.typeName().startswith("timestamp"):
        # ANSI forbids timestamp->double casts; interval arithmetic
        # keeps µs precision exactly (tolerance in seconds)
        # :f formatting — str(float) scientific notation (1e-05) is
        # rejected by the interval parser
        fresh = F.col("__rts") >= F.col("__ts") - F.expr(
            f"INTERVAL '{float(tolerance):.6f}' SECOND"
        )
    else:
        fresh = (F.col("__ts") - F.col("__rts")) <= F.lit(tolerance)
    return carried.filter(F.col("__is_l") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[
            F.when(fresh, F.col(f"__rv_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
    )


def _positions(col, m: int, k: int):
    """The k bit positions of a key: JVM xxhash64 seeded by position
    index, mod m (m is forced to a multiple of 64)."""
    return [F.pmod(F.xxhash64(F.lit(j), col), F.lit(m)) for j in range(k)]


def _bloom_bitmap(keys: DataFrame, on: str, m: int, k: int):
    """Assemble the Bloom bitmap DISTRIBUTED: positions fold into
    64-bit words executor-side (``word = p >> 6``, ``bit_or`` partial
    aggregation), and only the <= m/64 populated word rows reach the
    driver — never the O(k*n) distinct positions, which at the
    operator's own beyond-broadcast regime would be a larger driver
    transfer than the raw key set whose broadcast it exists to avoid.

    Returns (little-endian uint8 bitmap of m/8 bytes, words collected).
    """
    words = (
        keys.select(F.explode(F.array(*_positions(F.col(on), m, k))).alias("p"))
        .select(
            F.shiftright("p", 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .toPandas()
    )
    bits = np.zeros(m // 8, dtype=np.uint8)
    wv = words["w"].to_numpy(dtype=np.int64)
    bv = words["bits"].to_numpy(dtype=np.int64).view(np.uint64)
    bits.view("<u8")[wv] = bv
    return bits, len(words)


def bloom_anti_join(
    probe: DataFrame,
    keys: DataFrame,
    on: str,
    fpp: float = 0.01,
    expected: int | None = None,
) -> DataFrame:
    """Anti join with a Bloom-filter pre-pass for beyond-broadcast key sets.

    The reference's dedup (J1, ItemRepository.java:11-17) broadcasts the
    existing-id set; past ~a few hundred MB that breaks and Spark falls
    back to a full shuffle of BOTH sides. This keeps the probe side
    (the 100 TB side) unshuffled for every row the filter proves new:

    1. build — each key hashes to ``k`` bit positions (JVM ``xxhash64``,
       seeded by position index); the distinct positions aggregate
       map-side and a ~``m/8``-byte bitmap is assembled once and
       broadcast (1.2 MB per million keys at 1% fpp — broadcastable
       long after the raw key set is not).
    2. probe — a vectorized Pandas UDF tests all ``k`` bits per row.
       Rows with any bit clear are *definitely* new and bypass the
       join entirely (no shuffle).
    3. the ~``fpp`` fraction of maybe-duplicates goes through the
       exact ``left_anti`` join, so the result is exact, not
       approximate — the filter only reduces shuffled volume.

    Semantics are identical to ``probe.join(keys, on, 'left_anti')``.

    At scale pass ``expected`` from table statistics to skip the extra
    (column-pruned) ``count()`` pass over the key set.
    """
    n = expected if expected is not None else max(keys.count(), 1)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2)) + 1
    m += (-m) % 64
    k = max(1, round(m / n * math.log(2)))

    bits, _ = _bloom_bitmap(keys, on, m, k)
    bcast = probe.sparkSession.sparkContext.broadcast(bits)

    def positions(col):
        return _positions(col, m, k)

    @pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        b = bcast.value
        v = np.array(pos.tolist(), dtype=np.int64)  # (rows, k)
        hit = (b[v >> 3] & (1 << (v & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    flagged = probe.withColumn(
        "__maybe", might_contain(F.array(*positions(F.col(on))))
    )
    sure_new = flagged.filter(~F.col("__maybe")).drop("__maybe")
    maybes = flagged.filter(F.col("__maybe")).drop("__maybe")
    return sure_new.unionByName(maybes.join(keys, on, "left_anti"))


def range_join(
    probe: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    broadcast_bands: bool = True,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Range (interval) join: match each probe row to the band row(s)
    whose ``[lo, hi)`` interval contains ``value`` — an operator Spark
    has no native strategy for (a raw theta join plans as
    BroadcastNestedLoopJoin: O(n*m) compares).

    Binned implementation: both sides map into fixed-width buckets —
    the probe by ``floor(value / w)``, each band exploded to every
    bucket its interval overlaps — then an EQUI-join on bucket id with
    the exact ``lo <= v < hi`` residual predicate. Catalyst gets a
    hashable key, so it picks broadcast-hash or sort-merge and the
    compare count drops from |probe| x |bands| to |probe| x
    avg-bands-per-bucket. At 100 TB: pick ``bucket_width`` near the
    median band width so each band explodes to O(1) buckets; the probe
    side never expands.
    """
    nb = F.floor(F.col(hi_col) / bucket_width).cast("long")
    b0 = F.floor(F.col(lo_col) / bucket_width).cast("long")
    exploded = bands.withColumn(
        "__bucket", F.explode(F.sequence(b0, nb))
    )
    probe_b = probe.withColumn(
        "__bucket", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    join_keys = ["__bucket"]
    if salt_buckets:
        # SHUFFLE-join skew spread (r5 brief #5): when the bands side
        # is too big to broadcast, the bucket id is the shuffle key and
        # a hot VALUE (half the probe in one bucket) pins one reducer.
        # Salt the probe deterministically (hash of its own columns),
        # replicate each exploded band over the salt range, join on
        # (bucket, salt) — exact for inner containment (each probe row
        # meets each matching band exactly once, in its own salt).
        # Irrelevant under broadcast_bands: broadcast joins never
        # shuffle the probe.
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in probe.columns]),
            F.lit(salt_buckets),
        )
        probe_b = probe_b.withColumn("__salt", salt)
        exploded = exploded.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        )
        join_keys = ["__bucket", "__salt"]
    # Pin the build side: band tables are near-always the small side,
    # and a stats misestimate that broadcasts the PROBE instead (seen
    # at small SF, fatal at 100 TB) must not be possible.
    if broadcast_bands:
        exploded = F.broadcast(exploded)
    out = probe_b.join(exploded, join_keys).filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return out.drop(*join_keys)


def batch_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = 0,
    upper_s: int = 3600,
    time_bucketed: bool = False,
) -> DataFrame:
    """Batch equi-key interval join: pairs with equal ``key`` and
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` (the batch
    twin of streaming.joins_stream.interval_join; output columns are
    the left row + right's ``right_ts``/``event_id``-style columns
    prefixed ``r_``).

    ``time_bucketed`` is the SKEW-SPREADING plan (r5 brief #5): a hot
    key (one user carrying half the events) funnels the whole join
    into one reducer under the plain (key)-keyed shuffle — AQE's
    skew-join split rescues sort-merge joins, but only after the
    skewed partition materializes, and not stream-stream state. The
    spread adds a derived equi-column tb = floor(ts / W) with
    W = upper_s - lower_s (so any row's match window [ts+lower,
    ts+upper] spans AT MOST two buckets), explodes the LEFT side to
    its <= 2 candidate buckets, and joins on (key, tb) + the exact
    interval residual: each matching pair agrees on exactly one tb
    (the right row's), so results are EXACTLY the plain join's —
    asserted in tests — while a hot key's rows now shuffle across its
    time buckets. The residual skew (hot key AND hot instant) is
    irreducible by any keying.

    Use :func:`skew_aware_interval_join` to let the heavy-hitters
    profiler pick the plan.
    """
    w = max(upper_s - lower_s, 1)
    lcols = [F.col(f"l.{c}") for c in left.columns]
    rcols = [
        F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns if c != key
    ]
    if not time_bucketed:
        l, r = left.alias("l"), right.alias("r")
        cond = (
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower_s} SECONDS"))
            & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper_s} SECONDS"))
        )
        return l.join(r, cond).select(*lcols, *rcols)
    lo_b = F.floor((F.unix_timestamp(F.col(left_ts)) + F.lit(lower_s)) / w)
    hi_b = F.floor((F.unix_timestamp(F.col(left_ts)) + F.lit(upper_s)) / w)
    l = left.withColumn(
        "__tb", F.explode(F.array_distinct(F.array(lo_b, hi_b)))
    ).alias("l")
    r = right.withColumn(
        "__tb", F.floor(F.unix_timestamp(F.col(right_ts)) / w)
    ).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l.__tb") == F.col("r.__tb"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return l.join(r, cond).select(*lcols, *rcols)


def skew_aware_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = 0,
    upper_s: int = 3600,
    hot_share: float = 0.2,
    profile_capacity: int = 4096,
) -> DataFrame:
    """Profiler-composed interval join (r5 brief #5, closing the loop
    the heavy-hitters profiler opened): run the bounded-state
    Misra-Gries profile on the LEFT side's key column; if the heaviest
    key carries >= ``hot_share`` of rows, plan the time-bucket-spread
    join, else the plain one. The profile is two bounded scans
    (operators.skew.heavy_hitters_sketch) — at 100 TB this is the
    decide-then-plan pattern: the statistic is cheap, choosing the
    wrong plan is not."""
    from streamforge_data_pipeline_spark.operators.skew import heavy_hitters_sketch

    top = heavy_hitters_sketch(
        left, key=key, k=1, capacity=profile_capacity
    ).collect()
    skewed = bool(top) and top[0]["share"] >= hot_share
    return batch_interval_join(
        left, right, key, left_ts, right_ts, lower_s, upper_s,
        time_bucketed=skewed,
    )
