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

from pyspark.sql import DataFrame, functions as F
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
    """
    n = expected if expected is not None else max(keys.count(), 1)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2)) + 1
    m += (-m) % 64
    k = max(1, round(m / n * math.log(2)))

    def positions(col):
        return [F.pmod(F.xxhash64(F.lit(j), col), F.lit(m)) for j in range(k)]

    pos_df = (
        keys.select(F.explode(F.array(*positions(F.col(on)))).alias("p"))
        .distinct()
        .toPandas()
    )
    bits = np.zeros(m // 8, dtype=np.uint8)
    pv = pos_df["p"].to_numpy(dtype=np.int64)
    np.bitwise_or.at(bits, pv >> 3, (1 << (pv & 7)).astype(np.uint8))
    bcast = probe.sparkSession.sparkContext.broadcast(bits)

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
