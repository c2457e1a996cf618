"""Join operators (SURVEY §2.3).

The reference implements join *semantics* imperatively (set membership,
EXISTS probes); here they are declarative joins so Catalyst picks
broadcast vs shuffled-hash vs sort-merge from statistics, and AQE
re-plans at runtime (skew splitting, dynamic broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def inner_equi(left: DataFrame, right: DataFrame, on, broadcast_right=True) -> DataFrame:
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, "inner")


def exists_semi(probe: DataFrame, keys: DataFrame, on) -> DataFrame:
    """P3/J3: EXISTS as a left-semi join (existsBy*, ItemRepository.java:13,
    UserRepository.java:17-19) — never materializes right-side columns."""
    return probe.join(keys, on, "left_semi")


def not_exists_anti(probe: DataFrame, keys: DataFrame, on) -> DataFrame:
    return probe.join(keys, on, "left_anti")
