"""SCD2 merge (upsert with history) as a batch DataFrame operator.

The reference persists mutable rows (JPA save/update); a warehouse
engine keeps history instead. `scd2_apply` is the MERGE INTO
equivalent expressed as one full-outer join + three projection
branches — no per-row driver loop, no mutable state, deterministic
output — which is the shape that scales: one shuffle on the business
key regardless of table size, and the updates side is typically small
enough to broadcast.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def _changed(attrs: list[str]) -> Column:
    return reduce(
        lambda a, b: a | b,
        [~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}")) for c in attrs],
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_ts",
) -> DataFrame:
    """Apply one batch of updates to an SCD2 dimension.

    ``current`` carries (key, attrs..., valid_from, valid_to,
    is_current); ``updates`` carries (key, attrs..., eff_col), at most
    one row per key. Matched-and-changed keys get their open row
    closed at the effective timestamp plus a new open row; unchanged
    matches and untouched rows pass through; unmatched updates insert
    as new open rows.

    Only the ``is_current`` rows participate in the merge join — closed
    history rows pass through untouched. Joining the whole dimension on
    key alone would match every history row of an updated key too,
    rewriting their ``valid_to`` and emitting one duplicate open row
    per matched history row (compounding every batch).
    """
    out_cols = [key, *attrs, "valid_from", "valid_to", "is_current"]
    history = current.filter(~F.col("is_current")).select(*out_cols)
    cur = current.filter(F.col("is_current")).alias("cur")
    upd = updates.alias("upd")
    # All three output branches read the joined relation; persist so
    # the full-outer join (and both inputs) run once, not three times.
    j = cur.join(
        upd, F.col(f"cur.{key}") == F.col(f"upd.{key}"), "full_outer"
    ).persist()

    passthrough = j.filter(
        F.col(f"upd.{key}").isNull() | ~_changed(attrs)
    ).filter(F.col(f"cur.{key}").isNotNull()).select(
        *[F.col(f"cur.{c}").alias(c) for c in out_cols]
    )
    closed = j.filter(
        F.col(f"cur.{key}").isNotNull()
        & F.col(f"upd.{key}").isNotNull()
        & _changed(attrs)
    ).select(
        *[F.col(f"cur.{c}").alias(c) for c in [key, *attrs]],
        F.col("cur.valid_from").alias("valid_from"),
        F.col(f"upd.{eff_col}").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.filter(
        F.col(f"upd.{key}").isNotNull()
        & (F.col(f"cur.{key}").isNull() | _changed(attrs))
    ).select(
        *[F.col(f"upd.{c}").alias(c) for c in [key, *attrs]],
        F.col(f"upd.{eff_col}").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out = (
        history.unionByName(passthrough).unionByName(closed).unionByName(opened)
    )
    from streamforge_data_pipeline_spark.functions import finalize_released

    return finalize_released(out, j)
