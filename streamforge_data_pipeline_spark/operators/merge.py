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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff: (id, change) for every document that was
    ``added``, ``removed``, or ``modified`` between two snapshots —
    the incremental-crawl ops query (which docs does the next pipeline
    run actually need to touch?). Unchanged docs are omitted: at
    snapshot scale they are ~all the data, and the diff's value is
    precisely that downstream work is proportional to |changes|.

    100 TB shape: each side reduces to (id, sha256(content)) BEFORE
    the join, so the full-outer join shuffles 8-byte ids + 32-byte
    hashes, never document bodies — the same never-ship-bodies rule as
    exact_dedup. The join is a plain equi-key shuffle join on the id;
    with both snapshots stored bucketed by id it becomes exchange-free
    (sources.store.write_bucketed). Modification detection by hash
    equality has sha256-collision false-negative odds only.
    """
    # presence is a per-side MARKER, never hash NULL-ness: a NULL
    # content hashes to NULL, and keying added/removed on the hash
    # would misclassify every NULL-content doc (present on both sides
    # but reported added). Modification compares hashes NULL-SAFELY so
    # NULL -> NULL is unchanged and NULL <-> text is modified.
    oh = old.select(
        F.col(id_col),
        F.sha2(F.col(content_col).cast("binary"), 256).alias("__h_old"),
        F.lit(True).alias("__in_old"),
    )
    nh = new.select(
        F.col(id_col),
        F.sha2(F.col(content_col).cast("binary"), 256).alias("__h_new"),
        F.lit(True).alias("__in_new"),
    )
    j = oh.join(nh, id_col, "full_outer")
    return (
        j.withColumn(
            "change",
            F.when(F.col("__in_old").isNull(), F.lit("added"))
            .when(F.col("__in_new").isNull(), F.lit("removed"))
            .when(
                ~F.col("__h_old").eqNullSafe(F.col("__h_new")),
                F.lit("modified"),
            )
            .otherwise(F.lit(None)),
        )
        .filter(F.col("change").isNotNull())
        .select(id_col, "change")
    )
