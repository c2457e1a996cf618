"""Ordered per-row validation with first-failure labeling.

Re-expresses the reference's validateRow
(/root/reference/src/main/java/com/example/rest_service/service/
BackgroundCsvProcessor.java:226-258) as a single Column expression so
the whole rule chain stays inside whole-stage codegen — no Python UDF.

Rule order (first failing rule labels the row, exactly the reference's
short-circuit order):
  1. arity / null cells           -> 'too few columns'        (:227)
  2. externalId empty after trim  -> 'externalId empty'       (:234)
  3. name empty after trim        -> 'name empty'             (:235)
  4. duplicate externalId         -> 'duplicate externalId'   (:238-242)
  5. quantity not an int          -> 'quantity invalid'       (:245-249)
  6. expiryDate not strict ISO    -> 'expiryDate invalid (expected yyyy-MM-dd)' (:251-255)

Duplicate semantics replicate the reference's quirk (SURVEY §7): a row
passing rules 1-3 *claims* its externalId (set-add at :242) even if it
later fails quantity/date — so a later row with the same id is labeled
'duplicate externalId' although the first was never inserted. In Spark
this is a running count over a window ordered by the stable row id,
restricted to claim-eligible rows; versus the existing table it is a
broadcast lookup (left join / anti-join, ItemRepository.java:11-17).

Scale: the window shuffles once on trim(external_id) — the same
partitioning a shuffle dedup needs anyway; the existing-ids side is
broadcast when small and falls back to a shuffled join automatically
(AQE) when the key set outgrows the broadcast threshold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from streamforge_data_pipeline_spark.sources.csv_intake import CORRUPT_COL

ERR_TOO_FEW = "too few columns"
ERR_ID_EMPTY = "externalId empty"
ERR_NAME_EMPTY = "name empty"
ERR_DUP = "duplicate externalId"
ERR_QTY = "quantity invalid"
ERR_DATE = "expiryDate invalid (expected yyyy-MM-dd)"

# Integer.parseInt acceptance (BackgroundCsvProcessor.java:246): optional
# sign + digits only; range enforced via try_cast (parseInt overflow ->
# NumberFormatException -> invalid).
_INT_RE = r"^[+-]?[0-9]{1,10}$"
_DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"


def quantity_valid(qty: Column) -> Column:
    t = F.trim(qty)
    return t.rlike(_INT_RE) & t.try_cast("int").isNotNull()


def date_valid(d: Column) -> Column:
    """Strict ISO yyyy-MM-dd (DateTimeFormatter.ISO_LOCAL_DATE, :26)."""
    t = F.trim(d)
    # try_to_timestamp instead of to_date: must not throw under the
    # driver's default ANSI session.
    return t.rlike(_DATE_RE) & F.try_to_timestamp(t, F.lit("yyyy-MM-dd")).isNotNull()


def validate(
    df: DataFrame,
    existing_ids: DataFrame,
    order_col: str = "row_id",
    external_id: str = "externalId",
    name: str = "name",
    quantity: str = "quantity",
    expiry_date: str = "expiryDate",
) -> DataFrame:
    """Append an ``error`` column (null == valid row).

    ``df`` must carry a stable total-order column ``order_col`` (file
    position for CSV intake — SURVEY §7 'hard parts'). ``existing_ids``
    is a 1-column DataFrame (``external_id``) of ids already present in
    the target table.
    """
    eid = F.coalesce(F.col(external_id), F.lit(""))
    nm = F.coalesce(F.col(name), F.lit(""))
    tid, tname = F.trim(eid), F.trim(nm)
    # Null cells coalesce to '' before rule checks (reference does the
    # same for cells 0-1 at :229-232; parseInt('')/parse date '' fail,
    # matching null-quantity/date rows being rejected, not passed).
    qty_c = F.coalesce(F.col(quantity), F.lit(""))
    date_c = F.coalesce(F.col(expiry_date), F.lit(""))

    # Arity (:227): univocity reports the true cell count. When the
    # frame came through the CSV intake, Spark's PERMISSIVE
    # corrupt-record column is present: it is non-null exactly when the
    # row's logical cell count != 4, and it holds the RAW line — so
    # the true cell count is recovered by first collapsing every
    # QUOTED field ('"..."' with '""' escapes, univocity defaults) to
    # a comma-free token and then counting comma splits: 'A,"B,C",5'
    # counts 3 (too few, as univocity's row.length says), where the
    # r4 naive split counted 4 and mislabeled it ERR_DATE (the
    # then-documented divergence, closed per the r4 brief #6). A
    # 3-cell row gets 'too few columns' verbatim; a >=5-token row
    # passes arity like the reference even when its 4th cell is empty
    # ('A,B,5,,x' -> expiryDate invalid, not too-few). Remaining
    # documented edge: an UNTERMINATED quote (univocity swallows the
    # rest of the line into one field) still counts its commas here —
    # the reference's generator (CsvGenerator.java) can produce
    # neither quotes nor that malformation. The regexp stays a JVM
    # codegen expression: no Python on the validate path
    # (test_plan_shapes.py). Frames from other sources (the derived
    # parquet intake) have no corrupt column; both trailing cells null
    # is the fallback signal for a short row.
    if CORRUPT_COL in df.columns:
        unquoted = F.regexp_replace(F.col(CORRUPT_COL), r'"(""|[^"])*"', "Q")
        raw_arity = F.size(F.split(unquoted, ",", -1))
        too_few = F.col(CORRUPT_COL).isNotNull() & (raw_arity < 4)
    else:
        too_few = F.col(quantity).isNull() & F.col(expiry_date).isNull()

    # claim-eligible = passed rules 1-3: the reference's arity check
    # (:227) returns BEFORE the set-add at :242, so a short row must
    # not claim its id either.
    eligible = ~too_few & (tid != "") & (tname != "")
    w = (
        Window.partitionBy(tid)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_claims = F.sum(F.when(eligible, 1).otherwise(0)).over(w)

    in_existing = F.col("__in_existing")
    joined = df.join(
        F.broadcast(existing_ids.select(F.col("external_id").alias("__ex_id"))),
        tid == F.col("__ex_id"),
        "left",
    ).withColumn("__in_existing", F.col("__ex_id").isNotNull())

    error = (
        F.when(too_few, ERR_TOO_FEW)
        .when(tid == "", ERR_ID_EMPTY)
        .when(tname == "", ERR_NAME_EMPTY)
        .when(in_existing | (cum_claims > 1), ERR_DUP)
        .when(~quantity_valid(qty_c), ERR_QTY)
        .when(~date_valid(date_c), ERR_DATE)
    )
    return joined.withColumn("error", error).drop("__ex_id", "__in_existing")


def split_valid(validated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Partition into (valid, rejected) — P8's relation split."""
    return (
        validated.filter(F.col("error").isNull()),
        validated.filter(F.col("error").isNotNull()),
    )


def to_items(valid: DataFrame, external_id="externalId", name="name",
             quantity="quantity", expiry_date="expiryDate") -> DataFrame:
    """Promote validated string rows to the typed items schema
    (rowToEntity, BackgroundCsvProcessor.java:263-270)."""
    return valid.select(
        F.trim(external_id).alias("external_id"),
        F.trim(name).alias("name"),
        F.trim(quantity).try_cast("int").alias("quantity"),
        F.try_to_timestamp(F.trim(expiry_date), F.lit("yyyy-MM-dd"))
        .cast("date")
        .alias("expiry_date"),
    )
