"""Sink/source breadth: partition-pruned layout, JSON round-trip, and
malformed-CSV permissiveness."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.session import load
from streamforge_data_pipeline_spark.sources.csv_intake import read_intake_csv
from streamforge_data_pipeline_spark.sources.store import TableStore

from tests.conftest import SF_SMALL


def test_partitioned_layout_prunes(spark, tmp_path):
    store = TableStore(str(tmp_path))
    ev = load(spark, SF_SMALL, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    store.append_partitioned(ev, "events_p", ["day"])

    back = spark.read.parquet(store.path("events_p"))
    one_day = back.filter(F.col("day") == "2024-01-03")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition filter prunes directories at planning time
    assert "PartitionFilters: [isnotnull(day" in plan or "day#" in plan
    assert one_day.count() == ev.filter(F.col("day") == "2024-01-03").count()


def test_json_round_trip(spark, tmp_path):
    store = TableStore(str(tmp_path))
    cust = load(spark, SF_SMALL, "customer")
    store.write_json(cust, "customer")
    back = store.read_json(spark, "customer", schema=cust.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cust.collect()))


def test_compaction_reduces_file_count(spark, tmp_path):
    store = TableStore(str(tmp_path))
    ev = load(spark, SF_SMALL, "events")
    # simulate many micro-batch files
    ev.repartition(24).write.mode("overwrite").parquet(store.path("many"))
    before = ev.count()
    n_files = store.compact(spark, "many", target_files=2)
    assert n_files <= 2
    assert spark.read.parquet(store.path("many")).count() == before


def test_malformed_csv_rows_surface_as_errors(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "externalId,name,quantity,expiryDate\n"
        'B1,"unclosed quote,5,2026-09-01\n'
        "B2,Good,5,2026-09-01\n"
    )
    df = read_intake_csv(spark, str(p))
    # PERMISSIVE mode: the malformed line lands as a row (null-padded or
    # quote-swallowed), never an exception; validation labels it.
    assert df.count() >= 1
    from streamforge_data_pipeline_spark.operators.validate import validate

    validated = validate(df, spark.createDataFrame([], "external_id string"), "row_id")
    good = validated.filter(F.col("error").isNull())
    assert good.filter(F.col("externalId") == "B2").count() <= 1


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    store = TableStore(str(tmp_path))
    ev = load(spark, SF_SMALL, "events").select("event_id", "event_type", "value")
    store.write_orc(ev, "events")
    back = store.read_orc(spark, "events")
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0
    # predicate + projection reach the ORC scan like parquet
    q = back.filter(F.col("event_type") == "click").select("event_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_type" in plan
    assert "ReadSchema: struct<event_id:bigint" in plan


def test_manifest_matches_data(spark, tmp_path):
    store = TableStore(str(tmp_path))
    ev = load(spark, SF_SMALL, "events").select("event_id", "event_type")
    ev.repartition(4).write.parquet(store.path("ev"))
    m = store.write_manifest(spark, "ev")
    assert m["total_rows"] == ev.count()
    assert len(m["files"]) == 4
    assert all(f["rows"] > 0 and f["bytes"] > 0 for f in m["files"])
    # manifest is on disk next to the data and self-consistent
    import json, os

    with open(os.path.join(store.path("ev"), "_manifest.json")) as fh:
        disk = json.load(fh)
    assert disk["total_rows"] == m["total_rows"]
    assert {f["name"] for f in disk["schema"]["fields"]} == {"event_id", "event_type"}


def test_manifest_survives_uri_hostile_store_path(spark, tmp_path):
    """input_file_name() percent-encodes spaces/%/# in its URI; the
    manifest must key per-file counts by normalized path instead of
    silently writing rows=0 (r3 advice)."""
    hostile = tmp_path / "my store 100% #demo"
    hostile.mkdir()
    store = TableStore(str(hostile))
    ev = load(spark, SF_SMALL, "events").select("event_id", "event_type")
    ev.repartition(3).write.parquet(store.path("ev"))
    m = store.write_manifest(spark, "ev")
    assert m["total_rows"] == ev.count()
    assert all(f["rows"] > 0 for f in m["files"])


def test_avro_roundtrip_or_clear_gate(spark, tmp_path):
    """Avro completes the format matrix when the external spark-avro
    module is deployed; without it (this container) the store must
    fail with an actionable message, not Spark's raw lookup error."""
    import pytest

    store = TableStore(str(tmp_path))
    ev = load(spark, SF_SMALL, "events").select("event_id", "event_type", "value")
    if TableStore.avro_available(spark):
        store.write_avro(ev, "events")
        back = store.read_avro(spark, "events")
        assert back.count() == ev.count()
        assert back.exceptAll(ev).count() == 0
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            store.write_avro(ev, "events")
        with pytest.raises(RuntimeError, match="spark-avro"):
            store.read_avro(spark, "events")


def test_count_data_rows_excludes_header(spark, tmp_path):
    """S2's progress denominator: data rows, not file lines
    (reference behavior: total = lines - header)."""
    from streamforge_data_pipeline_spark.sources.csv_intake import count_data_rows

    p = tmp_path / "intake.csv"
    p.write_text(
        "externalId,name,quantity,expiryDate\n"
        "A1,One,1,2026-09-01\n"
        "A2,Two,2,2026-09-02\n"
        "A3,Three,3,2026-09-03\n"
    )
    assert count_data_rows(spark, str(p)) == 3
