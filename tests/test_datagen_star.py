"""datagen_star: schema parity with driver testdata, determinism
under repartitioning, and distribution invariants that downstream
dedup/similarity operators depend on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.session import load
from streamforge_data_pipeline_spark.sources import datagen_star as DS

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def star(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("star") / "sf")
    DS.write_star(spark, 0.002, out)
    return out


TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.mark.parametrize("table", TABLES)
def test_schema_matches_driver(spark, star, table):
    ours = load(spark, star, table).schema
    theirs = load(spark, SF_SMALL, table).schema
    assert [(f.name, f.dataType) for f in ours] == [(f.name, f.dataType) for f in theirs]


def test_row_counts_scale_linearly():
    r1, r01 = DS.table_rows(1.0), DS.table_rows(0.1)
    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        assert r1[t] == 10 * r01[t]
    assert r01["lineitem"] == 600_000  # matches the driver's sf0.1


def test_documents_partition_invariant(spark):
    """Every row is a pure function of its id: generating over the
    default range partitioning vs a 13-way reshuffle yields identical
    rows (the property that makes the generator cluster-safe)."""
    a = sorted(DS.gen_documents(spark, 300).collect())
    b = sorted(
        spark.range(300).repartition(13).mapInPandas(DS._documents_kernel, DS.DOC_SCHEMA).collect()
    )
    assert a == b
    c = sorted(
        spark.range(300).repartition(7).mapInPandas(DS._embeddings_kernel, DS.EMB_SCHEMA).collect()
    )
    d = sorted(DS.gen_embeddings(spark, 300).collect())
    assert [r.vec_id for r in c] == [r.vec_id for r in d]
    assert all(x.embedding == y.embedding for x, y in zip(c, d))


def test_documents_dup_structure(spark):
    docs = DS.gen_documents(spark, 2000).collect()
    dups = [r for r in docs if r.text.endswith(" dup")]
    rate = len(dups) / len(docs)
    assert 0.02 < rate < 0.06  # planted ~4%
    texts = {r.doc_id: r.text for r in docs}
    # every dup's stem must equal some earlier doc's full text
    stems = {t[: -len(" dup")] for t in (r.text for r in dups)}
    originals = {t for t in texts.values() if not t.endswith(" dup")}
    assert stems <= originals
    for r in docs:
        assert r.n_chars == len(r.text)
        assert 10 <= len(r.text.split()) <= 101


def test_embeddings_unit_norm_and_labels(spark):
    rows = DS.gen_embeddings(spark, 500).collect()
    E = np.array([r.embedding for r in rows])
    assert E.shape == (500, DS.EMB_DIM)
    assert np.allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-5)
    assert set(r.label for r in rows) == set(range(10))


def test_events_monotonic_ts(spark):
    ev = DS.gen_events(spark, 5000)
    bad = (
        ev.select("event_id", "ts")
        .withColumn("prev", F.lag("ts").over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("event_id")))
        .where(F.col("prev") > F.col("ts"))
        .count()
    )
    assert bad == 0
