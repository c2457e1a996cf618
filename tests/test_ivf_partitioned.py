"""Write-time IVF layout: partition pruning proven in the plan, and
bit-identity between the indexed probe and the in-memory seeded IVF."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators import similarity
from streamforge_data_pipeline_spark.session import load
from streamforge_data_pipeline_spark.sources.store import TableStore

from tests.conftest import SF_MED


def _build(spark, tmp_path, n_cells=16):
    store = TableStore(str(tmp_path / "store"))
    vecs = load(spark, SF_MED, "embeddings")
    similarity.build_ivf_index_seeded(vecs, store, n_cells=n_cells)
    return store, vecs


def test_indexed_probe_matches_in_memory_seeded(spark, tmp_path):
    store, vecs = _build(spark, tmp_path)
    queries = vecs.filter(F.col("vec_id") < 5)
    mem = [
        tuple(r)
        for r in similarity.ann_topk_ivf_seeded(vecs, queries, k=10)
        .orderBy("q_id", "rank")
        .collect()
    ]
    idx = [
        tuple(r)
        for r in similarity.ann_topk_ivf_seeded_indexed(
            spark, store, queries, k=10
        )
        .orderBy("q_id", "rank")
        .collect()
    ]
    assert mem == idx and len(idx) > 0


def test_index_layout_is_cell_partitioned(spark, tmp_path):
    store, _ = _build(spark, tmp_path)
    dirs = [
        d
        for d in os.listdir(store.path("ivf_index"))
        if d.startswith("cell=")
    ]
    assert len(dirs) >= 2  # the inverted file IS the directory layout


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    """The probe's cell IN (...) must land in the scan's
    PartitionFilters (directory pruning): other cells' files are never
    opened. nprobe=1 over 2 queries probes at most 2 of 16 cells."""
    store, vecs = _build(spark, tmp_path)
    queries = vecs.filter(F.col("vec_id") < 2)
    out = similarity.ann_topk_ivf_seeded_indexed(
        spark, store, queries, k=5, nprobe=1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell" in part_filters, plan[:2000]
    # and the in-list is a strict subset of the cells
    n_probed = part_filters.count("= ") + part_filters.count("IN")
    assert n_probed >= 1
