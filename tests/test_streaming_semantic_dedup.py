"""Continuous semantic near-dup ingestion (semantic_dedup_stream):
postcondition tests — the admitted vector corpus is cosine-dup-free at
tau within every quantizer cell, every rejection resolves transitively
to an admitted vector, and nothing is lost or double-admitted across
micro-batches, re-runs, or the log/corpus crash window."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.similarity import (
    semantic_dedup_fixed_cells,
)
from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.semantic_dedup_stream import (
    start_stream_semantic_dedup,
)

DIM = 10
TAU = 0.4


def _vec(cell: int, variant: float, tail: float = 0.0) -> list[float]:
    """Unit-ish vector dominated by axis `cell` (so argmax_cell lands
    there) with a small `variant` on the next axis; `tail` adds norm on
    a dim PAST the first 8, changing cosine without moving the cell."""
    v = [0.0] * DIM
    v[cell] = 1.0
    v[(cell + 1) % 8] = variant
    v[8] = tail
    return v


# family A (cell 0): mutual cosine ~0.999; family B (cell 1): same.
# D: cell 0 (|0.3| is the max of the first 8 dims) but its large dim-8
# tail drops cosine vs family A to ~0.19 < tau — an in-cell NON-dup.
def _d_vec() -> list[float]:
    v = [0.0] * DIM
    v[0] = 0.3
    v[8] = 1.5
    return v


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, inbox, store, ckpt):
    q = start_stream_semantic_dedup(spark, inbox, store, checkpoint_dir=ckpt)
    q.awaitTermination()


def _corpus_dup_free(corpus) -> bool:
    res = semantic_dedup_fixed_cells(corpus, n_cells=8, tau=TAU)
    return res.filter(~F.col("keep")).count() == 0


def test_stream_semantic_dedup_end_to_end(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    store = TableStore(str(tmp_path / "store"))

    # batch 1: two cell-0 near-dups (in-batch pair) + one cell-1
    _write(
        spark,
        inbox,
        [(1, _vec(0, 0.05)), (2, _vec(0, 0.10)), (3, _vec(1, 0.05))],
    )
    time.sleep(1.1)
    # batch 2: another cell-0 dup (of the admitted rep), a cell-1 dup,
    # and the in-cell-but-below-tau novel vector D
    _write(
        spark,
        inbox,
        [(4, _vec(0, 0.15)), (5, _vec(1, 0.10)), (6, _d_vec())],
    )

    _drain(spark, inbox, store, ckpt)

    corpus = store.read(spark, "vec_corpus")
    log = store.read(spark, "semantic_dup_log")
    corpus_ids = {r["vec_id"] for r in corpus.select("vec_id").collect()}
    log_rows = {r["vec_id"]: r for r in log.collect()}

    # every input id decided exactly once
    assert set(log_rows) == {1, 2, 3, 4, 5, 6}
    assert log.count() == 6

    # admitted: one cell-0 rep (1 or 2), the cell-1 rep (3), and D (6 —
    # same cell as family A, yet below tau: the probe must COMPARE, not
    # just collide)
    admitted = {i for i, r in log_rows.items() if r["origin"] == "admitted"}
    assert admitted == corpus_ids
    assert 3 in corpus_ids and 6 in corpus_ids
    assert len(corpus_ids & {1, 2}) == 1 and 4 not in corpus_ids
    assert 5 not in corpus_ids

    # postcondition: the admitted corpus is cosine-dup-free at tau
    assert _corpus_dup_free(corpus)

    # every rejection resolves transitively to an admitted vector
    def resolve(i: int, hops=0) -> int:
        assert hops < 5
        r = log_rows[i]
        return i if r["dup_of"] is None else resolve(r["dup_of"], hops + 1)

    for i in {1, 2, 3, 4, 5, 6} - admitted:
        assert resolve(i) in corpus_ids

    # index-origin rejections carry the cosine that justified them
    for i, r in log_rows.items():
        if r["origin"] == "index":
            assert r["cosine"] is not None and r["cosine"] >= TAU


def test_stream_semantic_dedup_rerun_is_idempotent(spark, tmp_path):
    """Draining the same inbox with a FRESH checkpoint (forced
    re-processing) must not double-admit or re-log anything."""
    inbox = str(tmp_path / "inbox")
    store = TableStore(str(tmp_path / "store"))
    _write(spark, inbox, [(1, _vec(0, 0.05)), (2, _vec(1, 0.05))])

    _drain(spark, inbox, store, str(tmp_path / "ckpt1"))
    first_corpus = sorted(
        r["vec_id"] for r in store.read(spark, "vec_corpus").collect()
    )
    _drain(spark, inbox, store, str(tmp_path / "ckpt2"))

    assert (
        sorted(r["vec_id"] for r in store.read(spark, "vec_corpus").collect())
        == first_corpus
    )
    assert store.read(spark, "semantic_dup_log").count() == 2


def test_crash_between_log_and_corpus_appends_backfills(spark, tmp_path):
    """Log-first commit window: delete the corpus after a resolve (the
    simulated crash), re-deliver the batch — the replay guard must
    backfill admitted vectors from the replayed rows without
    duplicating log rows."""
    import shutil

    from streamforge_data_pipeline_spark.streaming.semantic_dedup_stream import (
        _resolve_batch,
    )

    store = TableStore(str(tmp_path / "store_bf"))
    batch = spark.createDataFrame(
        [(1, _vec(0, 0.05)), (2, _vec(0, 0.10)), (3, _vec(1, 0.05))],
        "vec_id long, embedding array<float>",
    )
    _resolve_batch(spark, batch, store, "vec_corpus", "semantic_dup_log", TAU)
    admitted = sorted(
        r["vec_id"] for r in store.read(spark, "vec_corpus").collect()
    )
    log_rows = store.read(spark, "semantic_dup_log").count()
    assert admitted

    shutil.rmtree(store.path("vec_corpus"))  # the crash window
    _resolve_batch(spark, batch, store, "vec_corpus", "semantic_dup_log", TAU)

    assert (
        sorted(r["vec_id"] for r in store.read(spark, "vec_corpus").collect())
        == admitted
    )
    assert store.read(spark, "semantic_dup_log").count() == log_rows


# --- trained quantizer (r5 brief #1: the unbounded-stream scale path) ----


def _drain_trained(spark, inbox, store, ckpt):
    q = start_stream_semantic_dedup(
        spark, inbox, store, checkpoint_dir=ckpt, quantizer="trained"
    )
    q.awaitTermination()


def test_trained_quantizer_end_to_end_semantics(spark, tmp_path):
    """Same planted families as the argmax test: in-batch dups
    collapse, cross-batch dups resolve against the corpus via the cell
    probe, the below-tau in-cell vector is admitted — semantics must
    not depend on WHICH quantizer forms the candidate cells (the
    verifier is exact cosine either way)."""
    inbox = str(tmp_path / "inbox")
    store = TableStore(str(tmp_path / "store"))
    _write(
        spark, inbox,
        [(1, _vec(0, 0.05)), (2, _vec(0, 0.10)), (3, _vec(1, 0.05))],
    )
    time.sleep(1.1)
    _write(
        spark, inbox,
        [(4, _vec(0, 0.15)), (5, _vec(1, 0.10)), (6, _d_vec())],
    )

    _drain_trained(spark, inbox, store, str(tmp_path / "ckpt"))

    corpus = store.read(spark, "vec_corpus")
    log_rows = {r["vec_id"]: r for r in store.read(spark, "semantic_dup_log").collect()}
    corpus_ids = {r["vec_id"] for r in corpus.select("vec_id").collect()}
    assert set(log_rows) == {1, 2, 3, 4, 5, 6}
    admitted = {i for i, r in log_rows.items() if r["origin"] == "admitted"}
    assert admitted == corpus_ids
    # cross-batch dups must be caught whenever quantizer cells put them
    # with their twin; with sqrt(N) cells over these tiny batches every
    # family shares a cell, so the outcome is exactly the argmax one
    assert 3 in corpus_ids and 6 in corpus_ids
    assert len(corpus_ids & {1, 2}) == 1 and 4 not in corpus_ids
    assert 5 not in corpus_ids
    # corpus rows carry their assigned cell (the partition column)
    assert "cell" in corpus.columns


def test_trained_quantizer_retrains_on_doubling_and_recells(spark, tmp_path):
    """Stream enough batches that the corpus doubles past the last
    train size: the centroid table must advance (trained_on grows,
    n_cells follows sqrt(N)) and every stored corpus cell must equal a
    fresh assignment under the CURRENT centroids (the re-cell job)."""
    import numpy as np

    from streamforge_data_pipeline_spark.operators.similarity import ivf_assign
    from streamforge_data_pipeline_spark.streaming.semantic_dedup_stream import (
        _load_centroids,
    )

    inbox = str(tmp_path / "inbox")
    store = TableStore(str(tmp_path / "store"))
    rng = np.random.default_rng(7)
    vid = 0
    # 4 batches of 12 well-separated 64-dim vectors (random 64-dim
    # cosines land ~N(0, 1/8), so tau=0.4 dups are ~0.1% — the corpus
    # actually grows): 12 -> ~48, crossing the 2x threshold at least
    # once after the first train
    for b in range(4):
        rows = []
        for _ in range(12):
            v = rng.normal(size=64).astype(float)
            v /= max(float(np.linalg.norm(v)), 1e-9)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
        _write(spark, inbox, rows)
    _drain_trained(spark, inbox, store, str(tmp_path / "ckpt"))

    cents, trained_on = _load_centroids(spark, store, "vec_corpus")
    corpus = store.read(spark, "vec_corpus")
    n_corpus = corpus.count()
    assert cents is not None
    # retrained past the first batch: trained on more than batch 0
    assert trained_on > 12
    # sqrt schedule at the last train size
    assert len(cents) == max(1, int(trained_on**0.5))
    # stored cells consistent with the current centroids
    fresh = ivf_assign(
        corpus.select("vec_id", "embedding"), cents,
        id_col="vec_id", vec_col="embedding",
    )
    mismatched = (
        corpus.select("vec_id", F.col("cell").alias("stored"))
        .join(fresh, "vec_id")
        .filter(F.col("stored") != F.col("cell"))
        .count()
    )
    assert mismatched == 0
    # every vector decided exactly once, admitted == corpus
    log = store.read(spark, "semantic_dup_log")
    assert log.select("vec_id").distinct().count() == vid
    assert log.filter("origin = 'admitted'").count() == n_corpus


def test_trained_probe_scan_is_partition_pruned(spark, tmp_path):
    """The probe reads the corpus through cell-directory partition
    pruning: a single-cell filter must touch strictly fewer files than
    the full corpus scan."""
    import numpy as np

    inbox = str(tmp_path / "inbox")
    store = TableStore(str(tmp_path / "store"))
    rng = np.random.default_rng(11)
    rows = []
    for i in range(36):
        v = rng.normal(size=64).astype(float)
        rows.append((i, [float(x) for x in v]))
    _write(spark, inbox, rows)
    _drain_trained(spark, inbox, store, str(tmp_path / "ckpt"))

    corpus = store.read(spark, "vec_corpus")
    cells = [r["cell"] for r in corpus.select("cell").distinct().collect()]
    assert len(cells) > 1  # sqrt(36) = 6 cells trained
    one = corpus.filter(F.col("cell") == cells[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the cell predicate lands in PartitionFilters (directory pruning),
    # never as a post-scan data filter
    assert "PartitionFilters: [" in plan and f"= {cells[0]})" in plan


def test_trained_rerun_is_idempotent(spark, tmp_path):
    """Fresh-checkpoint re-drain under the trained quantizer must not
    double-admit or re-log (the replay guard is quantizer-agnostic)."""
    inbox = str(tmp_path / "inbox")
    store = TableStore(str(tmp_path / "store"))
    _write(spark, inbox, [(1, _vec(0, 0.05)), (2, _vec(1, 0.05))])

    _drain_trained(spark, inbox, store, str(tmp_path / "ckpt1"))
    first = sorted(r["vec_id"] for r in store.read(spark, "vec_corpus").collect())
    _drain_trained(spark, inbox, store, str(tmp_path / "ckpt2"))

    assert sorted(
        r["vec_id"] for r in store.read(spark, "vec_corpus").collect()
    ) == first
    assert store.read(spark, "semantic_dup_log").count() == 2


def test_compact_partitioned_semantic_corpus(spark, tmp_path):
    """compact_partitioned generalizes to the trained path's
    cell-partitioned corpus: file count drops, cell layout and row
    contents identical (r7 maintenance op)."""
    import glob
    import os

    from streamforge_data_pipeline_spark.sources.store import TableStore

    store = TableStore(str(tmp_path / "store_cpc"))
    # several partitioned appends -> several files per cell dir
    for i in range(3):
        df = spark.createDataFrame(
            [(i * 10 + j, [float(j), 1.0], j % 2) for j in range(6)],
            "vec_id long, embedding array<double>, cell int",
        )
        store.append_partitioned(df, "vec_corpus", ["cell"])
    before = len(
        glob.glob(os.path.join(store.path("vec_corpus"), "**", "part-*"),
                  recursive=True)
    )
    rows_before = sorted(
        (r["vec_id"], tuple(r["embedding"]), r["cell"])
        for r in store.read(spark, "vec_corpus").collect()
    )
    after = store.compact_partitioned(spark, "vec_corpus", ["cell"])
    assert after < before
    assert sorted(
        (r["vec_id"], tuple(r["embedding"]), r["cell"])
        for r in store.read(spark, "vec_corpus").collect()
    ) == rows_before
    subdirs = {
        d for d in os.listdir(store.path("vec_corpus"))
        if d.startswith("cell=")
    }
    assert subdirs == {"cell=0", "cell=1"}
