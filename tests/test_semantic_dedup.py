"""semantic_dedup: planted near-identical embedding groups collapse to
one keeper (min id), distinct vectors all survive, and the flags are
self-consistent."""

from __future__ import annotations

import numpy as np
import pytest

from streamforge_data_pipeline_spark.operators.similarity import semantic_dedup


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(7)
    rows = []
    # 12 distinct base vectors, well separated (random 16-dim)
    bases = rng.normal(size=(12, 16))
    for i, v in enumerate(bases):
        rows.append((i * 10, (v / np.linalg.norm(v)).tolist()))
    # plant near-duplicates of bases 0..2: tiny perturbation, cos ~ 1
    for i in range(3):
        v = bases[i] + rng.normal(scale=1e-3, size=16)
        rows.append((i * 10 + 1, (v / np.linalg.norm(v)).tolist()))
        v2 = bases[i] + rng.normal(scale=1e-3, size=16)
        rows.append((i * 10 + 2, (v2 / np.linalg.norm(v2)).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planted_groups_collapse(spark, planted):
    out = {r["vec_id"]: r for r in semantic_dedup(planted, n_cells=4, tau=0.98).collect()}
    assert len(out) == planted.count()
    for i in range(3):
        ids = (i * 10, i * 10 + 1, i * 10 + 2)
        # whole planted group shares the min id as its group label
        assert {out[x]["group_id"] for x in ids} == {i * 10}, ids
        assert [out[x]["keep"] for x in ids] == [True, False, False]
    # the 9 unique bases keep themselves
    for i in range(3, 12):
        assert out[i * 10]["group_id"] == i * 10 and out[i * 10]["keep"]
    # global invariant: exactly one keeper per group
    keepers = {r["group_id"] for r in out.values() if r["keep"]}
    assert keepers == {r["group_id"] for r in out.values()}


def test_no_duplicates_all_kept(spark):
    rng = np.random.default_rng(11)
    m = rng.normal(size=(20, 8))
    df = spark.createDataFrame(
        [(i, (m[i] / np.linalg.norm(m[i])).tolist()) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, n_cells=4, tau=0.999).collect()
    assert all(r["keep"] and r["group_id"] == r["vec_id"] for r in out)


def _same_group_pairs(rows):
    """rows: (id, group_id) -> set of intra-group (a<b) pairs."""
    from collections import defaultdict

    groups = defaultdict(list)
    for vid, gid in rows:
        groups[gid].append(vid)
    pairs = set()
    for members in groups.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def _closure_pairs(edge_rows, all_ids):
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return _same_group_pairs((i, find(i)) for i in all_ids)


def test_recall_curve_vs_exact_baseline(spark):
    """r4 brief #7: measure the n_cells-vs-recall trade against the
    exact all-pairs baseline instead of asserting it. Precision is
    structurally 1.0 (within-cell pairs are exact-cosine-verified, so
    semantic groups are a sub-closure of the exact closure); recall
    dips as cells shrink because a duplicate pair can straddle a cell
    boundary — that is SemDeDup's documented knob."""
    from streamforge_data_pipeline_spark.operators.similarity import near_dup_pairs

    rng = np.random.default_rng(23)
    tau = 0.95
    rows = []
    vid = 0
    bases = rng.normal(size=(50, 16))
    for b in bases:
        b = b / np.linalg.norm(b)
        rows.append((vid, b.tolist()))
        base_id = vid
        vid += 1
        for _ in range(2):  # two near-dups per base, cos ~ 0.95-0.99
            scale = rng.uniform(0.12, 0.30)
            v = b + rng.normal(scale=scale / 4, size=16)
            v = v / np.linalg.norm(v)
            rows.append((vid, v.tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").persist()
    all_ids = [r[0] for r in rows]

    exact_edges = [
        (r["id_a"], r["id_b"]) for r in near_dup_pairs(df, tau=tau).collect()
    ]
    truth = _closure_pairs(exact_edges, all_ids)
    assert len(truth) >= 50  # the corpus actually contains planted dups

    recalls = {}
    for n_cells in (4, 8, 16):
        got = _same_group_pairs(
            (r["vec_id"], r["group_id"])
            for r in semantic_dedup(df, n_cells=n_cells, tau=tau).collect()
        )
        assert got <= truth, "precision must be exactly 1.0"
        recalls[n_cells] = len(got & truth) / len(truth)
    df.unpersist()
    # default knob (n_cells=8): high recall required
    assert recalls[8] >= 0.9, recalls
    # the whole curve stays usable on this corpus
    assert min(recalls.values()) >= 0.7, recalls


def test_fixed_cells_variant_matches_brute_force(spark):
    """semantic_dedup_fixed_cells (the oracle-backed r5 variant): the
    argmax-|component| quantizer + pair/closure/keep stages against a
    plain Python recomputation. Bases get a DOMINANT leading component
    so the cell assignment is robust to the planted perturbations."""
    from streamforge_data_pipeline_spark.operators.similarity import (
        semantic_dedup_fixed_cells,
    )

    rng = np.random.default_rng(3)
    rows = []
    for i in range(12):
        v = rng.normal(size=16)
        v[i % 8] = 6.0  # dominant -> argmax cell = i % 8
        rows.append((i * 10, (v / np.linalg.norm(v)).tolist()))
    base = {vid: np.array(v) for vid, v in rows}
    for i in range(3):  # perturbed copies of bases 0..2
        for j in (1, 2):
            v = base[i * 10] + rng.normal(scale=1e-3, size=16)
            rows.append((i * 10 + j, (v / np.linalg.norm(v)).tolist()))

    tau = 0.98
    vecs = {vid: np.array(v) for vid, v in rows}
    cells = {vid: int(np.argmax(np.abs(v[:8]))) for vid, v in vecs.items()}
    # brute-force union-find over within-cell pairs
    parent = {vid: vid for vid in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(vecs)
    for a in ids:
        for b in ids:
            if a < b and cells[a] == cells[b]:
                cos = float(vecs[a] @ vecs[b] /
                            (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
                if cos >= tau:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    expected = {vid: find(vid) for vid in ids}

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup_fixed_cells(df, n_cells=8, tau=tau).collect()}
    assert {v: r["group_id"] for v, r in out.items()} == expected
    for v, r in out.items():
        assert r["keep"] == (r["group_id"] == v)
    # sanity: the planted groups actually collapsed (non-trivial test)
    assert sum(1 for r in out.values() if not r["keep"]) == 6


def test_cell_cap_refinement_matches_oracle(spark):
    """r7 VERDICT #2: the capped recursive cell refinement is itself
    differential-checked — with a cap small enough to TRIGGER splits
    at sf0.001, Spark's broadcast count + CASE refinement must
    hash-match the oracle's mirrored count + CASE. (The registry key's
    cap=500 never triggers at oracle SFs, so this pins the branch.)"""
    from streamforge_data_pipeline_spark.registry import _semdedup_cells_sql
    from streamforge_data_pipeline_spark.operators.similarity import (
        semantic_dedup_fixed_cells,
    )
    from streamforge_data_pipeline_spark.session import load
    from tests.conftest import SF_SMALL
    from tests.utils import compare, duckdb_connection

    vecs = load(spark, SF_SMALL, "embeddings")
    # sanity: the cap actually splits at this SF (some cell > 4 docs)
    from streamforge_data_pipeline_spark.operators.similarity import argmax_cell
    from pyspark.sql import functions as F
    top = (
        vecs.select(argmax_cell("embedding", 8).alias("c"))
        .groupBy("c").count().agg(F.max("count")).collect()[0][0]
    )
    assert top > 4, "fixture too small for the refinement to trigger"

    out = semantic_dedup_fixed_cells(vecs, n_cells=8, tau=0.4, cell_cap=4)
    con = duckdb_connection(SF_SMALL)
    try:
        ok, msg = compare(out, con, _semdedup_cells_sql(cap=4))
    finally:
        con.close()
    assert ok, msg


def test_cell_cap_no_trigger_is_identity(spark):
    """A cap no cell exceeds must leave the answer bit-identical to
    the uncapped quantizer (the refinement is a pure CASE fallthrough)."""
    from streamforge_data_pipeline_spark.operators.similarity import (
        semantic_dedup_fixed_cells,
    )
    from streamforge_data_pipeline_spark.session import load
    from tests.conftest import SF_SMALL

    vecs = load(spark, SF_SMALL, "embeddings")
    capped = semantic_dedup_fixed_cells(
        vecs, n_cells=8, tau=0.4, cell_cap=10**9
    ).collect()
    plain = semantic_dedup_fixed_cells(vecs, n_cells=8, tau=0.4).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, plain))


def test_cell_cap_second_level_splits_oversized_subcells(spark):
    """Vectors engineered to share BOTH argmax dims 1-8 and 9-16 but
    differ on 17-24: with a tiny cap the level-1 split alone cannot
    shrink the cell, so the level-2 split must engage — assignments
    land in >= 2 distinct level-2 cells, and the refinement is still
    oracle-mirrored (checked by construction against a NumPy replay
    of the two-level rule)."""
    import numpy as np
    from streamforge_data_pipeline_spark.operators.similarity import (
        semantic_dedup_fixed_cells,
    )

    rng = np.random.default_rng(5)
    rows = []
    for i in range(24):
        v = rng.normal(scale=0.05, size=32)
        v[0] = 5.0          # argmax dims 1-8  -> c1 = 0 for everyone
        v[8] = 4.0          # argmax dims 9-16 -> c2 = 0 for everyone
        v[16 + (i % 4)] = 3.0   # argmax dims 17-24 spreads c3 over 4 values
        rows.append((i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # replay the rule: n1(c1=0)=24 > 5 and n2(0,0)=24 > 5 -> level 2,
    # so pairs can only form WITHIN the 4 level-2 cells (same i%4
    # residue) — at tau=0.5 every same-residue pair qualifies (shared
    # dominant dims), so without the level-2 split all 24 would merge
    # into one group and the residue check below would fail.
    low = semantic_dedup_fixed_cells(df, n_cells=8, tau=0.5, cell_cap=5)
    groups = {}
    for r in low.collect():
        groups.setdefault(r["group_id"], []).append(r["vec_id"])
    for members in groups.values():
        assert len({m % 4 for m in members}) == 1, (
            "a dup group crossed level-2 cells — level-2 split not applied")
