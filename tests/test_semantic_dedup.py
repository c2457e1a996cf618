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
