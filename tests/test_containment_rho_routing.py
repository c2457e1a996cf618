"""The containment family's size-ratio routing, pinned on planted
excerpt/superset pairs (r10): the flat containment_dedup_lsh banding
holds full recall inside its stated rho <= 2 scope and decays along
its own stated curve beyond it, while winnow_overlap's passage
fingerprints (score = shared / min(|fp|)) are rho-INVARIANT — the
measured routing: lsh twin for near-size containment, winnowing for
extreme excerpt asymmetry (scripts/recall_containment_rho.py reports
the full table; at J = 1/rho the 32x2 curve predicts 1.0 / .975 /
.595 / .199 at rho 1.5 / 3 / 6 / 12 — measured 1.0 / .925 / .525 /
.175 at sf-probe scale)."""

from __future__ import annotations

import pytest

from scripts.recall_containment_rho import RHOS, build_rows
from streamforge_data_pipeline_spark.operators.minhash import (
    containment_lsh_pairs,
    containment_pairs,
    winnow_overlap,
)


@pytest.fixture(scope="module")
def planted(spark):
    rows, pl = build_rows(n_base=60, per_bucket=15)
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    return df, pl


def _bucket_recall(got, planted_pairs, rho):
    bucket = {p for p, r in planted_pairs.items() if r == rho}
    return len(bucket & got) / len(bucket)


def test_exact_is_truth_at_every_rho(spark, planted):
    df, pl = planted
    got = {
        (r["doc_sub"], r["doc_sup"])
        for r in containment_pairs(df, tau=0.8).collect()
    }
    for rho in RHOS:
        assert _bucket_recall(got, pl, rho) == 1.0


def test_lsh_twin_full_recall_inside_stated_scope(spark, planted):
    df, pl = planted
    got = {
        (r["doc_sub"], r["doc_sup"])
        for r in containment_lsh_pairs(df, tau=0.8).collect()
    }
    assert _bucket_recall(got, pl, 1.5) == 1.0
    # beyond the stated rho ~ 2 scope the banding decays along its own
    # curve — pin that the decay is REAL (the docstring's honesty):
    # rho=12 sits where P = 1-(1-1/144)^32 ~ 0.20
    assert _bucket_recall(got, pl, 12.0) < 0.6


def test_winnow_is_rho_invariant(spark, planted):
    df, pl = planted
    out = winnow_overlap(df, min_shared=2).collect()
    und = {(r["doc_a"], r["doc_b"]) for r in out} | {
        (r["doc_b"], r["doc_a"]) for r in out
    }
    for rho in RHOS:
        assert _bucket_recall(und, pl, rho) == 1.0, rho
