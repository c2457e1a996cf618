"""Incremental LSH probe dedup semantics: exact-duplicate and
near-duplicate incoming docs match their indexed twin; novel docs and
short (shingle-less) docs come back with a NULL dup_of."""

from __future__ import annotations

from streamforge_data_pipeline_spark.operators.minhash import lsh_probe_dedup

BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_matches_and_novelty(spark):
    index = _df(
        spark,
        [
            (1, BASE),
            (2, "completely different indexed content about spark catalyst plans"),
        ],
    )
    incoming = _df(
        spark,
        [
            (10, BASE),  # exact dup of 1
            (11, BASE + " extra"),  # near dup of 1
            (12, "nothing like anything stored here at all in any way shape"),
            (13, "too short"),  # < 3 tokens -> no shingles at all
        ],
    )
    out = {r["doc_id"]: r for r in lsh_probe_dedup(incoming, index).collect()}
    assert set(out) == {10, 11, 12, 13}
    assert out[10]["dup_of"] == 1 and out[10]["jaccard"] == 1.0
    assert out[11]["dup_of"] == 1 and 0.5 <= out[11]["jaccard"] < 1.0
    assert out[12]["dup_of"] is None and out[12]["jaccard"] is None
    assert out[13]["dup_of"] is None


def test_probe_prefers_best_match(spark):
    # two indexed docs both near the incoming one; the higher-jaccard
    # (exact) twin must win
    index = _df(spark, [(1, BASE + " tail one two three"), (2, BASE)])
    incoming = _df(spark, [(10, BASE)])
    row = lsh_probe_dedup(incoming, index).collect()[0]
    assert row["dup_of"] == 2 and row["jaccard"] == 1.0
