"""r9 VERDICT #4: the candidate-stage profile (`_stage_profile`) is
memoized per (normalized plan, input files) within a session so repeat
containment/fuzzy calls over an unchanged table pay the two profiling
jobs once. The cache must also refuse to cache what it cannot
fingerprint safely — in-memory relations print identically for
different content, and a stale profile would change the auto-cap
decision (rows, not time)."""

from __future__ import annotations

import pyspark.sql.functions as F

from streamforge_data_pipeline_spark.operators import minhash
from streamforge_data_pipeline_spark.operators.minhash import (
    _PROFILE_CACHE,
    _profile_fingerprint,
    _stage_profile,
    containment_pairs,
    shingles,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_one_profile_pass_per_table(spark):
    """Two containment calls over the same parquet-backed table cost
    exactly ONE profile computation (the second is a cache hit); the
    returned decisions are identical."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sh = shingles(docs)
    _PROFILE_CACHE.clear()
    before = _stage_profile.computes
    p1 = _stage_profile(sh)
    mid = _stage_profile.computes
    p2 = _stage_profile(shingles(docs))  # rebuilt plan, same content
    after = _stage_profile.computes
    assert mid == before + 1
    assert after == mid, "second call must hit the cache"
    assert p1 == p2


def test_containment_call_pair_profiles_once(spark):
    """End-to-end: back-to-back containment_pairs calls on the same
    table compute the profile once per distinct relation (full +
    capped when the cap engages; on this corpus the cap stays off, so
    exactly one compute total across both calls)."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    _PROFILE_CACHE.clear()
    before = _stage_profile.computes
    containment_pairs(docs).count()
    mid = _stage_profile.computes
    containment_pairs(docs).count()
    after = _stage_profile.computes
    assert mid > before
    assert after == mid, "repeat call must not re-profile"


def test_in_memory_relations_are_never_cached(spark):
    """Two DIFFERENT local corpora share a plan string (LocalRelation
    prints schema, not content): the fingerprint must refuse them, the
    profiles must each be computed, and they must differ — the stale
    cache here would flip the auto-cap rule."""
    a = spark.createDataFrame(
        [(i, "x y z common common2 common3") for i in range(40)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(i, f"u{i} v{i} w{i} q{i} r{i} s{i}") for i in range(40)],
        "doc_id long, text string",
    )
    sha, shb = shingles(a), shingles(b)
    assert _profile_fingerprint(sha) is None
    assert _profile_fingerprint(shb) is None
    _PROFILE_CACHE.clear()
    before = _stage_profile.computes
    pa = _stage_profile(sha)
    pb = _stage_profile(shb)
    assert _stage_profile.computes == before + 2
    assert len(_PROFILE_CACHE) == 0
    assert pa["mx"] == 40 and pb["mx"] == 1  # distinct, correct profiles


def test_cache_invalidates_on_new_files(spark, tmp_path):
    """Appending to the table path changes the input-file list, so the
    profile is recomputed — journals and growing tables never see a
    stale profile."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    p = str(tmp_path / "docs")
    docs.write.parquet(p)
    _PROFILE_CACHE.clear()
    t1 = spark.read.parquet(p)
    prof1 = _stage_profile(shingles(t1))
    n1 = _stage_profile.computes
    # append MORE data at the same path
    docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).write.mode(
        "append"
    ).parquet(p)
    t2 = spark.read.parquet(p)
    prof2 = _stage_profile(shingles(t2))
    assert _stage_profile.computes == n1 + 1, "new files must recompute"
    assert prof2["docs"] == 2 * prof1["docs"]
