"""Cross-operator consistency invariants over the dedup family: the
operators implement DIFFERENT candidate schemes and verifiers, but on
shared inputs their answers are mathematically related — relations the
per-key DuckDB oracles cannot see because each key is checked alone.

1. An EXACT duplicate pair is found by every near-dup family member
   (Jaccard 1.0, containment 1.0 both ways, Hamming 0, edit 0).
2. minhash_lsh_dedup's verified pairs are a SUBSET of exact
   near_dedup's at the same tau (LSH only prunes candidates; its
   verifier is the same exact Jaccard).
3. allpairs_jaccard (prefix-filtered) equals near_dedup (naive) —
   same math, different candidate scheme.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators import dedup, minhash


def _corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant one EXACT duplicate of the first doc under a fresh id
    first = docs.orderBy("doc_id").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(10_000_000, first["text"])], "doc_id long, text string"
    )
    return docs.select("doc_id", "text").unionByName(dup), first["doc_id"]


def test_exact_duplicate_found_by_every_family_member(spark):
    docs, orig = _corpus(spark)
    pair = (orig, 10_000_000)

    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash.shared_shingle_jaccard(docs, tau=0.5).collect()
    }
    assert jac.get(pair) == 1.0

    cont = {
        (r["doc_sub"], r["doc_sup"]): r["containment"]
        for r in minhash.containment_pairs(docs, tau=0.8).collect()
    }
    assert cont.get(pair) == 1.0 and cont.get(pair[::-1]) == 1.0

    sigs = dedup.simhash(docs, "text", "doc_id")
    ham = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(sigs).collect()
    }
    assert ham.get(pair) == 0

    fz = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in minhash.fuzzy_dedup(docs).collect()
    }
    assert fz.get(pair) == 0

    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash.minhash_lsh_dedup(docs, tau=0.5).collect()
    }
    # identical signatures agree on every band — LSH can't miss it
    assert lsh.get(pair) == 1.0


def test_lsh_verified_pairs_subset_of_exact(spark):
    docs, _ = _corpus(spark)
    exact = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash.shared_shingle_jaccard(docs, tau=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash.minhash_lsh_dedup(docs, tau=0.5).collect()
    }
    assert lsh <= exact
    assert lsh, "LSH should find at least the planted duplicate"


def test_prefix_filtered_equals_naive_exact_jaccard(spark):
    docs, _ = _corpus(spark)
    naive = {
        tuple(r) for r in minhash.shared_shingle_jaccard(docs, tau=0.5).collect()
    }
    allpairs = {
        tuple(r) for r in minhash.allpairs_jaccard(docs, tau=0.5).collect()
    }
    assert naive == allpairs


def test_curation_funnel_monotone_and_consistent(spark):
    """Funnel rows decrease monotonically (each stage filters the
    previous), every stage retains something on the fixture corpus,
    and stage-4 respects the per-domain cap exactly."""
    from pyspark.sql import functions as F
    from streamforge_data_pipeline_spark.plans.curation import curation_funnel
    from streamforge_data_pipeline_spark.registry import _with_urls
    from streamforge_data_pipeline_spark.session import load
    from tests.conftest import SF_MED

    docs = load(spark, SF_MED, "documents")
    rows = {r["stage"]: r for r in
            curation_funnel(docs, _with_urls(docs)).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    for i in range(1, 5):
        assert rows[i]["n_docs"] <= rows[i - 1]["n_docs"]
        assert rows[i]["n_tokens"] <= rows[i - 1]["n_tokens"]
    assert rows[4]["n_docs"] > 0
    assert rows[0]["n_docs"] == docs.count()


def test_decayed_counts_halving_semantics(spark):
    """Hand-checkable decay: events on the max day weigh 1, the day
    before 1/2, etc.; order/partitioning can't move the result (the
    integer-weight sum is exact)."""
    import datetime as dt
    from pyspark.sql import functions as F
    from streamforge_data_pipeline_spark.operators.aggregates import (
        decayed_counts,
    )

    base = dt.datetime(2024, 3, 10, 12, 0, 0)
    rows = []
    for age, n in [(0, 4), (1, 2), (2, 1)]:  # 4*1 + 2*.5 + 1*.25 = 5.25
        for i in range(n):
            rows.append((f"e{age}{i}", "click", base - dt.timedelta(days=age)))
    rows.append(("old", "click", base - dt.timedelta(days=100)))  # 0 weight
    df = spark.createDataFrame(rows, "event_id string, event_type string, ts timestamp")
    out = decayed_counts(df).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 8
    assert out[0]["decayed_count"] == 5.25
    # repartitioned input: identical result (exact integer sum)
    out2 = decayed_counts(df.repartition(7)).collect()
    assert out2[0]["decayed_count"] == 5.25


def test_source_mixture_weights_upsample_the_tail(spark):
    """A small source's tempered share exceeds its natural share
    (upsample_factor > 1) and a dominant source's is compressed; the
    tempered shares still sum to ~1."""
    from streamforge_data_pipeline_spark.operators.text import (
        source_mixture_weights,
    )

    rows = [(i, "w " * 100, "big") for i in range(90)]
    rows += [(1000 + i, "w " * 100, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in source_mixture_weights(df).collect()}
    assert out["small"]["upsample_factor"] > 1.0
    assert out["big"]["upsample_factor"] < 1.0
    assert abs(out["big"]["tempered_share"] + out["small"]["tempered_share"] - 1.0) < 1e-3
