"""Tests for the r5 search/calibration operators:

1. bm25_topk: scores match a pure-Python BM25 on a handcrafted corpus,
   and the two-phase shard top-k equals the single-window form;
2. quality_threshold_prune: per-source value cut invariants against
   brute-force recomputation (keeps >= ceil(keep_top*n), cut is clean:
   every kept quality >= threshold > every dropped quality);
3. source_overlap: exact pairwise shingle Jaccard vs Python sets.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.search import (
    B,
    K1,
    bm25_topk,
)
from streamforge_data_pipeline_spark.operators.text import (
    quality_threshold_prune,
    source_overlap,
)

DOCS = [
    (0, "spark hash join hash join table", "s0"),
    (1, "table scan fast scan scan", "s0"),
    (2, "sort merge batch window sort", "s1"),
    (3, "spark table window", "s1"),
    (4, "the quick brown fox", "s1"),
    (5, "", "s2"),
    (6, "hash hash hash hash", "s2"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    ).cache()


def _toks(t):
    import re

    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _bm25_python(queries, k=5):
    toks = {d: _toks(t) for d, t, _ in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, qs in queries:
        scores = {}
        for term in sorted(set(qs.split())):
            df = sum(1 for v in toks.values() if term in v)
            if df == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for d, v in toks.items():
                tf = v.count(term)
                if tf:
                    dl = len(v)
                    scores[d] = scores.get(d, 0.0) + idf * (
                        tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * dl / avgdl))
                    )
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))
        out[qid] = [(r + 1, d, round(s, 4)) for r, (d, s) in enumerate(ranked[:k])]
    return out


def test_bm25_matches_python(spark, docs):
    queries = ((1, "spark hash join"), (2, "table scan fast"), (3, "fox window"))
    got = {}
    for r in bm25_topk(docs, queries=queries, k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    want = _bm25_python(queries)
    for qid in want:
        got_q = sorted(got.get(qid, []))
        assert len(got_q) == len(want[qid]), (qid, got_q, want[qid])
        for (gr, gd, gs), (wr, wd, ws) in zip(got_q, want[qid]):
            assert (gr, gd) == (wr, wd)
            assert gs == pytest.approx(ws, abs=2e-4)


def test_bm25_topk_prefix_stable_across_k(spark, sf001_docs):
    """top-5 must be the exact prefix of top-7 (the deterministic
    (rounded score, doc_id) total order the WindowGroupLimit prunes
    under cannot depend on k)."""
    five = {(r["query_id"], r["rank"]): r["doc_id"]
            for r in bm25_topk(sf001_docs, k=5).collect()}
    seven = {(r["query_id"], r["rank"]): r["doc_id"]
             for r in bm25_topk(sf001_docs, k=7).collect()}
    assert five == {kr: d for kr, d in seven.items() if kr[1] <= 5}


@pytest.fixture(scope="module")
def sf001_docs(spark):
    from streamforge_data_pipeline_spark.session import load

    return load(spark, "/root/testdata/sf0.001", "documents")


def test_quality_threshold_prune_invariants(spark, docs):
    from streamforge_data_pipeline_spark.operators.text import quality_expr

    scored = {
        r["doc_id"]: (r["source"], r["q"])
        for r in docs.select(
            "doc_id", "source", F.round(quality_expr("text"), 4).alias("q")
        ).collect()
    }
    kept = {
        r["doc_id"]: (r["source"], r["quality"], r["threshold"])
        for r in quality_threshold_prune(docs, keep_top=0.5).collect()
    }
    by_source: dict[str, list[float]] = {}
    for d, (s, q) in scored.items():
        by_source.setdefault(s, []).append(q)
    for s, qs in by_source.items():
        n = len(qs)
        need = math.ceil(0.5 * n)
        kept_here = [d for d in kept if kept[d][0] == s]
        # at least the target fraction survives
        assert len(kept_here) >= need, (s, kept_here)
        thr = kept[kept_here[0]][2]
        # the cut is value-clean: kept iff quality >= threshold
        for d, (ds, q) in scored.items():
            if ds != s:
                continue
            assert (d in kept) == (q >= thr), (d, q, thr)
        # threshold is the HIGHEST value keeping >= need docs
        assert sum(1 for q in qs if q >= thr) >= need
        higher = sorted({q for q in qs if q > thr})
        if higher:
            assert sum(1 for q in qs if q >= higher[0]) < need


def test_source_overlap_matches_python(spark, docs):
    got = {
        (r["source_a"], r["source_b"]): (
            r["inter"],
            r["n_a"],
            r["n_b"],
            r["jaccard"],
        )
        for r in source_overlap(docs).collect()
    }
    sets: dict[str, set] = {}
    for _, t, s in DOCS:
        tk = _toks(t)
        sets.setdefault(s, set()).update(
            tuple(tk[i : i + 3]) for i in range(max(len(tk) - 2, 0))
        )
    srcs = sorted(sets)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                want[(a, b)] = (
                    inter,
                    len(sets[a]),
                    len(sets[b]),
                    round(inter / len(sets[a] | sets[b]), 4),
                )
    assert set(got) == set(want)
    for k, (wi, wa, wb, wj) in want.items():
        gi, ga, gb, gj = got[k]
        assert (gi, ga, gb) == (wi, wa, wb)
        assert gj == pytest.approx(wj, abs=2e-4)
