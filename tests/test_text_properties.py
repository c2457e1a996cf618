"""Property-based tests for the r3 corpus operators — invariants
checked against brute-force Python recomputation on random corpora:

1. inverted_index: n_docs equals the true document frequency, postings
   are the first `cap` doc ids of the sorted true posting list, and no
   postings string ever exceeds the cap;
2. corpus_mixture: the selected set is exactly the greedy salted-hash
   prefix per source, never exceeding the budget.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from streamforge_data_pipeline_spark.operators.text import corpus_mixture, inverted_index

WORDS = ["the", "cat", "dog", "runs", "fast", "blue", "x9", "qq"]

corpus = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=12,
)


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus, cap=st.integers(min_value=1, max_value=4))
def test_inverted_index_matches_bruteforce(spark, texts, cap):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["term"]: (r["n_docs"], r["postings"])
        for r in inverted_index(df, min_df=1, max_postings=cap).collect()
    }
    truth: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        for term in set(_toks(t)):
            truth.setdefault(term, []).append(i)
    assert set(got) == set(truth)
    for term, docs in truth.items():
        n, postings = got[term]
        assert n == len(docs)
        assert postings == ",".join(str(d) for d in sorted(docs)[:cap])
        assert postings.count(",") + 1 <= cap


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=corpus,
    budget=st.integers(min_value=0, max_value=30),
)
def test_corpus_mixture_matches_greedy_prefix(spark, texts, budget):
    rows = [(i, t, f"s{i % 2}") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    budgets = {"s0": budget, "s1": budget}
    got = {r["doc_id"]: r for r in corpus_mixture(df, budgets).collect()}

    for src in ("s0", "s1"):
        members = [(i, _toks(t)) for i, t, s in rows if s == src]
        ordered = sorted(members, key=lambda m: (_hash60(f"{m[0]}:mix1"), m[0]))
        cum, expect = 0, {}
        for i, tk in ordered:
            cum += len(tk)
            if cum > budget:
                break
            expect[i] = (len(tk), cum)
        assert {i for i in got if got[i]["source"] == src} == set(expect)
        for i, (n, c) in expect.items():
            assert (got[i]["n_tokens"], got[i]["cum_tokens"]) == (n, c)


# --------------------------------------------------- simhash band blocking

sig32 = st.integers(min_value=0, max_value=(1 << 32) - 1)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sigs=st.lists(sig32, min_size=2, max_size=10, unique=True),
    flip_sets=st.data(),
)
def test_simhash_band_blocking_matches_bruteforce(spark, sigs, flip_sets):
    """Pigeonhole completeness as a PROPERTY: on random 32-bit
    fingerprints (plus adversarial <=3-bit flips of the first one) the
    band-blocked pairs equal the all-pairs Hamming truth."""
    from streamforge_data_pipeline_spark.operators.dedup import simhash_near_pairs

    # adversarially append a <=3-bit flip of sigs[0] so true pairs exist
    bits = flip_sets.draw(
        st.lists(st.integers(min_value=0, max_value=31), min_size=1,
                 max_size=3, unique=True)
    )
    flipped = sigs[0]
    for b in bits:
        flipped ^= 1 << b
    rows = list(enumerate(sigs + ([flipped] if flipped not in sigs else [])))
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(df, "doc_id", max_hamming=3).collect()
    }
    truth = set()
    for i, a in rows:
        for j, b in rows:
            if i < j and bin(a ^ b).count("1") <= 3:
                truth.add((i, j, bin(a ^ b).count("1")))
    assert got == truth
    assert truth  # the planted flip guarantees at least one true pair
