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


def test_pii_scrub_multi_redacts_all_entity_classes(spark):
    """doc_id 30 hits all three injection residues (30%3==0, id%4==2 no,
    pick ids to cover combos): entities are counted and the digest is
    of fully scrubbed text — no raw email/IP/phone survives."""
    from pyspark.sql import functions as F
    from streamforge_data_pipeline_spark.operators.text import (
        EMAIL_RE, IPV4_RE, PHONE_RE, pii_scrub_multi,
    )

    # ids chosen to cover 0..3 entity classes:
    #  60 -> %3=0,%4=0,%5=0: email only
    #  57 -> %3=0,%4=1,%5=2: email + ip + phone
    #  13 -> %3=1,%4=1,%5=3: ip only
    #  22 -> %3=1,%4=2,%5=2: phone only
    #  11 -> none
    ids = [60, 57, 13, 22, 11]
    df = spark.createDataFrame([(i, "plain words") for i in ids],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub_multi(df).collect()}
    assert (out[60]["n_emails"], out[60]["n_ips"], out[60]["n_phones"]) == (1, 0, 0)
    assert (out[57]["n_emails"], out[57]["n_ips"], out[57]["n_phones"]) == (1, 1, 1)
    assert (out[13]["n_emails"], out[13]["n_ips"], out[13]["n_phones"]) == (0, 1, 0)
    assert (out[22]["n_emails"], out[22]["n_ips"], out[22]["n_phones"]) == (0, 0, 1)
    assert (out[11]["n_emails"], out[11]["n_ips"], out[11]["n_phones"]) == (0, 0, 0)
    # the digest is of text with NO surviving entity (rebuild the scrub
    # chain and assert the scrubbed string is entity-free)
    with_pii = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" mail user"), F.col("doc_id").cast("string"),
                        F.lit("@test.org"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit(" ip 10."), (F.col("doc_id") % 256).cast("string"),
                        F.lit(".0.9"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 2,
               F.concat(F.lit(" call +1 555-"),
                        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
               ).otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(with_pii, EMAIL_RE, "<EMAIL>"),
                         IPV4_RE, "<IP>"), PHONE_RE, "<PHONE>")
    rows = df.select("doc_id", scrubbed.alias("s")).collect()
    for r in rows:
        assert "@" not in r["s"] or "<EMAIL>" in r["s"]
        assert "10." not in r["s"]
        assert "555-" not in r["s"]
