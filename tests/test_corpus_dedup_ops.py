"""Semantics tests for the r4 corpus-hygiene operators: C4-style
line_dedup, cross-corpus dup_ngram_fraction, and the corpus-trained
bigram LM scorer — each brute-force cross-checked against a plain
Python recomputation (house pattern: the DuckDB differential in
test_oracle_differential.py covers them on the real corpus; these
pin the SEMANTICS on constructed corpora where the answer is legible).
"""

from __future__ import annotations

import math

import pytest

from streamforge_data_pipeline_spark.operators.text import (
    dup_ngram_fraction,
    line_dedup,
    ngram_lm_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- line_dedup


def test_line_dedup_keeps_first_occurrence_only(spark):
    df = _docs(
        spark,
        [
            (1, "unique alpha\nCOMMON FOOTER\nunique beta"),
            (2, "unique gamma\nCOMMON FOOTER"),
            (3, "COMMON FOOTER\nunique delta"),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(df, min_chars=0).collect()}
    # doc 1 holds the first occurrence (lowest doc_id) — keeps all lines
    assert out[1]["text_clean"] == "unique alpha\nCOMMON FOOTER\nunique beta"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    # later docs lose the duplicated line but keep their unique ones
    assert out[2]["text_clean"] == "unique gamma"
    assert out[2]["n_kept"] == 1
    assert out[3]["text_clean"] == "unique delta"
    assert out[3]["n_kept"] == 1


def test_line_dedup_all_lines_removed_doc_survives_empty(spark):
    df = _docs(spark, [(1, "only line"), (2, "only line")])
    out = {r["doc_id"]: r for r in line_dedup(df, min_chars=0).collect()}
    assert out[1]["text_clean"] == "only line"
    assert out[2]["text_clean"] == "" and out[2]["n_kept"] == 0
    assert out[2]["n_lines"] == 1


def test_line_dedup_within_doc_repeat_also_deduped(spark):
    # C4 semantics are corpus-wide: a line repeated WITHIN one doc is
    # still one surviving occurrence (the first by line_no).
    df = _docs(spark, [(7, "x\ny\nx\nz\nx")])
    (row,) = line_dedup(df, min_chars=0).collect()
    assert row["text_clean"] == "x\ny\nz"
    assert row["n_lines"] == 5 and row["n_kept"] == 3


def test_line_dedup_preserves_line_order(spark):
    df = _docs(spark, [(1, "c\na\nb"), (2, "q\na\nr")])
    out = {r["doc_id"]: r["text_clean"] for r in line_dedup(df, min_chars=0).collect()}
    assert out[1] == "c\na\nb"  # original order, not sorted
    assert out[2] == "q\nr"


def test_line_dedup_short_lines_exempt_by_default(spark):
    # Paragraph breaks (empty lines) and sub-min_chars lines survive in
    # EVERY doc under the default policy — only long boilerplate dedups.
    long_a = "this line is certainly longer than fifteen characters"
    df = _docs(
        spark,
        [
            (1, f"short one\n\n{long_a}\ntail of document one here"),
            (2, f"short one\n\n{long_a}\ntail of document two here"),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # doc 1: everything survives (first occurrences + exempt shorts)
    assert out[1]["text_clean"] == (
        f"short one\n\n{long_a}\ntail of document one here"
    )
    # doc 2: loses only the long duplicated line; keeps the duplicated
    # short line AND the empty paragraph break
    assert out[2]["text_clean"] == "short one\n\ntail of document two here"
    assert out[2]["n_lines"] == 4 and out[2]["n_kept"] == 3


def test_line_dedup_min_chars_boundary(spark):
    # exactly min_chars long -> dedupable; one char shorter -> exempt
    line15 = "x" * 15
    line14 = "y" * 14
    df = _docs(spark, [(1, f"{line15}\n{line14}"), (2, f"{line15}\n{line14}")])
    out = {r["doc_id"]: r["text_clean"] for r in line_dedup(df).collect()}
    assert out[1] == f"{line15}\n{line14}"
    assert out[2] == line14


def test_line_dedup_hot_key_runtime_flat_vs_skewless(spark):
    """Planted boilerplate skew: every doc shares the same hot footer
    lines (30% of its lines). Under the old raw-line window all hot
    occurrences landed in ONE task; the aggregation shape must keep
    runtime in the same band as a fully skewless corpus of identical
    size (generous 3x bound — same data volume, same line count)."""
    import time

    n_docs, lines_per_doc = 2000, 10
    hot = [f"hot boilerplate footer line number {i} shared everywhere"
           for i in range(3)]

    def corpus(skewed: bool):
        rows = []
        for d in range(n_docs):
            ls = [f"doc {d} unique content line {j} with enough length"
                  for j in range(lines_per_doc - (3 if skewed else 0))]
            if skewed:
                ls += hot
            rows.append((d, "\n".join(ls)))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def run(df):
        t0 = time.monotonic()
        df_out = line_dedup(df)
        n = df_out.count()
        return time.monotonic() - t0, n

    # warm both paths once to exclude plan-compilation noise
    run(corpus(True)), run(corpus(False))
    t_skew, n_skew = run(corpus(True))
    t_flat, n_flat = run(corpus(False))
    assert n_skew == n_flat == n_docs
    assert t_skew < max(3 * t_flat, t_flat + 2.0), (t_skew, t_flat)


# ------------------------------------------------------- dup_ngram_fraction


def _trigram_occurrences(text):
    toks = [t for t in text.lower().split() if t]
    return [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]


def test_dup_ngram_fraction_brute_force(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b c x y"),  # shares 'a b c' with doc 1
        (3, "p q r s t"),  # fully unique
        (4, "a b c d e"),  # exact dup of doc 1 — all grams duplicated
    ]
    counts: dict[str, int] = {}
    per_doc: dict[int, list[str]] = {}
    for doc_id, text in rows:
        grams = _trigram_occurrences(text)
        per_doc[doc_id] = grams
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
    expected = {}
    for doc_id, grams in per_doc.items():
        dup = sum(1 for g in grams if counts[g] >= 2)
        expected[doc_id] = (len(grams), dup, round(dup / len(grams), 4))

    out = {r["doc_id"]: r for r in dup_ngram_fraction(_docs(spark, rows)).collect()}
    assert set(out) == set(expected)
    for doc_id, (n, d, frac) in expected.items():
        r = out[doc_id]
        assert (r["n_ngrams"], r["n_dup"]) == (n, d)
        assert r["dup_frac"] == pytest.approx(frac, abs=1e-9)
    # spot-check the legible facts
    assert out[3]["n_dup"] == 0
    assert out[4]["dup_frac"] == 1.0


# ----------------------------------------------------------- ngram_lm_score


def test_ngram_lm_score_brute_force(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "dogs bark loudly at night"),
    ]
    k = 0.5
    bigrams_by_doc: dict[int, list[tuple[str, str]]] = {}
    c12: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab: set[str] = set()
    for doc_id, text in rows:
        toks = text.lower().split()
        vocab.update(toks)
        bgs = list(zip(toks, toks[1:]))
        bigrams_by_doc[doc_id] = bgs
        for w1, w2 in bgs:
            c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
    v = len(vocab)
    expected = {}
    for doc_id, bgs in bigrams_by_doc.items():
        nll = -sum(
            math.log((c12[bg] + k) / (c1[bg[0]] + k * v)) for bg in bgs
        ) / len(bgs)
        expected[doc_id] = (len(bgs), math.floor(nll * 1e4 + 0.5) / 1e4)

    out = {r["doc_id"]: r for r in ngram_lm_score(_docs(spark, rows)).collect()}
    assert set(out) == set(expected)
    for doc_id, (n, nll) in expected.items():
        assert out[doc_id]["n_bigrams"] == n
        assert out[doc_id]["nll"] == pytest.approx(nll, abs=1e-9)


def test_ngram_lm_score_repeated_doc_scores_lower(spark):
    # A doc whose bigrams the corpus has seen many times scores lower
    # (more likely) than a doc of one-off bigrams — the property the
    # perplexity prune relies on.
    rows = [(i, "spark shuffles data fast") for i in range(1, 6)] + [
        (99, "zebra quantum violin umbrella")
    ]
    out = {r["doc_id"]: r["nll"] for r in ngram_lm_score(_docs(spark, rows)).collect()}
    assert out[1] < out[99]
    # identical docs score identically
    assert out[1] == out[5]


def test_ngram_lm_score_excludes_sub_bigram_docs(spark):
    rows = [(1, "solo"), (2, "two tokens here")]
    out = {r["doc_id"] for r in ngram_lm_score(_docs(spark, rows)).collect()}
    assert out == {2}


# -------------------------------------------------- canonical_selection


def test_canonical_selection_longest_wins(spark):
    from streamforge_data_pipeline_spark.operators.dedup import canonical_selection

    docs = spark.createDataFrame(
        [
            (1, 40),   # cluster A, shorter
            (2, 90),   # cluster A, longest -> canonical
            (3, 90),   # cluster A, same length, higher id -> loses tie
            (4, 10),   # unclustered
            (5, 70),   # cluster B, shorter
            (6, 80),   # cluster B, longest -> canonical
        ],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r for r in canonical_selection(docs, pairs).collect()}
    assert out[2]["canonical_id"] == 2 and out[2]["kept"]
    assert out[1]["canonical_id"] == 2 and not out[1]["kept"]
    assert out[3]["canonical_id"] == 2 and not out[3]["kept"]  # tie -> lower id
    assert out[4]["canonical_id"] == 4 and out[4]["kept"]      # self-canonical
    assert out[6]["canonical_id"] == 6 and out[6]["kept"]      # 80 > 70
    assert out[5]["canonical_id"] == 6 and not out[5]["kept"]
    # exactly one kept doc per cluster + all unclustered
    assert sum(1 for r in out.values() if r["kept"]) == 3


def test_canonical_selection_transitive_cluster(spark):
    """A chain a-b, b-c resolves all three to ONE canonical even though
    a and c never paired directly (connected components, not pairs)."""
    from streamforge_data_pipeline_spark.operators.dedup import canonical_selection

    docs = spark.createDataFrame(
        [(10, 5), (11, 9), (12, 7)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame([(10, 11), (11, 12)], "doc_a long, doc_b long")
    out = {r["doc_id"]: r["canonical_id"] for r in canonical_selection(docs, pairs).collect()}
    assert out == {10: 11, 11: 11, 12: 11}


# ------------------------------------------------------ vocab_coverage


def test_vocab_coverage_brute_force(spark):
    from streamforge_data_pipeline_spark.operators.text import vocab_coverage

    rows = [(1, "a a a b b c"), (2, "a b d"), (3, "a c c e")]
    counts: dict[str, int] = {}
    for _, t in rows:
        for tok in t.split():
            counts[tok] = counts.get(tok, 0) + 1
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    out = vocab_coverage(_docs(spark, rows), k=3).collect()
    assert [r["term"] for r in out] == [t for t, _ in ranked[:3]]
    cum = 0
    for r, (t, n) in zip(out, ranked):
        cum += n
        assert r["n"] == n
        assert r["cum_frac"] == pytest.approx(round(cum / total, 4), abs=1e-9)
    assert out[0]["rank"] == 1 and out[-1]["rank"] == 3


# ------------------------------------------------------ ngram_novelty


def test_ngram_novelty_first_carrier_vs_copy(spark):
    from streamforge_data_pipeline_spark.operators.text import ngram_novelty

    orig = "n1 n2 n3 n4 n5 n6 n7 n8"
    df = _docs(
        spark,
        [
            (1, orig),                    # first carrier: all novel
            (2, orig),                    # verbatim copy: nothing novel
            (3, "m1 m2 m3 " + orig),      # partial copy: mixed
        ],
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0
    assert out[2]["n_ngrams"] == out[1]["n_ngrams"] == 6
    # doc 3's novel grams are those touching the m-prefix: m1m2m3,
    # m2m3n1, m3n1n2 -> 3 of 9
    assert out[3]["n_novel"] == 3
    assert out[3]["n_ngrams"] == 9


# -------------------------------------------------- tfidf_cosine_pairs


def test_tfidf_cosine_finds_bag_of_words_rearrangement(spark):
    from streamforge_data_pipeline_spark.operators.minhash import (
        exact_jaccard_pairs,
    )
    from streamforge_data_pipeline_spark.operators.text import tfidf_cosine_pairs

    import random

    rng = random.Random(9)
    filler = [f"f{i}" for i in range(40)]
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    shuffled = words[::-1]
    rows = [(1, " ".join(words)), (2, " ".join(shuffled))] + [
        (d, " ".join(rng.choice(filler) for _ in range(25))) for d in range(3, 23)
    ]
    df = _docs(spark, rows)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, tau=0.9).collect()
    }
    # identical bags in reversed order: cosine exactly 1
    assert pairs.get((1, 2)) == 1.0
    # ...which 3-gram Jaccard cannot see (no shared trigram at all)
    jac = exact_jaccard_pairs(df, tau=0.1, scheme="naive").collect()
    assert not [r for r in jac if {r["doc_a"], r["doc_b"]} == {1, 2}]


def test_tfidf_cosine_matches_numpy_bruteforce(spark):
    import math as m
    import random
    from collections import Counter

    from streamforge_data_pipeline_spark.operators.text import tfidf_cosine_pairs

    rng = random.Random(31)
    vocab = [f"v{i}" for i in range(15)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30))))
        for d in range(30)
    ]
    tau = 0.8
    tfs = {d: Counter(t.split()) for d, t in rows}
    df_ct = Counter()
    for c in tfs.values():
        df_ct.update(c.keys())
    n = len(rows)
    w = {
        d: {
            t: round(c[t] * m.log(n * 1.0 / df_ct[t]), 6)
            for t in c
            if df_ct[t] < n
        }
        for d, c in tfs.items()
    }
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            dot = sum(w[a][t] * w[b][t] for t in w[a].keys() & w[b].keys())
            na = m.sqrt(sum(x * x for x in w[a].values()))
            nb = m.sqrt(sum(x * x for x in w[b].values()))
            if na and nb and dot / (na * nb) >= tau - 1e-9:
                want[(a, b)] = dot / (na * nb)
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(_docs(spark, rows), tau=tau).collect()
    }
    assert got.keys() == want.keys()
    assert all(abs(got[p] - want[p]) < 1e-3 for p in got)  # decimal vs float sums


def test_tfidf_dense_and_sparse_schemes_identical(spark):
    """The dense small-vocab scheme (numpy candidates + decimal
    rerank) must return byte-identical pairs AND cosines to the
    sparse term-join scheme — on a saturated corpus (its target
    regime) and on a rare-term corpus (the sparse regime)."""
    import random

    from streamforge_data_pipeline_spark.operators.text import tfidf_cosine_pairs

    rng = random.Random(41)
    saturated = [
        (d, " ".join(rng.choice([f"s{i}" for i in range(12)]) for _ in range(20)))
        for d in range(40)
    ]
    zipfish = [
        (d, " ".join(
            rng.choice([f"r{i}" for i in range(200)]) for _ in range(20)
        ) + f" doc{d}unique")
        for d in range(40)
    ]
    # plant a guaranteed high-cosine pair in the rare-term corpus
    zipfish[38] = (38, "q1 q2 q3 q4 q5 q6 q7 q8")
    zipfish[39] = (39, "q8 q7 q6 q5 q4 q3 q2 q1 r0")
    for rows in (saturated, zipfish):
        df = _docs(spark, rows)
        sp = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(df, tau=0.5, scheme="sparse").collect()
        }
        de = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(df, tau=0.5, scheme="dense").collect()
        }
        assert sp == de and sp  # identical and non-trivial


def test_simhash_near_pairs_matches_bruteforce(spark):
    """Band-blocked Hamming pairs == the O(n^2) cross-join answer on
    the sf0.001 documents corpus (the pigeonhole completeness claim,
    checked against an implementation with no blocking at all)."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.dedup import (
        hamming64,
        simhash,
        simhash_near_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = simhash(docs, "text", "doc_id").localCheckpoint(eager=True)

    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(sigs, "doc_id", max_hamming=3).collect()
    }
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a")
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b")
    )
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", hamming64(F.col("sig_a"), F.col("sig_b")).alias("hamming")
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute
    assert brute, "corpus should contain at least one near pair"


def test_simhash_near_pairs_planted_three_bit_flip(spark):
    """A signature differing in EXACTLY the radius (3 bits, one per
    band boundary region) must be found — the worst pigeonhole case."""
    from streamforge_data_pipeline_spark.operators.dedup import simhash_near_pairs

    base = 0b1010_1100_0011_0101_1001_0110_1111_0000
    # flip one bit in each of three different bands (bits 1, 9, 17)
    other = base ^ (1 << 1) ^ (1 << 9) ^ (1 << 17)
    sigs = spark.createDataFrame(
        [(1, base), (2, other), (3, base ^ 0b1111_1111)],  # doc 3: 8 flips
        "doc_id long, simhash long",
    )
    rows = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(sigs, "doc_id", max_hamming=3).collect()
    }
    assert (1, 2, 3) in rows
    assert all(p[:2] != (1, 3) and p[:2] != (2, 3) for p in rows)


def test_simhash_near_pairs_rejects_radius_beyond_bands(spark):
    from streamforge_data_pipeline_spark.operators.dedup import simhash_near_pairs

    sigs = spark.createDataFrame([(1, 0)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs(sigs, "doc_id", max_hamming=4)


def test_fuzzy_dedup_catches_typo_corruption_jaccard_misses(spark):
    """The complementary-verifier claim: in-token character corruption
    breaks most 3-gram shingles (token Jaccard drops below any useful
    tau) while the character stream stays ~intact (rel_ed small)."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.minhash import (
        fuzzy_dedup,
        shared_shingle_jaccard,
    )

    base_tokens = [f"word{i:03d}" for i in range(60)]
    base = " ".join(base_tokens)
    # corrupt ONE character inside every sixth token: 10 of 60 tokens
    # change. Each corruption kills the 3 shingles that touch it
    # (Jaccard falls to 29/87 ~ 0.33, under the 0.5 tau) while the
    # char stream stays ~98% intact — and enough shingles survive for
    # the blocking join. (Corrupting every THIRD token would kill ALL
    # shingles: the docstring's stated blocking-recall caveat.)
    corrupted_tokens = [
        t[:2] + "x" + t[3:] if i % 6 == 0 else t
        for i, t in enumerate(base_tokens)
    ]
    corrupted = " ".join(corrupted_tokens)
    docs = spark.createDataFrame(
        [(1, base), (2, corrupted), (3, "entirely different content here")],
        "doc_id long, text string",
    )
    fuzzy = {
        (r["doc_a"], r["doc_b"]) for r in fuzzy_dedup(docs).collect()
    }
    assert (1, 2) in fuzzy and len(fuzzy) == 1
    jacc = {
        (r["doc_a"], r["doc_b"])
        for r in shared_shingle_jaccard(docs, tau=0.5).collect()
    }
    assert (1, 2) not in jacc  # the token-set verifier is blind here


def test_fuzzy_dedup_blocking_loses_nothing_on_corpus(spark):
    """On the sf0.001 documents corpus the min_shared=2 shingle
    blocking retains every true rel_ed<=0.2 pair (all-pairs brute
    force as truth) — the recall caveat in the docstring is about
    adversarial full-corruption, not this data."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.minhash import fuzzy_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in fuzzy_dedup(docs).collect()
    }
    t = docs.select("doc_id", "text", F.length("text").alias("len"))
    a = t.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("ta"),
        F.col("len").alias("la"),
    )
    b = t.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("tb"),
        F.col("len").alias("lb"),
    )
    brute = {
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("edit_dist", F.levenshtein("ta", "tb").cast("int"))
        .filter(
            F.col("edit_dist") <= 0.2 * F.greatest("la", "lb")
        )
        .collect()
    }
    assert got == brute
    assert brute, "corpus should contain char-level near-dups"


def test_fuzzy_dedup_banded_equals_unthresholded(spark):
    """The per-pair-threshold (banded) Levenshtein must be output-
    IDENTICAL to the unthresholded DP — this is the exactness evidence
    standing in for the sf1 DuckDB oracle, whose unthresholded replay
    is over-budget (same classification as tfidf_cosine_pairs)."""
    from streamforge_data_pipeline_spark.operators.minhash import fuzzy_dedup

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    banded = {
        tuple(r) for r in fuzzy_dedup(docs, banded=True).collect()
    }
    full = {
        tuple(r) for r in fuzzy_dedup(docs, banded=False).collect()
    }
    assert banded == full
    assert banded, "sf0.01 corpus should contain fuzzy pairs"


def test_fuzzy_dedup_char_blocking_catches_full_intoken_corruption(spark):
    """r6 brief #4: corrupting every THIRD token kills ALL token
    3-gram shingles (every window of three consecutive tokens contains
    an edit), so token blocking is structurally blind — while char
    5-gram blocking still sees the ~96%-intact character stream and
    the pair verifies at rel_ed ~ 0.04."""
    from streamforge_data_pipeline_spark.operators.minhash import fuzzy_dedup

    base_tokens = [f"word{i:03d}" for i in range(60)]
    base = " ".join(base_tokens)
    corrupted = " ".join(
        t[:2] + "x" + t[3:] if i % 3 == 0 else t
        for i, t in enumerate(base_tokens)
    )
    docs = spark.createDataFrame(
        [(1, base), (2, corrupted), (3, "entirely different content here")],
        "doc_id long, text string",
    )
    token_hits = {
        (r["doc_a"], r["doc_b"]) for r in fuzzy_dedup(docs).collect()
    }
    assert (1, 2) not in token_hits  # the documented blind spot
    char_hits = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_dedup(docs, blocking="char").collect()
    }
    assert char_hits == {(1, 2)}


def test_fuzzy_dedup_char_blocking_planted_ocr_recall(spark):
    """Planted-OCR-noise recall property: every corpus doc gets a twin
    with ~4% of its characters substituted at seeded-random positions
    (classic OCR confusions); char-5-gram-blocked fuzzy_dedup must
    recover EVERY planted pair — and nothing that links two different
    base docs."""
    import random

    from streamforge_data_pipeline_spark.operators.minhash import fuzzy_dedup

    rng = random.Random(20260815)
    rows = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(20).collect()

    def ocr_noise(s: str) -> str:
        chars = list(s)
        n_edits = max(1, int(len(chars) * 0.04))
        for _ in range(n_edits):
            i = rng.randrange(len(chars))
            if chars[i] != " ":
                chars[i] = rng.choice("ilo01rn")
        return "".join(chars)

    planted = [(r["doc_id"], r["text"]) for r in rows] + [
        (r["doc_id"] + 100_000, ocr_noise(r["text"])) for r in rows
    ]
    docs = spark.createDataFrame(planted, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_dedup(docs, blocking="char").collect()
    }
    want = {(r["doc_id"], r["doc_id"] + 100_000) for r in rows}
    missing = want - got
    assert not missing, f"planted OCR pairs evaded char blocking: {missing}"
    cross = {
        (a, b) for (a, b) in got
        if (b - a) != 100_000 and not (a < 100_000 and b < 100_000)
    }
    # pairs among the originals may legitimately exist (the corpus has
    # real near-dups); what must NOT happen is noise linking two
    # DIFFERENT base docs' twins
    assert not cross or all(
        (a, b - 100_000) in got or (b - 100_000, a) in got or a == b - 100_000
        for (a, b) in cross if b >= 100_000
    )


def test_simhash_banding_radius_dial(spark):
    """n_bands generalization (r7): radius-6 blocking (8x8-bit bands)
    must find every radius-3 pair the 4x16-bit layout finds (Hamming
    <= 3 <= 6), plus planted pairs in the (3, 6] shell that the tight
    radius must NOT emit; invalid band configs raise."""
    from streamforge_data_pipeline_spark.operators.dedup import (
        simhash_near_pairs,
    )

    # synthetic fingerprints: exact control over Hamming distances
    sigs = spark.createDataFrame(
        [
            (1, 0),
            (2, 0b111),          # d(1,2) = 3
            (3, 0b111111),       # d(1,3) = 6, d(2,3) = 3
            (4, (1 << 40) - 1),  # far from all
        ],
        "doc_id long, simhash long",
    )
    tight = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(sigs, max_hamming=3).collect()
    }
    loose = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(sigs, max_hamming=6, n_bands=8).collect()
    }
    assert set(tight) == {(1, 2), (2, 3)}
    assert set(loose) == {(1, 2), (2, 3), (1, 3)}
    assert all(loose[p] == h for p, h in tight.items())

    import pytest

    with pytest.raises(ValueError, match="divide"):
        simhash_near_pairs(sigs, max_hamming=3, n_bands=5)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs(sigs, max_hamming=8, n_bands=8)


def test_minhash_estimate_exact_dup_and_bounds(spark):
    """Sketch calibration sanity: a planted EXACT duplicate estimates
    1.0 and verifies 1.0; every estimate is a multiple of 1/16 in
    [0, 1]; and the estimator's residual on real candidates stays
    within 4 standard errors (sqrt(J(1-J)/16) + rounding slack)."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.minhash import (
        minhash_estimate_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    planted = docs.limit(1).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text", *[
            c for c in docs.columns if c not in ("doc_id", "text")
        ]
    )
    rows = minhash_estimate_pairs(
        docs.select("doc_id", "text").unionByName(
            planted.select("doc_id", "text")
        )
    ).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in rows}
    dup = [
        r for (a, b), r in by_pair.items() if b == a + 500_000
    ]
    assert dup and dup[0]["est_jaccard"] == 1.0 and dup[0]["jaccard"] == 1.0
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert abs(r["est_jaccard"] * 16 - round(r["est_jaccard"] * 16)) < 1e-6
        j = r["jaccard"]
        se = (j * (1 - j) / 16) ** 0.5
        assert abs(r["est_jaccard"] - j) <= 4 * se + 0.26, r


def test_tfidf_dense_boundary_band_sandwich(spark):
    """The r10 float-decides/decimal-boundary rerank, sandwiched:
    boundary_band=1.0 forces EVERY candidate through the in-kernel
    Python-decimal fold (the strongest check that it replicates
    Spark's cast+fold digit-for-digit), boundary_band=0.0 forces pure
    float — both must equal the sparse scheme's decimal aggregation
    exactly, as must the default band."""
    import random

    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.text import (
        _tfidf_dense_candidates,
        tfidf_cosine_pairs,
    )
    from streamforge_data_pipeline_spark.functions import tokens

    rng = random.Random(43)
    rows = [
        (d, " ".join(rng.choice([f"s{i}" for i in range(14)]) for _ in range(25)))
        for d in range(50)
    ]
    df = _docs(spark, rows)
    want = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, tau=0.5, scheme="sparse").collect()
    }

    toks = df.select(F.col("doc_id"), F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .filter(F.col("df") < F.col("n_docs"))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("w"),
        )
    )
    dec = lambda c: c.cast("decimal(28,10)")  # noqa: E731
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(dec(F.col("w") * F.col("w"))).cast("double")).alias("nrm")
    )
    for band in (1.0, 0.0, 1e-6):
        dots = _tfidf_dense_candidates(df, w, 0.5, "doc_id", boundary_band=band)
        got = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in (
                dots.join(norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na")), "doc_a")
                .join(norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb")), "doc_b")
                .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
                .filter(F.col("cos") >= F.lit(0.5) - F.lit(1e-9))
                .select("doc_a", "doc_b", (F.floor(F.col("cos") * 1e4 + 0.5) / 1e4).alias("cosine"))
            ).collect()
        }
        assert got == want and got, band
