"""Semantics tests for the r5 passage-level operators: ExactSubstr-
style dup_span_removal and winnowing fingerprint overlap — brute-force
cross-checked against plain Python recomputations on constructed and
seeded-random corpora (house pattern; the DuckDB differential covers
both on the real corpus via their registry oracles).
"""

from __future__ import annotations

import hashlib
import math
import random
import re
from collections import Counter

from streamforge_data_pipeline_spark.operators.minhash import (
    winnow_fingerprints,
    winnow_overlap,
)
from streamforge_data_pipeline_spark.operators.text import dup_span_removal


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _ref_spans(docs, k):
    """Reference: covered-position runs from corpus-duplicated k-grams."""
    toks = {d: _toks(t) for d, t in docs}
    cnt = Counter()
    for ts in toks.values():
        for i in range(len(ts) - k + 1):
            cnt[tuple(ts[i : i + k])] += 1
    out = {}
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - k + 1):
            if cnt[tuple(ts[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        runs = []
        for p in sorted(covered):
            if runs and p == runs[-1][1] + 1:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        clean = " ".join(t for i, t in enumerate(ts) if i not in covered)
        out[d] = (len(ts), len(runs), len(covered), clean)
    return out


# ---------------------------------------------------------- dup_span_removal


def test_dup_span_planted_shared_passage(spark):
    passage = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma " + passage + " delta epsilon"),
            (2, "zeta eta " + passage + " theta"),
            (3, "iota kappa lam mu nu xi omicron pi rho sigma"),
        ],
    )
    out = {r["doc_id"]: r for r in dup_span_removal(df, k=4).collect()}
    # both sharers lose exactly the 12 passage tokens in one span
    for d, prefix, suffix in ((1, "alpha beta gamma", "delta epsilon"), (2, "zeta eta", "theta")):
        assert out[d]["n_spans"] == 1
        assert out[d]["dup_tokens"] == 12
        assert out[d]["text_clean"] == f"{prefix} {suffix}"
    # untouched doc: zero spans, normalized text unchanged
    assert out[3]["n_spans"] == 0
    assert out[3]["dup_tokens"] == 0
    assert out[3]["text_clean"] == "iota kappa lam mu nu xi omicron pi rho sigma"


def test_dup_span_within_doc_repetition_counts(spark):
    # the duplicated 4-gram occurs twice INSIDE one doc — ExactSubstr
    # counts corpus occurrences, so both hits are spans
    df = _docs(
        spark,
        [(1, "a1 b2 c3 d4 filler1 filler2 filler3 a1 b2 c3 d4 tail1")],
    )
    row = dup_span_removal(df, k=4).collect()[0]
    assert row["n_spans"] == 2
    assert row["dup_tokens"] == 8
    assert row["text_clean"] == "filler1 filler2 filler3 tail1"


def test_dup_span_adjacent_hits_merge_to_one_span(spark):
    # two duplicated 3-grams at starts 0 and 3 (adjacent coverage
    # [0..2] + [3..5]) must merge into ONE maximal span
    df = _docs(
        spark,
        [
            (1, "p1 p2 p3 q1 q2 q3 mid1"),
            (2, "p1 p2 p3 other1 other2"),
            (3, "q1 q2 q3 another1"),
        ],
    )
    out = {r["doc_id"]: r for r in dup_span_removal(df, k=3).collect()}
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 6
    assert out[1]["text_clean"] == "mid1"


def test_dup_span_matches_bruteforce_on_random_corpus(spark):
    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(60):
        n = rng.randint(12, 60)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant some shared passages to guarantee structure
    shared = " ".join(rng.choice(vocab) for _ in range(15))
    rows[5] = (5, rows[5][1] + " " + shared)
    rows[17] = (17, shared + " " + rows[17][1])
    ref = _ref_spans(rows, k=8)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"], r["text_clean"])
        for r in dup_span_removal(_docs(spark, rows), k=8).collect()
    }
    assert set(got) == set(ref)
    for d, (n_tok, n_spans, dup, clean) in ref.items():
        assert got[d] == (n_tok, n_spans, dup, clean), f"doc {d}"


# ------------------------------------------------------------- winnowing


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_fps(ts, k, w):
    grams = [
        (_h60(" ".join(ts[i : i + k])), i) for i in range(len(ts) - k + 1)
    ]
    return {min(grams[i : i + w]) for i in range(len(grams) - w + 1)}


def test_winnow_matches_bruteforce(spark):
    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(25)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(10, 50))))
        for d in range(25)
    ]
    got = {}
    for r in winnow_fingerprints(_docs(spark, rows), k=4, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp"], r["pos"]))
    for d, text in rows:
        assert got.get(d, set()) == _ref_fps(_toks(text), 4, 4), f"doc {d}"


def test_winnow_shared_substring_guarantee(spark):
    # Schleimer et al. thm: a shared run of >= w+k-1 tokens yields at
    # least one common fingerprint
    k = w = 4
    shared = "s1 s2 s3 s4 s5 s6 s7"  # w+k-1 = 7 tokens
    df = _docs(
        spark,
        [
            (1, "pre1 pre2 " + shared + " post1"),
            (2, "other1 " + shared + " other2 other3"),
        ],
    )
    fps = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2]


def test_winnow_overlap_pair_detection_and_boilerplate_cap(spark):
    rng = random.Random(5)
    vocab = [f"v{i}" for i in range(30)]
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    passage = " ".join(rng.choice(vocab) for _ in range(20))
    rows = []
    for d in range(10):
        body = " ".join(rng.choice(vocab) for _ in range(30))
        # every doc carries the boilerplate footer
        rows.append((d, body + " " + boiler))
    rows[2] = (2, rows[2][1] + " " + passage)
    rows[7] = (7, passage + " " + rows[7][1])
    # max_df=4 < 10 docs: boilerplate fingerprints cannot create pairs
    pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in winnow_overlap(
            _docs(spark, rows), k=4, w=4, min_shared=2, max_df=4
        ).collect()
    }
    assert (2, 7) in pairs
    row = pairs[(2, 7)]
    assert row["n_shared"] >= 2
    assert 0.0 < row["containment"] <= 1.0
    # no pair should exist between docs sharing ONLY the boilerplate
    assert (0, 1) not in pairs


# ------------------------------------------------------- containment dedup


def test_containment_catches_excerpt_that_jaccard_misses(spark):
    from streamforge_data_pipeline_spark.operators.minhash import (
        containment_pairs,
        exact_jaccard_pairs,
    )

    rng = random.Random(3)
    vocab = [f"c{i}" for i in range(50)]
    long_doc = " ".join(rng.choice(vocab) for _ in range(120))
    excerpt = " ".join(long_doc.split()[20:40])  # 20-token quote
    df = _docs(
        spark,
        [
            (1, long_doc),
            (2, excerpt),
            (3, " ".join(rng.choice(vocab) for _ in range(60))),
        ],
    )
    pairs = {
        (r["doc_sub"], r["doc_sup"]): r["containment"]
        for r in containment_pairs(df, tau=0.8).collect()
    }
    # the excerpt is fully contained in the long doc...
    assert pairs.get((2, 1)) == 1.0
    # ...but NOT the reverse, and the unrelated doc appears nowhere
    assert (1, 2) not in pairs
    assert not any(3 in p for p in pairs)
    # and symmetric Jaccard stays far below any dedup threshold
    jac = exact_jaccard_pairs(df, tau=0.1, scheme="naive").collect()
    j12 = [r["jaccard"] for r in jac if {r["doc_a"], r["doc_b"]} == {1, 2}]
    assert not j12 or j12[0] < 0.25


def test_containment_bruteforce_random_corpus(spark):
    from streamforge_data_pipeline_spark.operators.minhash import containment_pairs

    rng = random.Random(21)
    vocab = [f"d{i}" for i in range(20)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40))))
        for d in range(40)
    ]
    # make doc 30 a superset-ish rewrite of doc 10
    rows[30] = (30, rows[10][1] + " extra1 extra2 extra3")
    tau = 0.8

    def sh_set(text):
        ts = _toks(text)
        return {tuple(ts[i : i + 3]) for i in range(len(ts) - 2)}

    sets = {d: sh_set(t) for d, t in rows}
    want = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= tau - 1e-9:
                want[(a, b)] = math.floor(c * 1e4 + 0.5) / 1e4
    got = {
        (r["doc_sub"], r["doc_sup"]): r["containment"]
        for r in containment_pairs(_docs(spark, rows), tau=tau).collect()
    }
    assert got == want
