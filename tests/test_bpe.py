"""Tokenizer training: BPE merge learning + application semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.bpe import (
    apply_bpe_merges,
    learn_bpe_merges,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_learn_merges_classic_corpus(spark):
    """Sennrich's toy shape: 'low' x5, 'lower' x2, 'newest' x6,
    'widest' x3 — the first merge must be (e, s) (count 9 from
    newest+widest), the second (es, t)."""
    texts = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (["widest"] * 3)
    out = learn_bpe_merges(_docs(spark, [" ".join(texts)]), n_merges=4).collect()
    assert (out[0]["lhs"], out[0]["rhs"], out[0]["pair_count"]) == ("e", "s", 9)
    assert (out[1]["lhs"], out[1]["rhs"], out[1]["pair_count"]) == ("es", "t", 9)
    steps = [r["step"] for r in out]
    assert steps == [1, 2, 3, 4]


def test_merge_application_is_greedy_left_to_right(spark):
    """BPE's greedy rule: merging (a, a) over 'aaa' yields 'aa'+'a',
    never 'a'+'aa' — the leftmost pair wins. This is the exact
    property the literal-replace implementation must preserve."""
    out = learn_bpe_merges(_docs(spark, ["aaa aaa aaa"]), n_merges=2).collect()
    assert (out[0]["lhs"], out[0]["rhs"]) == ("a", "a")
    # 'aaa' has 2 overlapping (a,a) pairs x 3 occurrences
    assert out[0]["pair_count"] == 6
    # after merging: 'aa a' -> remaining pair is (aa, a), 3 occurrences
    assert (out[1]["lhs"], out[1]["rhs"], out[1]["pair_count"]) == ("aa", "a", 3)

    toks = apply_bpe_merges(
        _docs(spark, ["aaa"]), [("a", "a")], out="bpe"
    ).collect()
    assert toks[0]["bpe"] == ["aa", "a"]


def test_apply_merges_in_training_order(spark):
    """Applying the learned merges re-tokenizes consistently: the
    trained pairs collapse, unseen sequences stay at char level."""
    corpus = _docs(spark, ["hello hello hello help"])
    merges = [
        (r["lhs"], r["rhs"])
        for r in learn_bpe_merges(corpus, n_merges=3).collect()
    ]
    toks = {
        r["word"]: r["bpe_tokens"]
        for r in apply_bpe_merges(_docs(spark, ["hello help zzz"]), merges).collect()
    }
    # every learned merge is a single token in the re-tokenized output
    flat = [t for ts in toks.values() for t in ts]
    assert any(len(t) > 1 for t in flat)
    assert toks["zzz"] == ["z", "z", "z"]  # untouched by training
    # merges applied greedily: no adjacent token pair equals a merge
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            assert (a, b) not in merges


def test_adjacent_occurrences_both_merge(spark):
    """r7 ADVICE regression: adjacent occurrences of a pair share a
    separator — the single-space literal replace consumed it and
    stopped after the first merge ('b a n a n a' + (a,n) ->
    'b an a n a'). Canonical greedy BPE merges both: 'b an an a'.
    The double-space encoding fixes this in ONE literal pass."""
    toks = apply_bpe_merges(
        _docs(spark, ["banana"]), [("a", "n")], out="bpe"
    ).collect()
    assert toks[0]["bpe"] == ["b", "an", "an", "a"]

    # runs of the same pair: 'aaaa' + (a,a) -> 'aa'+'aa' (not 'aa a a')
    toks = apply_bpe_merges(
        _docs(spark, ["aaaa"]), [("a", "a")], out="bpe"
    ).collect()
    assert toks[0]["bpe"] == ["aa", "aa"]

    # and odd runs still end with the leftover singleton
    toks = apply_bpe_merges(
        _docs(spark, ["aaaaa"]), [("a", "a")], out="bpe"
    ).collect()
    assert toks[0]["bpe"] == ["aa", "aa", "a"]


def test_learned_counts_see_merged_adjacents(spark):
    """Training-side twin of the adjacency fix: after merging (a,n)
    over 'banana' x4, the vocabulary must hold 'b an an a', whose
    pair set is {(b,an), (an,an), (an,a)} — all count 4, and the
    (cnt DESC, lhs, rhs) tie-break picks (an, a). The buggy
    single-space encoding left 'b an a n a', whose pair set still
    contains (a, n) at count 4, which the same tie-break would pick
    instead — so step 2's winner discriminates the encodings."""
    out = learn_bpe_merges(_docs(spark, ["banana banana banana banana"]),
                           n_merges=2).collect()
    assert (out[0]["lhs"], out[0]["rhs"]) == ("a", "n")
    assert (out[1]["lhs"], out[1]["rhs"], out[1]["pair_count"]) == (
        "an", "a", 4)


def test_learn_merges_stops_when_no_pairs(spark):
    """Single-char vocabulary has no adjacent pairs: empty result, no
    error (early break, not an empty-argmax crash)."""
    out = learn_bpe_merges(_docs(spark, ["a b c a b"]), n_merges=4).collect()
    assert out == []


def test_apply_paths_byte_identical(spark):
    """The narrow-map and vocab-join apply shapes emit identical
    tokenizations (the r9 A/B's correctness leg)."""
    from streamforge_data_pipeline_spark.operators.bpe import (
        apply_bpe_merges,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(i, f"banana bandana an{i % 5} a a a a") for i in range(40)],
        "doc_id long, text string",
    )
    merges = [
        (r["lhs"], r["rhs"]) for r in learn_bpe_merges(docs, n_merges=6).collect()
    ]
    direct = sorted(
        (r["doc_id"], r["word"], tuple(r["bpe_tokens"]))
        for r in apply_bpe_merges(docs, merges, via_vocab=False).collect()
    )
    vocab = sorted(
        (r["doc_id"], r["word"], tuple(r["bpe_tokens"]))
        for r in apply_bpe_merges(docs, merges, via_vocab=True).collect()
    )
    assert direct == vocab and direct
