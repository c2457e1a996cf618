"""Prefix-filtered exact all-pairs Jaccard (r4): lossless vs naive.

allpairs_jaccard claims byte-identical output to the naive
shared-shingle self-join at any tau — prefix filtering and the length
filter must only drop pairs that provably cannot reach the threshold.
These tests brute-force that claim on the real corpus and on an
adversarial templated corpus (ubiquitous boilerplate shingles — the
exact case the prefix order is supposed to neutralize), across tau
values including one with awkward float behavior (0.3*10 != 3.0).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators import minhash as M
from streamforge_data_pipeline_spark.session import load

from tests.conftest import SF_SMALL


def naive_pairs(docs, tau):
    sh = M.shingles(docs)
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    j = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )
    return j.filter(F.col("jaccard") >= tau).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


def as_set(df):
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()}


@pytest.mark.parametrize("tau", [0.3, 0.5, 0.8])
def test_allpairs_equals_naive_on_corpus(spark, tau):
    docs = load(spark, SF_SMALL, "documents")
    assert as_set(M.allpairs_jaccard(docs, tau=tau)) == as_set(naive_pairs(docs, tau))


def test_allpairs_equals_naive_on_templated_corpus(spark):
    # every doc shares header+footer shingles (df == corpus size): the
    # worst case for the naive join, and the shingles the prefix order
    # must rank LAST so they never generate candidates.
    header = "all rights reserved internal use only do not distribute"
    docs = (
        load(spark, SF_SMALL, "documents")
        .limit(200)
        .select(
            "doc_id",
            F.concat(F.lit(header + " "), F.col("text"), F.lit(" " + header)).alias("text"),
        )
    )
    assert as_set(M.allpairs_jaccard(docs, tau=0.5)) == as_set(naive_pairs(docs, 0.5))


def test_scheme_auto_select_picks_by_corpus_statistic(spark):
    """r5: the engine, not a docstring, picks the exact-Jaccard
    candidate scheme — and the statistic is a property of the corpus
    AT ITS SIZE. A dense tiny-vocabulary corpus (every trigram
    repeats; the sf0.1 bench regime, measured singleton frac 0.008)
    -> naive; a Zipf corpus AND the sf0.001 driver corpus (real
    singleton tails) -> allpairs. Margins must be wide on both sides
    of the 0.3 threshold."""
    from streamforge_data_pipeline_spark.sources.datagen_star import (
        gen_documents_zipf,
    )

    # dense regime: 8-word vocab, 200 docs of 20 tokens — ~512
    # possible trigram types, ~3600 occurrences: nothing is a singleton
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    dense = spark.range(200).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 20), "
        f"j -> element_at(array({','.join(repr(v) for v in vocab)}), "
        "cast(pmod(hash(id, j), 8) + 1 AS int)))) AS text",
    )
    scheme, stats = M.choose_exact_jaccard_scheme(M.shingles(dense))
    frac = stats["singleton_types"] / max(stats["types"], 1)
    assert scheme == "naive" and frac < 0.1, (scheme, stats)

    # sparse regimes
    docs = load(spark, SF_SMALL, "documents")
    dscheme, dstats = M.choose_exact_jaccard_scheme(M.shingles(docs))
    dfrac = dstats["singleton_types"] / max(dstats["types"], 1)
    assert dscheme == "allpairs" and dfrac > 0.5, (dscheme, dstats)

    zipf = gen_documents_zipf(spark, n=500)
    zscheme, zstats = M.choose_exact_jaccard_scheme(M.shingles(zipf))
    zfrac = zstats["singleton_types"] / max(zstats["types"], 1)
    assert zscheme == "allpairs" and zfrac > 0.5, (zscheme, zstats)


def test_exact_jaccard_pairs_equivalent_across_schemes(spark):
    """All three routes (naive, allpairs, auto) produce the identical
    pair set on BOTH corpus regimes — the auto choice is purely a
    performance decision."""
    from streamforge_data_pipeline_spark.sources.datagen_star import (
        gen_documents_zipf,
    )

    for docs in (
        load(spark, SF_SMALL, "documents").limit(300),
        gen_documents_zipf(spark, n=300),
    ):
        expected = as_set(M.exact_jaccard_pairs(docs, tau=0.5, scheme="naive"))
        assert as_set(M.exact_jaccard_pairs(docs, tau=0.5, scheme="allpairs")) == expected
        assert as_set(M.exact_jaccard_pairs(docs, tau=0.5, scheme="auto")) == expected


def test_exact_jaccard_pairs_rejects_unknown_scheme(spark):
    docs = load(spark, SF_SMALL, "documents").limit(5)
    with pytest.raises(ValueError, match="unknown exact-Jaccard scheme"):
        M.exact_jaccard_pairs(docs, scheme="bogus")


def test_prefix_join_is_smaller_than_naive(spark):
    """The point of the operator: candidate volume must collapse.

    Compare co-shingle join row counts (the quadratic term) between the
    full shingle relation and the prefix relation on the real corpus.
    """
    from pyspark.sql import Window

    docs = load(spark, SF_SMALL, "documents")
    sh = M.shingles(docs)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("doc_id").orderBy("__df", "sh")
    ranked = sh.join(dfreq, "sh").select(
        "doc_id", "sh",
        F.row_number().over(w).alias("__pos"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("__n"),
    )
    prefix = ranked.filter(
        F.col("__pos") <= F.col("__n") - F.ceil(F.lit(0.5) * F.col("__n") - F.lit(1e-9)) + 1
    )

    def join_rows(rel):
        return (
            rel.alias("a")
            .join(rel.alias("b"),
                  (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .count()
        )

    full, pref = join_rows(sh), join_rows(prefix)
    assert pref < full / 2, (pref, full)


def test_fuzzy_lsh_full_recall_on_planted_ocr(spark):
    """The LSH fuzzy twin's recall contract at realistic corruption
    (r~0.02, the planted-OCR case): every pair the exact verifier
    emits must also come out of the char-9-gram 16x4-banded (64-perm)
    candidate stage, with identical verified values (the banding curve
    puts r=0.02 at ~100% — the operator docstring's stated regime)."""
    import random

    rng = random.Random(9)
    docs = []
    for c in range(12):
        base_tokens = [f"w{c}{i:03d}" for i in range(60)]
        base = " ".join(base_tokens)
        chars = list(base)
        # ~2% of characters corrupted, never spaces
        for _ in range(max(1, len(chars) // 50)):
            j = rng.randrange(len(chars))
            if chars[j] != " ":
                chars[j] = "z"
        docs.append((2 * c, base))
        docs.append((2 * c + 1, "".join(chars)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {
        tuple(r) for r in M.fuzzy_dedup(df, max_df=None).collect()
    }
    lsh = {tuple(r) for r in M.fuzzy_dedup_lsh(df).collect()}
    planted = {(2 * c, 2 * c + 1) for c in range(12)}
    assert planted <= {(a, b) for (a, b, *_ ) in lsh}
    assert exact <= lsh  # full recall here; verified values identical
