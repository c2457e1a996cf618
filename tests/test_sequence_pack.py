"""Semantics of the training-sequence pack plan (sequence_pack).

The oracle differential (test_oracle_differential / oracle_sweep)
checks cross-engine value parity; these tests pin the CONTRACT the
numbers must satisfy regardless of engine:

  - every sequence except each shard's last is exactly full, and the
    slices tile it with no gap or overlap;
  - each document's slices reconstruct its slot [0, n_toks + 1)
    contiguously and in seq order;
  - the plan is invariant under input partitioning (the determinism
    the samplers guarantee).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.functions import tokens
from streamforge_data_pipeline_spark.operators.sampling import sequence_pack
from streamforge_data_pipeline_spark.session import load

from tests.conftest import SF_MED

CTX = 128


def _plan(spark, **kw):
    docs = load(spark, SF_MED, "documents")
    return sequence_pack(docs, ctx_len=CTX, n_shards=16, **kw)


def test_sequences_tile_exactly(spark):
    rows = _plan(spark).collect()
    by_seq: dict[tuple[int, int], list[tuple[int, int]]] = defaultdict(list)
    last_seq: dict[int, int] = {}
    for r in rows:
        by_seq[(r["shard"], r["seq_id"])].append((r["seq_start"], r["seq_end"]))
        last_seq[r["shard"]] = max(last_seq.get(r["shard"], 0), r["seq_id"])
    for (shard, seq), spans in by_seq.items():
        spans.sort()
        # no overlap, no gap: consecutive slices chain exactly
        assert spans[0][0] == 0, (shard, seq, spans)
        for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
            assert e0 == s1, (shard, seq, spans)
        full = spans[-1][1] == CTX
        assert full or seq == last_seq[shard], (shard, seq, spans)
        assert all(0 <= s < e <= CTX for s, e in spans)


def test_docs_reconstruct_contiguously(spark):
    docs = load(spark, SF_MED, "documents").select(
        "doc_id", (F.size(tokens("text")) + 1).cast("long").alias("slot")
    )
    slots = {r["doc_id"]: r["slot"] for r in docs.collect()}
    by_doc: dict[int, list] = defaultdict(list)
    for r in _plan(spark).collect():
        by_doc[r["doc_id"]].append(r)
    assert set(by_doc) == set(slots)  # every doc is packed
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["seq_id"])
        # slices cover [0, slot) of the doc in order, without holes
        off = 0
        for r in rows:
            assert r["doc_start"] == off, (doc_id, rows)
            off += r["seq_end"] - r["seq_start"]
        assert off == slots[doc_id], (doc_id, off, slots[doc_id])
        # a doc's slices sit in CONSECUTIVE sequences of one shard
        assert len({r["shard"] for r in rows}) == 1
        seqs = [r["seq_id"] for r in rows]
        assert seqs == list(range(seqs[0], seqs[0] + len(seqs)))


def test_partitioning_invariant(spark):
    docs = load(spark, SF_MED, "documents")
    a = sorted(map(tuple, sequence_pack(docs, 128, 16).collect()))
    b = sorted(
        map(tuple, sequence_pack(docs.repartition(7), 128, 16).collect())
    )
    assert a == b


def test_materialized_sequences_are_the_concat_stream(spark):
    """The plan is not just self-consistent — its slices materialize to
    the actual tokens: rebuilding every sequence from (plan x tokenized
    docs) yields each shard's EOS-joined concatenation, cut at CTX."""
    docs = load(spark, SF_MED, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    toks = {r["doc_id"]: r["toks"] + ["<EOS>"] for r in docs.collect()}
    seqs: dict[tuple[int, int], list[tuple[int, list]]] = defaultdict(list)
    for r in _plan(spark).collect():
        n = r["seq_end"] - r["seq_start"]
        piece = toks[r["doc_id"]][r["doc_start"]: r["doc_start"] + n]
        assert len(piece) == n  # slices never run past the doc's slot
        seqs[(r["shard"], r["seq_id"])].append((r["seq_start"], piece))
    for (shard, seq), parts in sorted(seqs.items()):
        parts.sort()
        flat = [t for _, piece in parts for t in piece]
        assert len(flat) <= CTX
    # shard-level: concatenating the sequences in order reproduces the
    # EOS-joined doc stream in (hash, id) order exactly
    from streamforge_data_pipeline_spark.functions import hash60

    order = load(spark, SF_MED, "documents").select(
        "doc_id", hash60(F.col("doc_id").cast("string")).alias("h")
    ).collect()
    by_shard: dict[int, list] = defaultdict(list)
    for r in order:
        by_shard[r["h"] % 16].append((r["h"], r["doc_id"]))
    for shard, members in by_shard.items():
        stream = [
            t for _, d in sorted(members) for t in toks[d]
        ]
        rebuilt = [
            t
            for (sh, _), parts in sorted(seqs.items())
            if sh == shard
            for _, piece in sorted(parts)
            for t in piece
        ]
        assert rebuilt == stream, f"shard {shard}"
