"""Connected-components clustering verified against a Python
union-find over the same pair set, plus canonical-doc filtering."""

from __future__ import annotations

from streamforge_data_pipeline_spark.operators import minhash
from streamforge_data_pipeline_spark.operators.dedup import (
    connected_components,
    keep_canonical,
)
from streamforge_data_pipeline_spark.session import load

from tests.conftest import SF_MED, SF_SMALL


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark):
    docs = load(spark, SF_MED, "documents")
    pairs_df = minhash.minhash_lsh_dedup(docs, tau=0.5)
    pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    assert pairs, "expected near-dup pairs in testdata"

    expected = _union_find(pairs)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs_df).collect()
    }
    assert got == expected

    kept = keep_canonical(docs, connected_components(pairs_df))
    n_docs = docs.count()
    n_losers = sum(1 for k, v in expected.items() if k != v)
    assert kept.count() == n_docs - n_losers


def test_long_chain_converges_without_plan_blowup(spark):
    # Path graph 0-1-2-...-15: diameter 15 forces > checkpoint_every
    # label-propagation rounds; passes only if lineage truncation keeps
    # the iterative plan analyzable and the fixpoint is still exact.
    n = 16
    chain = [(i, i + 1) for i in range(n - 1)]
    pairs_df = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs_df, max_iters=n, small_graph_max_edges=0).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_df_capped_shingles_suppress_boilerplate(spark):
    from streamforge_data_pipeline_spark.operators import minhash

    header = "this software is provided as is without warranty of any kind express or implied"
    docs = [(i, f"{header} unique content piece number {i} with words {i*7} {i*13} {i*17}")
            for i in range(40)]
    # 2 true near-dups sharing real content beyond the header:
    docs.append((100, header + " the quick brown fox jumps over the lazy dog again and again today"))
    docs.append((101, header + " the quick brown fox jumps over the lazy dog again and again tonight"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    capped = minhash.minhash_lsh_dedup(df, tau=0.5, max_df=10)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    # boilerplate-only pairs (header docs vs each other) must not pass tau
    assert all(a >= 100 for a, b in pairs), pairs


def test_df_cap_none_is_default_path(spark):
    from streamforge_data_pipeline_spark.operators import minhash

    docs = load(spark, SF_SMALL, "documents")
    base = {tuple(r) for r in minhash.minhash_lsh_dedup(docs, tau=0.5).collect()}
    # a cap far above any real DF must not change results
    capped = {tuple(r) for r in minhash.minhash_lsh_dedup(docs, tau=0.5, max_df=10**6).collect()}
    assert base == capped


def test_size_prune_identical_results(spark):
    from streamforge_data_pipeline_spark.operators.minhash import minhash_lsh_dedup
    from streamforge_data_pipeline_spark.session import load
    from tests.conftest import SF_MED

    docs = load(spark, SF_MED, "documents")
    plain = minhash_lsh_dedup(docs, tau=0.5)
    pruned = minhash_lsh_dedup(docs, tau=0.5, size_prune=True)
    assert plain.count() == pruned.count()
    assert plain.exceptAll(pruned).count() == 0


def test_long_chain_crosses_checkpoint_generations(spark):
    """A 17-node path graph needs 16 label-propagation rounds — four
    localCheckpoint generations at checkpoint_every=4. Guards the
    previous-generation block-release path (_free_local_checkpoint
    reaches through py4j internals; if a Spark upgrade moves them,
    this surfaces as a failure here instead of silent storage
    retention — r3 advice)."""
    n = 17
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, max_iters=30, small_graph_max_edges=0).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_chain_longer_than_iteration_cap_converges(spark):
    # Path graph 0-1-...-199: diameter 199 >> max_iters=20. Plain
    # min-label propagation moves the 0 label ONE hop per round and
    # would silently return stale labels (the sf1 semantic_dedup_cells
    # mismatch); pointer doubling makes convergence O(log diameter),
    # so the default cap must suffice — and non-convergence now raises
    # rather than returning wrong clusters.
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, small_graph_max_edges=0).collect()
    }
    assert got == {i: 0 for i in range(n)}

def test_small_graph_fast_path_matches_distributed(spark):
    """The thresholded union-find fast path must produce byte-identical
    labels to the distributed min-label loop on the same graph —
    cliques, chains, and singly-linked stars mixed."""
    edges = (
        [(i, i + 1) for i in range(30)]              # chain
        + [(100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)]  # clique
        + [(200, 200 + i) for i in range(1, 8)]      # star
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, small_graph_max_edges=0).collect()
    }
    assert fast == dist and fast[30] == 0 and fast[104] == 100 and fast[207] == 200

def test_pagerank_canonical_picks_central_not_min(spark):
    """Star graph 10-(11..15): the CENTER (id 10) must win even though
    min-id selection would also pick 10 — so add a second component
    where the center is NOT the min id: 21-(20,22,23). PageRank must
    pick 21 over the min id 20."""
    from streamforge_data_pipeline_spark.operators.dedup import (
        pagerank_canonical,
    )

    edges = [(10, i) for i in (11, 12, 13, 14, 15)]
    edges += [(21, 20), (21, 22), (21, 23)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = {r["doc_id"]: r for r in pagerank_canonical(pairs).collect()}
    assert out[10]["keep"] and not out[11]["keep"]
    assert out[21]["keep"] and not out[20]["keep"], (
        out[20]["score"], out[21]["score"]
    )
    assert out[20]["cluster_id"] == 20 and out[21]["cluster_id"] == 20
    # scores: centers strictly above leaves
    assert out[10]["score"] > out[11]["score"]
    assert out[21]["score"] > out[22]["score"]


def test_pagerank_deterministic_across_runs(spark):
    from streamforge_data_pipeline_spark.operators.dedup import pagerank_scores

    pairs = spark.createDataFrame(
        [(i, (i * 3 + 1) % 17) for i in range(17) if i != (i * 3 + 1) % 17],
        "doc_a long, doc_b long",
    )
    a = sorted(map(tuple, pagerank_scores(pairs).collect()))
    b = sorted(map(tuple, pagerank_scores(pairs).collect()))
    assert a == b and len(a) > 0


def test_triangle_counts_clique_vs_chain(spark):
    """Planted 4-clique (every node: 3 triangles, clustering 1.0) vs a
    4-chain (no triangles, middles clustering 0.0) — the diagnostic
    contrast the operator exists to expose."""
    from streamforge_data_pipeline_spark.operators.dedup import triangle_counts

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(10, 11), (11, 12), (12, 13)]
    pairs = spark.createDataFrame(clique + chain, "doc_a long, doc_b long")
    out = {r["doc_id"]: r for r in triangle_counts(pairs).collect()}
    for n in range(4):
        assert out[n]["degree"] == 3
        assert out[n]["n_triangles"] == 3
        assert out[n]["clustering"] == 1.0
    for n in (11, 12):  # chain middles: degree 2, no closing edge
        assert out[n]["n_triangles"] == 0 and out[n]["clustering"] == 0.0
    for n in (10, 13):  # chain ends: degree 1 -> coefficient undefined -> 0
        assert out[n]["degree"] == 1 and out[n]["clustering"] == 0.0
    # reversed/duplicated edges don't change anything
    rev = spark.createDataFrame(
        [(b, a) for a, b in clique + chain] + clique, "doc_a long, doc_b long"
    )
    out2 = {r["doc_id"]: r for r in
            triangle_counts(pairs.unionAll(rev)).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in out2.items()}
