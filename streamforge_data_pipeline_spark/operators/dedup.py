"""Deduplication operators.

Reference surface:
- J1 broadcast anti-join vs. existing key set (ItemRepository.java:11-17,
  BackgroundCsvProcessor.java:59-61,238-240). The reference's comment —
  prefetch once to avoid 200k per-row DB probes — is verbatim
  broadcast-hash-join reasoning; at 100 TB the key set outgrows the
  broadcast threshold and Spark/AQE falls back to a shuffled anti-join
  with no code change.
- J2 in-file first-wins dedup (:242): order-dependent; a window
  row_number over a stable row ordinal.

Extensions (E1 + training-pipeline dedup family):
- exact content dedup: sha256 hash + first-wins — one shuffle on the
  hash, no full-text comparisons.
- SimHash signatures (bit-majority over token hashes) for near-dup
  blocking at scale.
(MinHash-LSH lives in operators/minhash.py.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from streamforge_data_pipeline_spark.functions import fan_out, hash60, hash60_hi, local_rows, tokens


def anti_join_dedup(incoming: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """J1: rows of ``incoming`` whose key is NOT in ``existing``.

    broadcast() hint for the common small-dim case; Catalyst drops the
    hint and shuffles when the right side is too large.
    """
    return incoming.join(F.broadcast(existing), key, "left_anti")


def semi_join_matches(incoming: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """J1's complement — the rejected-as-duplicate side."""
    return incoming.join(F.broadcast(existing), key, "left_semi")


def first_wins(df: DataFrame, key: str | Column, order: str | Column) -> DataFrame:
    """J2: keep the first row per key in ``order`` (file order)."""
    w = Window.partitionBy(key).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, content: str, order: str) -> DataFrame:
    """E1: exact content dedup via sha256 — dedup on a 32-byte key, not
    the document body, so the shuffle moves hashes, not 100 TB of text."""
    hashed = df.withColumn("content_hash", F.sha2(F.col(content), 256))
    return first_wins(hashed, "content_hash", order)


# --- SimHash --------------------------------------------------------------

SIMHASH_BITS = 64


def simhash(df: DataFrame, text: str, doc_id: str) -> DataFrame:
    """64-bit SimHash over tokens (term-frequency weighted).

    For each bit b: sum +-1 over all token occurrences' hash bit b;
    fingerprint bit = 1 iff the sum is positive. Near-duplicate docs
    differ in few bits (Charikar '02); Hamming-distance blocking then
    runs on a fixed-width integer instead of the raw text.

    Bit source: one md5 per token yields 120 portable bits split as
    hash60 (hex 1-15) and hash60_hi (hex 17-31); bits 0-59 read the
    low half, 60-63 the high — no second digest. Bit 63's fingerprint
    contribution is the MIN_LONG literal (1<<63 is unrepresentable as
    a positive long in either engine); the total never overflows
    because each power of two appears at most once.

    Pure column/agg pipeline, ONE shuffle: all SIMHASH_BITS per-bit
    sign sums run as independent conditional-sum aggregates over the
    token-hash columns (partial aggregation map-side), so the token
    relation is never exploded x64 into a (doc, bit) long format —
    that variant shuffles 64x the rows and needs a second aggregation.
    """
    import functools
    import operator

    tok = fan_out(df).select(doc_id, F.explode(tokens(text)).alias("tok"))
    h = tok.withColumn("h", hash60("tok")).withColumn("h2", hash60_hi("tok"))

    def bit_src(b: int):
        if b < 60:
            return F.shiftright(F.col("h"), b)
        return F.shiftright(F.col("h2"), b - 60)

    sums = h.groupBy(doc_id).agg(
        *[
            F.sum(
                F.when(bit_src(b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fingerprint = functools.reduce(
        operator.add,
        [
            F.when(
                F.col(f"s{b}") > 0,
                F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for b in range(SIMHASH_BITS)
        ],
    )
    return sums.select(F.col(doc_id), fingerprint.alias("simhash"))


def _free_local_checkpoint(df: DataFrame) -> None:
    """Release a localCheckpoint-ed frame's cached blocks.

    ``DataFrame.unpersist()`` cannot do this: checkpoint blocks live on
    the RDD, not in the cache manager. The frame's analyzed plan is a
    LogicalRDD whose ``rdd()`` IS the checkpointed RDD — unpersisting
    that drops the blocks immediately instead of waiting for driver
    GC. Only call once nothing can re-read the frame (its lineage is
    truncated, so recompute is impossible afterwards)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # py4j internals moved: blocks then free on driver GC as before


def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", max_iters: int = 20,
    small_graph_max_edges: int = 200_000,
) -> DataFrame:
    """Connected components over a near-dup pair graph -> (doc_id,
    cluster_id) with cluster_id = min doc_id in the component.

    Iterative min-label propagation WITH pointer doubling: every node
    starts labeled with itself; each round (a) joins labels across
    edges and keeps the min, then (b) shortcuts label(x) <-
    label(label(x)) — so convergence is O(log diameter), not
    O(diameter) (dup clusters are near-cliques from LSH, 2-3 rounds;
    chain-shaped graphs — e.g. loose-tau cosine graphs — are the case
    doubling exists for, and non-convergence at max_iters raises
    instead of returning stale labels). Each round is three
    distributed hash joins — no driver-side graph. The driver only
    checks the fixpoint counter, which is how iterative algorithms
    look on a 1000-executor cluster.

    Every ``checkpoint_every`` rounds the label frame is
    ``localCheckpoint``-ed: persist() caches the data but the logical
    plan still chains one join-tree per iteration, so on a
    high-diameter graph analysis/lineage growth would stall the driver
    long before the data does. The checkpoint truncates lineage to the
    materialized blocks.

    Checkpoint retention: ``unpersist()`` is a NO-OP on a checkpointed
    frame (the blocks never enter the cache manager), so a long run
    would otherwise accumulate one block set per checkpoint until
    driver GC. Each new eager checkpoint therefore explicitly frees
    the previous one's blocks via its plan's RDD handle — at most one
    checkpoint generation is ever live. Frees only happen when the new
    checkpoint is materialized, because intermediate persisted rounds
    keep the last checkpoint in their lineage. (localCheckpoint is
    deliberately non-reliable: executor loss invalidates it — the
    documented trade for zero checkpoint-dir I/O; pass a checkpoint
    dir and switch to reliable checkpoint() on fault-tolerant runs.)
    """
    checkpoint_every = 4
    prev_ckpt = None
    # localCheckpoint, NOT persist: persist caches the DATA but every
    # iteration's join (and its `changed` count action) would still
    # re-analyze the full logical plan behind `pairs` — for LSH-derived
    # pairs that subtree is the whole minhash pipeline, and the
    # per-iteration Catalyst cost dominated end-to-end time (measured
    # at sf0.1: 34.8 s for 256 pairs with persist, ~3 s flattened).
    # The edge list is pair-sized — far smaller than the corpus.
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Small-graph fast path: every fixpoint round below is 3 joins + a
    # count ACTION, and at near-dup pair volumes (the answer-sized
    # graph, hundreds to thousands of edges) the per-round JOB
    # SCHEDULING cost dominates the data cost by orders of magnitude —
    # measured 12.4s for a 368-edge graph at sf0.1, ~0.2s via driver
    # union-find. The collect is BOUNDED by the explicit edge-count
    # gate (200k edges ~ 3 MB of longs — the documented
    # thresholded-collect exception, same class as the centroid
    # tables); above the gate the distributed loop below runs
    # unchanged, so 100 TB pair graphs never touch the driver. Labels
    # are identical by construction: union-by-min-root makes each
    # component's root its min id — the same min-label fixpoint the
    # distributed rounds converge to.
    n_edges = edges.count()
    if n_edges <= small_graph_max_edges:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        rows = edges.collect()
        for row in rows:
            ra, rb = find(row["src"]), find(row["dst"])
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = {row["src"] for row in rows}
        spark = pairs.sparkSession
        src_type = edges.schema["src"].dataType
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", src_type),
                T.StructField("cluster_id", src_type),
            ]
        )
        return local_rows(spark, 
            [(n, find(n)) for n in sorted(nodes)], schema
        )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .persist()
    )
    for i in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        propagated = labels.join(
            neighbor_min, labels["doc_id"] == neighbor_min["src"], "left"
        ).select(
            "doc_id",
            F.least(
                F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        # Pointer doubling (shortcutting): label(x) <- label(label(x)).
        # A label is always the id of some node in x's component, so
        # its own label is a smaller-or-equal member id — one extra
        # node-table self-join per round turns O(diameter) convergence
        # into O(log diameter). Without it, a chain-shaped component
        # longer than max_iters hops silently keeps stale labels —
        # exactly what the sf1 embeddings graph (tau=0.4 percolates
        # into long chains) exposed against the recursive-CTE oracle;
        # LSH near-clique clusters never showed it.
        parent = propagated.select(
            F.col("doc_id").alias("cluster_id"), F.col("cluster_id").alias("__p")
        )
        new_labels = (
            propagated.join(parent, "cluster_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("__p"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                _free_local_checkpoint(prev_ckpt)
            prev_ckpt = new_labels
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        # With pointer doubling, max_iters=20 covers diameters up to
        # ~2^20; hitting the cap unconverged means something is deeply
        # wrong — fail loudly rather than return stale labels (the
        # silent-wrong mode the sf1 sweep caught pre-doubling).
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    # edges is localCheckpoint-ed: unpersist() would be a no-op (the
    # blocks never enter the cache manager) — those blocks release when
    # the RDD handle is GC'd. The LABELS generation, however, may exit
    # the loop as a plain persist (off a checkpoint boundary): finalize
    # it so the cache-manager entry never outlives the call (house
    # finalize rule, r5 brief #4) — the eager checkpoint also cuts the
    # lineage back into edges/prev generations, making the unpersist
    # safe under eviction.
    out = labels.localCheckpoint(eager=True)
    labels.unpersist()  # no-op when the last generation was checkpointed
    return out


def keep_canonical(docs: DataFrame, components: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Drop near-duplicates: keep only each cluster's min-id doc (and
    all docs that are in no dup cluster)."""
    losers = components.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(
        F.broadcast(losers.withColumnRenamed("doc_id", id_col)), id_col, "left_anti"
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(sigs: DataFrame, doc_id: str = "doc_id",
                       max_hamming: int = 3, n_bands: int = 4) -> DataFrame:
    """Near-duplicate pairs within a Hamming radius over SimHash
    fingerprints, blocked by bit-bands (Manku, Jain & Das Sarma 2007's
    web-crawl dedup scheme, recast as a band equi-join).

    Split the 64-bit fingerprint into 4 disjoint 16-bit bands; any pair
    within distance ``max_hamming`` <= 3 agrees EXACTLY on >= 1 band
    (pigeonhole: 3 differing bits can touch at most 3 of the 4 bands)
    -> per-band equi-join on (band, band_key) instead of an O(n^2)
    cross join. The join emits each qualifying pair once per agreeing
    band (<= 4 copies); the Hamming verifier runs BEFORE the distinct,
    so candidates that fail the radius — the overwhelming majority at
    scale, since a 16-bit band agreement is coincidental for unrelated
    docs — are dropped map-side and never reach the dedup shuffle,
    whose volume is then <= 4x the true answer, not the candidate set.

    Exactness requires ``max_hamming`` <= ``n_bands`` - 1; guarded.
    ``n_bands`` must divide 64. This parameterization IS Manku's
    band/radius trade: a larger radius needs more (hence narrower)
    bands, and each halving of band width multiplies coincidental
    collisions by 2^(width/2)... i.e. radius 6-7 costs the 8x8-bit
    layout's ~n^2/2048 candidate term — inherent to the recall target,
    not a layout accident (Manku's sorted permutation tables spend
    memory on exactly this). Default radius <= 3 keeps 16-bit bands.

    Scale bound (default layout): 4 x 2^16 band buckets put the
    coincidental-collision term at ~n^2/2^18 — 256x below the r6
    4x8-bit layout, whose measured n^2/1024 growth (1.2s -> 19.2s ->
    34.3s at sf0.1/1/2) was the dominant cost from ~10^6 docs. The
    16-bit widening (r7) pushes the crossover to ~10^8 docs. The
    arithmetic vs logical shift question for the sign-carrying top
    band is moot: the band mask keeps exactly the band's bits under
    both conventions, so Spark and DuckDB band keys agree on negative
    fingerprints.
    """
    if SIMHASH_BITS % n_bands:
        raise ValueError(f"n_bands must divide {SIMHASH_BITS}; got {n_bands}")
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"{n_bands}-band blocking is only exact for max_hamming <= "
            f"{n_bands - 1}; got {max_hamming}"
        )
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    bands = sigs.select(
        F.col(doc_id),
        F.col("simhash"),
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        # SQL form: the PySpark shiftright wrapper only takes a literal
        # shift amount, not a per-row Column
        "band_key",
        F.expr(f"shiftright(simhash, band * {width}) & {mask}"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{doc_id}") < F.col(f"b.{doc_id}")),
        )
        .select(
            F.col(f"a.{doc_id}").alias("doc_a"),
            F.col(f"b.{doc_id}").alias("doc_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def canonical_selection(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """Resolve near-dup clusters to a keep/replace map: every document
    gets the canonical id of its cluster — the member with the LONGEST
    content (``length_col`` desc, tie-break lowest id; "keep the
    longest variant" is the standard near-dup resolution: truncated or
    stripped copies lose to the fullest one). Docs in no cluster are
    their own canonical. Emits (doc_id, canonical_id, kept) — the
    final dedup step a training pipeline applies after
    minhash_lsh_dedup + connected_components found the clusters.

    Scale notes: builds on :func:`connected_components` (distributed
    label propagation, bounded lineage); the canonical pick is one
    row_number window partitioned by cluster_id — cluster-sized
    partitions (near-cliques, small by construction), then an
    AQE-broadcastable join of the (cluster -> canonical) table back to
    the cluster membership, and a final left join on the doc key. No
    driver materialization; no full-corpus window.
    """
    from pyspark.sql import Window

    # Flatten the component labels to a LogicalRDD before fanning out:
    # this plan references cc FOUR times (sized, canon, resolved, and
    # the final join), and cc's own plan is iterations-deep over the
    # full pair-generation subtree — without the checkpoint, Catalyst
    # re-analyzes that tree per reference (measured ~85 s of fixed
    # plan-analysis at ANY data size; 19 s after). The checkpointed
    # frame holds only clustered docs — dup-cluster membership, far
    # smaller than the corpus.
    cc = connected_components(pairs).localCheckpoint(eager=True)
    sized = cc.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(length_col).alias("__len")),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("__len"), "doc_id")
    canon = (
        sized.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("__canon"))
    )
    resolved = cc.join(canon, "cluster_id").select(
        "doc_id", F.col("__canon").alias("canonical_id")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(resolved, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("canonical_id", F.col("doc_id")).alias("canonical_id"),
            (F.coalesce("canonical_id", F.col("doc_id")) == F.col("doc_id")).alias(
                "kept"
            ),
        )
    )

def pagerank_scores(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b",
    iters: int = 4, scale: int = 1_000_000,
) -> DataFrame:
    """PageRank over an undirected pair graph -> (doc_id, score), made
    hash-checkable by INTEGER-SCALED power iteration — the
    determinize-the-risky-stages move applied to graph centrality.
    Float PageRank is engine-sensitive (summation order moves ulps);
    here rank mass is an integer multiple of 1/scale and every round
    is: share = floor(r / degree), incoming = SUM(shares) (exact int),
    r' = floor(0.15*scale) + floor(0.85 * incoming). The only float
    ops are divisions/multiplications of exactly-representable
    integers (< 2^53) by the same literals — correctly-rounded IEEE,
    bit-identical across engines — and each is floored immediately, so
    any engine replays the identical integer sequence. Fixed ``iters``
    (no convergence action): the oracle unrolls the same rounds as
    chained CTEs.

    Scale shape: each round is one equi-join of the edge list with the
    rank table + a partial-agg sum — never materializes anything
    larger than edges; rounds are data-independent jobs (no per-round
    driver action, unlike the CC fixpoint), so 100 TB pair graphs run
    iters chained shuffles.
    """
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = int(0.15 * scale)
    # Small-graph fast path (r11) — the connected_components precedent,
    # same 200k-edge bounded-collect gate: each distributed round is 2
    # joins + an agg + an eager checkpoint, ~5 AQE stage-jobs of pure
    # scheduler latency at near-dup pair volumes (the whole key
    # measured 52 jobs / 4.8 s at sf0.1 with 2.4 s of it BETWEEN jobs).
    # The driver replay reproduces the integer sequence BIT-IDENTICALLY
    # because every step is exact: share = floor(r/d) with r, d < 2^53
    # (one correctly-rounded double divide, floored — math.floor(r/d)
    # IS that), incoming an exact int sum, r' = base +
    # floor(0.85*incoming) the same one rounded double multiply. Above
    # the gate the distributed loop below runs unchanged, so 100 TB
    # pair graphs never touch the driver.
    if edges.count() <= 200_000:
        import math
        from collections import Counter, defaultdict

        rows = edges.collect()
        deg_m = Counter(row["src"] for row in rows)
        r_m = {n: scale for n in deg_m}
        for _ in range(iters):
            sh = {n: math.floor(r_m[n] / deg_m[n]) for n in deg_m}
            inc: dict = defaultdict(int)
            for row in rows:
                inc[row["dst"]] += sh[row["src"]]
            r_m = {n: base + math.floor(0.85 * inc.get(n, 0)) for n in deg_m}
        from pyspark.sql import types as T

        id_type = edges.schema["src"].dataType
        schema = T.StructType(
            [
                T.StructField("doc_id", id_type),
                T.StructField("score", T.LongType()),
            ]
        )
        return local_rows(pairs.sparkSession, 
            [(n, r_m[n]) for n in sorted(deg_m)], schema
        )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    r = deg.select(F.col("src").alias("doc_id"), F.lit(scale).cast("long").alias("r"))
    prev_ckpt = None
    for _ in range(iters):
        share = (
            r.join(deg, r["doc_id"] == deg["src"])
            .select("doc_id", F.floor(F.col("r") / F.col("d")).alias("sh"))
        )
        incoming = (
            edges.join(share, edges["src"] == share["doc_id"])
            .groupBy("dst")
            .agg(F.sum("sh").alias("inc"))
        )
        r = (
            deg.select(F.col("src").alias("doc_id"))
            .join(incoming, F.col("doc_id") == incoming["dst"], "left")
            .select(
                "doc_id",
                (
                    F.lit(base)
                    + F.floor(F.lit(0.85) * F.coalesce(F.col("inc"), F.lit(0)))
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        if prev_ckpt is not None:
            _free_local_checkpoint(prev_ckpt)
        prev_ckpt = r
    return r.select("doc_id", F.col("r").alias("score"))


def triangle_counts(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected pair graph — the dup-graph diagnostic that separates
    TEMPLATE FAMILIES (near-cliques: high clustering, every member
    pairs with every other) from CHAINS of pairwise-similar drift
    (low clustering), which tells a dedup pipeline whether min-id /
    centrality canonical selection is collapsing one document family
    or accidentally bridging distinct ones. Returns one row per node:
    (doc_id, degree, n_triangles, clustering) with clustering =
    round(2T / (d*(d-1)), 4) (0.0 for degree < 2 — exact division of
    small ints, cross-engine safe).

    Scale shape — the ORIENTED edge-iterator algorithm (node-ordered
    edges u < v, the MapReduce-era standard): triangles are found by
    joining the oriented edge list with itself on the middle vertex
    and probing the closing edge — two equi-joins on edge keys, never
    an n-wise product; work is bounded by sum-over-edges of
    min-degree, the edge-iterator bound. Each triangle x<y<z is
    produced exactly once, then fanned out to its three corners with
    one explode + partial-agg count. On blocked dup graphs (LSH /
    SimHash bands) the edge list is answer-scale, so this runs as two
    broadcast-or-shuffle equi-joins at any corpus size.
    """
    e = (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)  # referenced 3x below
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
        .join(
            e.alias("e3"),
            (F.col("x") == F.col("e3.u")) & (F.col("z") == F.col("e3.v")),
        )
        .select("x", "y", "z")
    )
    per_node_t = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e.select(F.col("u").alias("doc_id"))
        .union(e.select(F.col("v").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    return deg.join(per_node_t, "doc_id", "left").select(
        "doc_id",
        F.col("degree").cast("long").alias("degree"),
        t.alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                (2 * t) / (F.col("degree") * (F.col("degree") - 1)), 4
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def pagerank_canonical(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", iters: int = 4
) -> DataFrame:
    """Importance-ranked canonical selection: within each near-dup
    component keep the most CENTRAL member (highest integer PageRank,
    ties on min id) instead of blindly the min id — the web-dedup
    heuristic that the most-linked version of a page is the best
    representative. Returns one row per node in the dup graph:
    (doc_id, cluster_id, score, keep). Docs in no dup pair trivially
    keep and are out of scope here (same contract as the pair stage).

    The pair stream is flattened ONCE up front: both consumers below
    (the CC fixpoint and the rank rounds' edge build) would otherwise
    re-evaluate the caller's pair-generation subtree — for the exact
    embedding key that subtree is the quadratic all-pairs matmul, and
    the double evaluation was the dominant term in the r10 isolated
    sf2 row (measured: 91.6 s -> 35.2 s sf2, 26.2 -> 7.9 s sf1,
    SCALING_ISOLATED_r10.json; the pair OUTPUT is small by
    construction, 4.3k rows at sf2, so the checkpoint is cheap —
    the iterative-lineage lesson)."""
    pairs = pairs.localCheckpoint(eager=True)
    comps = connected_components(pairs, a=a, b=b)
    scores = pagerank_scores(pairs, a=a, b=b, iters=iters)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        comps.join(scores, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "score", "keep")
    )
