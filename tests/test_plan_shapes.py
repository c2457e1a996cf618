"""Plan-shape regression tests — lock in the physical-plan properties
the 100 TB design depends on (PERF_NOTES plan audit)."""

from __future__ import annotations

from streamforge_data_pipeline_spark.registry import REGISTRY

from tests.conftest import SF_SMALL


def _plan(spark, key: str) -> str:
    df = REGISTRY[key].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_eq_filter_pushes_predicate_to_scan(spark):
    plan = _plan(spark, "eq_filter")
    assert "PushedFilters" in plan
    assert "EqualTo(o_orderstatus,F)" in plan


def test_id_projection_prunes_to_single_column(spark):
    plan = _plan(spark, "id_projection")
    assert "ReadSchema: struct<c_custkey:bigint>" in plan


def test_region_sales_broadcasts_all_dims(spark):
    plan = _plan(spark, "region_sales")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_error_counts_broadcasts_existing_ids(spark):
    plan = _plan(spark, "error_counts")
    assert "BroadcastHashJoin" in plan


def test_validate_has_no_python_udf(spark):
    # the hot path must stay in JVM expressions (SURVEY §4 design rule)
    plan = _plan(spark, "validate")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_volume_shipping_broadcasts_both_nation_roles(spark):
    plan = _plan(spark, "volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_top_k_uses_take_ordered_not_global_window(spark):
    # orderBy+limit must compile to TakeOrderedAndProject; a global
    # row_number window would single-partition the whole aggregate.
    for key in ("top_revenue", "returned_items"):
        plan = _plan(spark, key)
        assert "TakeOrderedAndProject" in plan, key


def test_disjunctive_predicate_reaches_part_scan(spark):
    plan = _plan(spark, "disjunctive_revenue")
    # The OR-of-conjunctions on p_type/p_size must appear in the part
    # scan's data filters, not only as a post-join filter.
    assert "Or(" in plan or " OR " in plan


def test_promo_revenue_prunes_lineitem_columns(spark):
    plan = _plan(spark, "promo_revenue")
    for line in plan.splitlines():
        if "FileScan" in line and "l_partkey" in line:
            assert "l_tax" not in line and "l_returnflag" not in line
            break
    else:
        raise AssertionError("no lineitem scan found")


def test_curate_corpus_single_scan_no_joins(spark):
    # fused enrich(): lang + tokens + quality from ONE projection —
    # a regression to the lang_id/quality join form re-scans 3x
    plan = _plan(spark, "curate_corpus")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_range_join_builds_on_bands_side(spark):
    # stats misestimates at small SF must not broadcast the probe side
    plan = _plan(spark, "range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BuildRight" in plan


def test_asof_join_single_shuffle_no_join(spark):
    # union + last-value window: no join operator, one key Exchange
    plan = _plan(spark, "asof_join")
    assert "Join" not in plan


def test_inverted_index_bounds_postings_before_agg(spark):
    """Stopword-heavy corpus: a term in EVERY doc must never feed more
    than max_postings ids into the collect_list (the 100 TB skew
    guard). The cap lives INSIDE the aggregate as CASE WHEN rn <= k,
    so per-group state is bounded even when doc frequency is not."""
    from streamforge_data_pipeline_spark.operators.text import inverted_index

    n_docs, cap = 500, 5
    docs = spark.range(n_docs).selectExpr(
        "id AS doc_id",
        # 'the' appears in all 500 docs; uniq<id> in exactly one
        "concat('the quick uniq', CAST(id AS STRING)) AS text",
    )
    out = inverted_index(docs, min_df=1, max_postings=cap)
    rows = {r["term"]: r for r in out.collect()}
    assert rows["the"]["n_docs"] == n_docs
    assert rows["the"]["postings"] == "0,1,2,3,4"  # first `cap` sorted ids
    assert rows["uniq7"]["n_docs"] == 1 and rows["uniq7"]["postings"] == "7"

    # plan shape: the collected expression is conditional on the
    # row_number rank — an unconditional collect_list(doc_id) would be
    # the unbounded-array regression this test exists to catch
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    collects = re.findall(r"collect_list\([^)]*\)", plan)
    assert collects and all("CASE WHEN" in c for c in collects), plan


def test_new_text_ops_stay_jvm_side(spark):
    # r4 corpus ops: tokenize/count/window work must be codegen'd
    # column expressions — no Python in any hot path.
    for key in ("dup_ngram_fraction", "line_dedup", "ngram_lm_score",
                "vocab_coverage"):
        plan = _plan(spark, key)
        assert "BatchEvalPython" not in plan, key
        assert "ArrowEvalPython" not in plan, key
        assert "CartesianProduct" not in plan, key


def test_line_dedup_no_window_over_raw_line(spark):
    # The r5 de-skew: first occurrence must come from an aggregation
    # (map-side partial combine collapses hot boilerplate lines), NEVER
    # a Window partitioned by the raw line value — a window partition
    # is un-splittable, so a corpus-hot line would serialize one task.
    plan = _plan(spark, "line_dedup")
    assert "Window" not in plan, plan
    # and the first-occurrence agg must have a partial (map-side) pass
    assert "partial_min" in plan or "partial min" in plan.lower(), plan


def test_ngram_lm_score_broadcasts_vocab_scalar(spark):
    # V rides in as a broadcast 1-row relation, never a collect; the
    # count-table joins must not degrade to a cartesian.
    plan = _plan(spark, "ngram_lm_score")
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row V crossJoin
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_vocab_coverage_uses_take_ordered_heap(spark):
    # top-k must be per-partition heaps; the cumulative window then
    # touches only k rows.
    plan = _plan(spark, "vocab_coverage")
    assert "TakeOrderedAndProject" in plan


def test_span_winnow_ops_stay_jvm_and_doc_partitioned(spark):
    # r5 passage ops: no Python, no cartesian, and every Window node
    # partitions by doc_id (bounded by document length) — never by a
    # corpus-frequency key like the gram or fingerprint value, which
    # would recreate the un-splittable hot-key skew line_dedup's fix
    # removed.
    import re

    for key in ("dup_span_removal", "winnow_overlap"):
        plan = _plan(spark, key)
        assert "BatchEvalPython" not in plan, key
        assert "ArrowEvalPython" not in plan, key
        assert "CartesianProduct" not in plan, key
        for w in re.findall(r"Window \[.*", plan):
            assert "doc_id" in w, (key, w)


def test_quality_threshold_prune_windows_ride_the_histogram(spark):
    # The r5 calibration cut: both windows must consume the (source,
    # quality) HISTOGRAM — their ordered/aggregated column is the
    # histogram count, never a per-doc rank — and the threshold map-back
    # must be a broadcast join. percent_rank anywhere means the plan
    # regressed to quality_prune's per-doc window.
    import re

    plan = _plan(spark, "quality_threshold_prune")
    assert "percent_rank" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    for w in re.findall(r"Window \[.*", plan):
        assert "cnt" in w, w
    # histogram build gets a map-side partial pass
    assert "partial_count" in plan or "partial count" in plan.lower(), plan


def test_source_overlap_aggregates_before_the_pair_join(spark):
    # distinct (source, shingle) must collapse with partial aggregation
    # BEFORE the self-join, and the size map-backs must broadcast; no
    # Python, no cartesian.
    plan = _plan(spark, "source_overlap")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_bm25_topk_pushes_partial_window_group_limit(spark):
    # Per-query top-k relies on Catalyst's rank-limit pushdown: a
    # PARTIAL WindowGroupLimit below the exchange caps every map
    # partition at k rows, so the single per-query reducer receives
    # k * n_partitions rows, not the whole matched corpus. Also: tiny
    # sides broadcast, corpus work stays in JVM expressions.
    plan = _plan(spark, "bm25_topk")
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("WindowGroupLimit", 2)[-1] or \
        plan.count("WindowGroupLimit") >= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_heavy_hitters_uses_topk_heap_not_global_sort(spark):
    # skew profiler: top-k must be TakeOrderedAndProject heaps; the
    # total must arrive as the 1-row broadcast (a single BNLJ), and the
    # key counts must partial-aggregate map-side.
    plan = _plan(spark, "heavy_hitters")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "partial_count" in plan or "partial count" in plan.lower(), plan


def test_simhash_near_dup_band_join_is_equi_not_nlj(spark):
    """The Manku band blocking exists to REPLACE the O(n^2) cross join;
    the (band, band_key) equalities must reach the join as equi-keys,
    with doc_a < doc_b only as a residual condition — a plan that
    degrades to a nested-loop product defeats the operator."""
    plan = _plan(spark, "simhash_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_estimate_no_cartesian_no_python_rows(spark):
    """The calibration key's pair stage must be the band equi-join +
    candidate semi-joins — never a cartesian — and the estimator must
    stay in JVM expressions (no row-at-a-time Python)."""
    plan = _plan(spark, "minhash_estimate")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_simhash_radius6_band_equijoin(spark):
    """The 8-band layout still candidates through a hash equi-join on
    (band, band_key) — widening the radius must not degrade the join
    strategy to nested-loop."""
    plan = _plan(spark, "simhash_near_dup_radius6")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "hamming" in plan  # verifier present before the distinct


def test_domain_caps_is_jvm_only_single_window(spark):
    """The cap is one domain-partitioned window over a narrow regexp
    projection — no Python UDFs anywhere, exactly one window node."""
    plan = _plan(spark, "domain_caps")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("RunningWindowFunction") + plan.count("Window") >= 1


def test_shard_manifest_has_partial_aggregation(spark):
    """The manifest agg must map-side combine (HashAggregate partial ->
    final), so a hot shard never concentrates raw rows on a reducer."""
    plan = _plan(spark, "shard_manifest")
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_retention_curve_grid_join_is_broadcast(spark):
    """The 9-row threshold grid joins via broadcast (nested-loop on
    the <= condition) — the corpus is never shuffled for the grid."""
    plan = _plan(spark, "quality_retention_curve")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan.split("BroadcastNestedLoopJoin")[1][:500]


def test_triangle_counts_joins_stay_on_edge_keys(spark):
    """Triangle enumeration is equi-joins on edge endpoints — no
    cartesian product may appear in the plan."""
    plan = _plan(spark, "triangle_counts")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pii_scrub_multi_is_pure_projection(spark):
    """The scrub is a map-only projection: no shuffle (Exchange) except
    the scan-side none, no UDFs — the shape that scrubs 100 TB."""
    plan = _plan(spark, "pii_scrub_multi")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


# --- the registry-wide quadratic-join-shape gate (r8 VERDICT #6) -----------

# Keys whose physical plan legitimately contains a
# BroadcastNestedLoopJoin: every one is the documented 1-row broadcast
# scalar idiom (a corpus-total/threshold aggregate crossJoin'd into the
# projection — the CORRECT plan for a scalar subquery, and bounded by
# construction). Anything NEW that plans a BNLJ or a CartesianProduct
# fails this gate until reviewed and either re-planned or allowlisted
# here with its reason.
BNLJ_ALLOWLIST = {
    "bm25_topk",              # corpus stats (N, avgdl) 1-row broadcast
    "decayed_event_counts",   # max-day clock 1-row broadcast
    "domain_share",           # corpus total 1-row broadcast
    "embedding_norm_outliers",  # mean/std moments 1-row broadcast
    "hard_negatives",         # few-queries crossJoin (similarity.py idiom)
    "heavy_hitters",          # total-count 1-row broadcast
    "heavy_hitters_sketch",   # total-count 1-row broadcast
    "idle_rich_customers",    # scalar threshold subquery
    "ngram_lm_score",         # corpus LM totals 1-row broadcast
    "quality_retention_curve",  # corpus total 1-row broadcast
    "scalar_subquery",        # the scalar-subquery key itself
    "source_mixture_weights",  # temperature normalizer 1-row broadcast
    "topk_cosine",            # few-queries crossJoin (similarity.py:36)
    "vocab_coverage",         # token total 1-row broadcast
}


def test_registry_wide_no_quadratic_join_shapes(spark):
    """Sweep EVERY registry key's executed plan at sf0.001: no
    CartesianProduct ever; BroadcastNestedLoopJoin only on the
    reviewed 1-row-broadcast allowlist. Streaming drain keys surface
    their batch-side read plan (their per-batch plans are pinned by
    their own module tests); the gate still catches any key whose
    COMPOSED output plan goes quadratic."""
    offenders = {}
    for key in sorted(REGISTRY):
        plan = _plan(spark, key)
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and key not in BNLJ_ALLOWLIST:
            bad.append("BroadcastNestedLoopJoin")
        if bad:
            offenders[key] = bad
    assert not offenders, offenders
