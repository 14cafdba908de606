#!/usr/bin/env python
"""Physical-plan audit: print formatted plans for the headline queries
and flag scale hazards (missing filter pushdown, unexpected
sort-merge joins of small dims, full-column scans, cartesian
products).

    python tools/explain_audit.py [names...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tool_rep_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


# queries where an all-pairs/nested-loop shape is the intended
# algorithm (bounded by tiny query/centroid sides), or where the
# cross join is against a single-row broadcast aggregate (scalar
# attach: hll merged estimate, fused constraint counters)
_NESTED_LOOP_OK = {"embedding_knn", "embedding_near_dup", "ann_ivf_knn",
                   "theta_join_range", "hll_sketch_merge",
                   "validate_constraints",
                   # tiny bin grid: distinct event_types x range(10)
                   "psi_drift",
                   # scalar attach: broadcast 1-row aggregate crossJoin
                   # (in-plan corpus stats / totals / prefix offsets —
                   # the round-3 replacement for driver-side collects;
                   # the "nested loop" side is one row by construction)
                   "bm25_search", "tfidf_topk", "heavy_hitters",
                   "equidepth_bins", "skyline_pareto", "vocab_growth",
                   "market_basket", "triangle_count", "mixture_weights",
                   "temperature_resample", "unigram_logprob",
                   "tpch_q11_important_stock", "tpch_q22_idle_customers",
                   "tpch_q15_top_supplier", "ratio_to_report",
                   "approx_distinct", "groupby_agg",
                   # tier-17 scalar attaches: KS max-gap + sample sizes,
                   # degree-histogram total (1-row aggregates, audited
                   # <=1-row bound below like every entry here)
                   "ks_test", "degree_distribution",
                   # two-stage rerank: per-query candidate lists are
                   # broadcast-sized by construction
                   "mmr_rerank",
                   # PQ ADC scan: corpus codes x broadcast query LUTs
                   # (the != self condition makes it an NLJ; the query
                   # side is explicitly broadcast and tiny)
                   "ann_pq_knn",
                   # tier-19 scalar attaches: Benford grand total,
                   # DSIR corpus totals (1-row broadcast aggregates)
                   "benford_digits", "dsir_weights",
                   # per-round merge decision: one 3-column row
                   # broadcast-attached to the vocab rewrite
                   "bpe_merge_train",
                   # node count attached as a broadcast 1-row
                   # aggregate each damping round
                   "pagerank_exact",
                   # tier-26 scalar attaches: date-midpoint pivot and
                   # old/new totals (two 1-row broadcast aggregates)
                   "schema_drift_report",
                   # tier-27/28 dimension completions + scalar
                   # attaches: t-closeness crosses the QI-class census
                   # with the |segments|-row global distribution and a
                   # 1-row total; theil-sen attaches the 1-row max-day
                   # pivot; blocking-recall combines three 1-row pair
                   # counts; chi2 completes the r x c grid from two
                   # dimension-sized marginals + 1-row total/dims;
                   # doc-perplexity attaches the 1-row corpus (T, V)
                   "t_closeness_census", "theil_sen_trend",
                   "blocking_recall", "chi2_independence",
                   "doc_perplexity",
                   # tier-30: WoE attaches a 1-row good/bad total;
                   # the stump crosses rows with the 9-threshold
                   # candidate broadcast (|rows| x 9 by design, the
                   # pre-bucketed variant keeps the same plan); NB
                   # fans tokens out |classes| ways via an explicit
                   # tiny-dimension broadcast cross
                   "woe_encoding", "decision_stump_train",
                   "naive_bayes_score",
                   # tier-31 iterative scalar attaches: PCA rescales
                   # the 64-row vector by a broadcast 1-row max each
                   # round and attaches 1-row Rayleigh num/den;
                   # the perceptron attaches the 1-row weight triple
                   # and 3-number gradient per epoch
                   "pca_top_component", "perceptron_train",
                   # tier-32: the CV stump crosses rows with the
                   # broadcast 5-fold dimension and the per-fold
                   # 9-candidate broadcast — both tiny by design
                   "stump_cv",
                   # tier-33 scalar attaches: QN attaches the 1-row
                   # global N; Kneser-Ney attaches the 1-row bigram
                   # type total
                   "quantile_normalization", "kneser_ney_bigram",
                   # tier-34: the radius join crosses cells with the
                   # broadcast 9-row offset grid (the provably-
                   # complete neighbor search); the rollup fans rows
                   # into the broadcast 3-row zoom dimension
                   "spatial_radius_join", "spatial_cell_rollup",
                   # tier-35 scalar attach: chi2 feature selection
                   # attaches the 1-row total-document count
                   "chi2_feature_select",
                   # tier-36: hill joins the 3-row broadcast k
                   # dimension against the ranked head with rank
                   # inequalities (negative_sampling left this list
                   # in round 8: the hash-range cut is now a bucket
                   # EQUI-join, no NLJ in the plan)
                   "tail_index_hill",
                   # tier-37 scalar attaches: markov rescales by a
                   # 1-row total each round and attaches the 1-row
                   # entropy rate; dispersion attaches the 1-row
                   # document count
                   "markov_stationary_exact", "token_dispersion",
                   # tier-39 scalar attaches: theta / the 2x2 DiD
                   # means are 1-row broadcast aggregates crossed
                   # onto dimension-sized frames
                   "cuped_adjustment", "diff_in_diff",
                   # operators/rank.py triangular offset join: the
                   # per-(bucket, group) totals frame is nbuckets x
                   # ngroups rows (metadata-sized), broadcast on both
                   # sides; the bucket inequality makes it NLJ-shaped
                   "decile_lift", "mann_whitney_u"}
# queries intentionally scanning whole small tables w/o filters
_NO_FILTER_OK = True  # pushdown flagged only when a filter exists

# queries where an UNPARTITIONED window (global sort) is acceptable
# because the frame it consumes is tiny by construction but not
# provably so from the plan alone (post-aggregation frames whose
# Aggregate is hidden behind a join/union, dimension-sized inputs).
# Every entry must state the bound.
_GLOBAL_WINDOW_OK = {
    # 15-row cell census (3 flags x 5 segments) — post-agg
    "mutual_information",
    # 10-row decile frame cumulated after the bucketed rank
    "decile_lift",
    # <=9 candidate thresholds ranked to pick argmin
    "decision_stump_train",
    # k-row model frames (centroid ids, component ranks)
    "kmeans_exact", "pca_top_component",
    # nation/region-dimension frames (25 rows)
    "tpch_q8_market_share",
}

# logical node wrappers that don't change a subtree's row bound
_TRANSPARENT = {"Project", "Filter", "SubqueryAlias", "ResolvedHint",
                "Repartition", "RepartitionByExpression", "Sort",
                "WithCTE", "CTERelationRef", "Window"}


def _unwrap(node):
    while node.getClass().getSimpleName() in _TRANSPARENT \
            and node.children().size() == 1:
        node = node.children().apply(0)
    return node


def _is_scalar_side(node) -> bool:
    """True when the subtree is <=1 row by construction: a
    grouping-free Aggregate (scalar attach) or limit(1)."""
    node = _unwrap(node)
    cls = node.getClass().getSimpleName()
    if cls == "Aggregate":
        return node.groupingExpressions().isEmpty()
    if cls in ("GlobalLimit", "LocalLimit"):
        try:
            return int(node.limitExpr().toString()) <= 1
        except ValueError:
            return False
    if cls == "OneRowRelation":
        return True
    return False


def _has_broadcast_hint(join, side: str) -> bool:
    opt = join.hint().leftHint() if side == "left" \
        else join.hint().rightHint()
    return opt.isDefined() and "broadcast" in \
        opt.get().toString().lower()


def audit_cross_sides(df) -> list[str]:
    """Walk the optimized logical plan; every cross/condition-less
    join must have a side that is provably <=1 row (scalar attach) or
    explicitly broadcast (bounded-by-construction rerank/knn query
    sets). This runs on ALLOWLISTED queries too — the allowlist
    permits the join shape, not an unbounded cartesian."""
    bad = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
        if node.getClass().getSimpleName() != "Join":
            continue
        cross = (node.joinType().toString() == "Cross"
                 or not node.condition().isDefined())
        if not cross:
            continue
        ok = (_is_scalar_side(node.left())
              or _is_scalar_side(node.right())
              or _has_broadcast_hint(node, "left")
              or _has_broadcast_hint(node, "right"))
        if not ok:
            sides = "{} x {}".format(
                _unwrap(node.left()).getClass().getSimpleName(),
                _unwrap(node.right()).getClass().getSimpleName())
            bad.append(f"unbounded cross join: {sides}")
    return bad


def _is_small_frame(node) -> bool:
    """True when the subtree is bounded-small by construction: any
    Aggregate on the spine (post-aggregation census frames), a
    GlobalLimit/LocalLimit, a OneRowRelation, or a LocalRelation
    (literal dimension). Joins/unions of small frames are small."""
    node = _unwrap(node)
    cls = node.getClass().getSimpleName()
    if cls == "Aggregate":
        return True
    if cls in ("GlobalLimit", "LocalLimit", "OneRowRelation",
               "LocalRelation", "Range"):
        # a limit bounds the frame no matter what feeds it
        return True
    if cls in ("Expand", "Generate", "Pivot", "Unpivot",
               "Deduplicate", "Distinct"):
        # constant fan-out over a small frame stays small
        return all(_is_small_frame(node.children().apply(i))
                   for i in range(node.children().size()))
    if cls in ("Join", "Union", "Intersect", "Except"):
        return all(_is_small_frame(node.children().apply(i))
                   for i in range(node.children().size()))
    return False


def audit_window_partitions(name: str, df) -> list[str]:
    """Round-7 verdict item #3: flag any Window node whose partition
    spec is EMPTY (global sort — 'Moving all data to a single
    partition') unless the frame it consumes is provably small
    (post-aggregation / limited / literal) or the query is
    allowlisted with a stated bound."""
    if name in _GLOBAL_WINDOW_OK:
        return []
    bad = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
        if node.getClass().getSimpleName() != "Window":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        if _is_small_frame(node.child()):
            continue
        bad.append("unpartitioned Window over a non-aggregate frame "
                   "(single-task global sort at scale)")
    return bad


def audit_plan(name: str, plan: str) -> list[str]:
    flags = []
    if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) \
            and name not in _NESTED_LOOP_OK:
        flags.append("nested-loop/cartesian join (unexpected)")
    n_exch = len(re.findall(r"Exchange hashpartitioning", plan))
    if n_exch > 5:
        flags.append(f"{n_exch} hash exchanges")
    if "SortMergeJoin" in plan and ("broadcast" in name
                                    or "lookup" in name):
        flags.append("SortMergeJoin where broadcast expected")
    if "Filter (" in plan and "Scan parquet" in plan \
            and "PushedFilters: []" in plan:
        flags.append("filter present but nothing pushed to scan")
    if re.search(r"BatchEvalPython", plan):
        flags.append("row-at-a-time Python UDF in plan")
    return flags


def formatted_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    try:
        return jqe.explainString(
            df._sc._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
    except Exception:  # noqa: BLE001 — fall back to simple string
        return jqe.executedPlan().toString()


def main() -> None:
    spark = get_spark("explain_audit")
    from etl_tool_rep_spark.queries import QUERIES

    names = sys.argv[1:] or sorted(QUERIES)
    failures = 0
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = formatted_plan(df)
        flags = audit_plan(name, plan)
        cross_bad = audit_cross_sides(df)
        if cross_bad:
            failures += 1
            flags.extend(cross_bad)
        win_bad = audit_window_partitions(name, df)
        if win_bad:
            failures += 1
            flags.extend(win_bad)
        status = " | ".join(flags) if flags else "clean"
        print(f"=== {name}: {status}")
        if len(sys.argv) > 1:  # detail only when explicitly named
            print(plan)
    if failures:
        print(f"AUDIT FAILED: {failures} query(s) with unbounded "
              "cross joins or unpartitioned global-sort windows")
        sys.exit(1)


if __name__ == "__main__":
    main()
