"""Round-11 entries: IVF metric-fidelity gates, approx stats twin,
whitening, the release-audit card, the streaming funnel, and the
ivf_knn_join expression fast path."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from production_grade_rag_spark.plans.catalog import CATALOG

from conftest import SF001


def _rows(spark, name):
    return CATALOG[name].build(spark, SF001).collect()


# ---------------------------------------------------------------------------
# ivf_knn_join: the expression fast path (VERDICT r10 #1)
# ---------------------------------------------------------------------------

def test_ivf_knn_join_fast_path_matches_join_path(spark):
    """The codegen-projection path and the broadcast-join path must be
    byte-identical — same distance arithmetic, same (distance,
    cell_id) tiebreaks — so the recall gates certify both."""
    from production_grade_rag_spark.operators import similarity
    from production_grade_rag_spark.sources import load_table
    emb = load_table(spark, SF001, "embeddings")
    qs = emb.withColumnRenamed("vec_id", "query_id")
    cents = similarity.fit_centroids(emb, 16)
    fast = similarity.ivf_knn_join(qs, emb, k=6, n_lists=16, n_probe=8,
                                   centroids=cents)
    rows_fast = sorted((r["query_id"], r["result_id"], r["rank"],
                        round(r["score"], 9)) for r in fast.collect())
    old = similarity._MAX_EXPR_CENTROIDS
    try:
        similarity._MAX_EXPR_CENTROIDS = 0
        slow = similarity.ivf_knn_join(qs, emb, k=6, n_lists=16,
                                       n_probe=8, centroids=cents)
        rows_slow = sorted((r["query_id"], r["result_id"], r["rank"],
                            round(r["score"], 9))
                           for r in slow.collect())
    finally:
        similarity._MAX_EXPR_CENTROIDS = old
    assert rows_fast == rows_slow


def test_ivf_knn_join_fast_path_plan_is_one_equijoin(spark):
    """The 100 TB claim as a plan pin: cell assignment and probe
    selection are PROJECTIONS (no crossJoin node, no groupBy-and-join-
    back), so the whole join is one cell equi-join + the per-query
    window — at most 3 hash exchanges, zero nested-loop joins."""
    from production_grade_rag_spark.operators import similarity
    from production_grade_rag_spark.sources import load_table
    emb = load_table(spark, SF001, "embeddings")
    qs = emb.withColumnRenamed("vec_id", "query_id")
    cents = similarity.fit_centroids(emb, 16)
    j = similarity.ivf_knn_join(qs, emb, k=5, n_lists=16, n_probe=4,
                                centroids=cents)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3


# ---------------------------------------------------------------------------
# s32_analyze_stats_approx (VERDICT r10 #3)
# ---------------------------------------------------------------------------

def test_s32_approx_gate_holds(spark):
    rows = _rows(spark, "s32_analyze_stats_approx")
    assert len(rows) == 4
    assert all(r["ndv_ok"] for r in rows)


def test_s32_approx_exact_twin_matches_direct_count(spark):
    from production_grade_rag_spark.sources import load_table
    o = load_table(spark, SF001, "orders")
    want = {c: o.select(c).distinct().count()
            for c in ("o_orderkey", "o_custkey")}
    got = {r["col"]: r["ndv"]
           for r in _rows(spark, "s32_analyze_stats_approx")}
    for c, n in want.items():
        assert got[c] == n


def test_s32_pure_approx_plan_compiles_no_exact_distinct(spark):
    """The 100 TB form: HLL++ only, partial-aggregated map-side — the
    plan contains partial_approx_count_distinct and NONE of the exact
    distinct machinery (no Expand node, no count(distinct ...)); the
    gated catalog form (ndv='both') keeps the exact twin and therefore
    DOES compile the Expand — asserted as the contrast."""
    from production_grade_rag_spark.plans.catalog_r11 import _s32_stats_r11
    pure = (_s32_stats_r11(spark, SF001, ndv="approx")
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_approx_count_distinct" in pure
    assert "Expand" not in pure
    assert not re.search(r"count\(distinct", pure, re.I)
    both = (_s32_stats_r11(spark, SF001, ndv="both")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Expand" in both


# ---------------------------------------------------------------------------
# g_ivf_fidelity (VERDICT r10 #2)
# ---------------------------------------------------------------------------

def test_g_ivf_fidelity_floors_hold(spark):
    rows = _rows(spark, "g_ivf_fidelity")
    assert [r["metric"] for r in rows] == [
        "clustering_coef", "components", "ppr_top20_overlap",
        "triangles"]
    assert all(r["floor_met"] for r in rows)


def test_g_ivf_fidelity_exact_side_matches_standalone(spark):
    """The card's exact column must be the SAME numbers the standalone
    entries publish — census from g6, PPR cardinality from g11."""
    rows = {r["metric"]: r["exact_q"]
            for r in _rows(spark, "g_ivf_fidelity")}
    census = CATALOG["g6_triangle_census"].build(spark, SF001).collect()[0]
    assert rows["triangles"] == float(census["n_triangles"])
    assert rows["clustering_coef"] == census["global_clustering"]
    ppr_n = CATALOG["g11_ppr_seed"].build(spark, SF001).count()
    assert rows["ppr_top20_overlap"] == float(ppr_n)


# ---------------------------------------------------------------------------
# m6_whiten_embeddings (VERDICT r10 #6)
# ---------------------------------------------------------------------------

def test_m6_removes_top_direction(spark):
    row = _rows(spark, "m6_whiten_embeddings")[0]
    assert row["removed_ok"]
    # the invariant itself, restated: post-removal variance along v
    # is truncation residue (<1% — measured ~6e-7 of before)
    assert row["resid_q"] * 100 <= row["before_q"]
    # the honest observational read on this near-isotropic corpus
    assert abs(row["anis_before"]) < 0.1
    assert abs(row["anis_after"]) < 0.1


# ---------------------------------------------------------------------------
# cc_release_audit (VERDICT r10 #7): every row == its standalone entry
# ---------------------------------------------------------------------------

def test_release_audit_rows_match_standalone(spark):
    card = {r["audit"]: r["value_q"]
            for r in _rows(spark, "cc_release_audit")}
    dq8 = _rows(spark, "dq8_kanonymity")[0]
    assert card["kanonymity_risk"] == dq8["risk_share"]
    m5 = _rows(spark, "m5_embedding_isotropy")[0]
    assert card["isotropy"] == m5["anisotropy"]
    t43 = {r["ordering"]: r["same_bucket_rate"]
           for r in _rows(spark, "t43_order_clumping")}
    assert card["order_clumping"] == t43["curriculum"]
    t44 = _rows(spark, "t44_quality_length_corr")[0]
    assert card["quality_length_bias"] == t44["quality_length_corr"]


def test_release_audit_flags_are_policy_comparisons(spark):
    from production_grade_rag_spark.plans.catalog_r11 import (
        _AUDIT_ANIS_MAX, _AUDIT_CORR_MAX, _AUDIT_RISK_MAX)
    rows = {r["audit"]: r for r in _rows(spark, "cc_release_audit")}
    assert rows["isotropy"]["flag_ok"] == (
        abs(rows["isotropy"]["value_q"]) <= _AUDIT_ANIS_MAX)
    assert rows["kanonymity_risk"]["flag_ok"] == (
        rows["kanonymity_risk"]["value_q"] <= _AUDIT_RISK_MAX)
    assert rows["quality_length_bias"]["flag_ok"] == (
        abs(rows["quality_length_bias"]["value_q"]) <= _AUDIT_CORR_MAX)


# ---------------------------------------------------------------------------
# st_funnel (VERDICT r10 #5): stream == batch
# ---------------------------------------------------------------------------

def test_st_funnel_matches_batch_funnel(spark):
    st = _rows(spark, "st_funnel")[0]
    bt = _rows(spark, "ev_funnel")[0]
    for c in ("n_sessions", "n_view", "n_view_click",
              "n_view_click_purchase"):
        assert st[c] == bt[c], c
