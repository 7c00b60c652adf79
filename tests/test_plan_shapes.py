"""Physical-plan shape pins for the headline queries: correctness
tests can't see a plan regress from broadcast to cartesian or from
TakeOrderedAndProject to a global sort — these assertions can.  Each
pin encodes the 100 TB argument the operator's docstring makes."""

from __future__ import annotations

import re

import pytest

from production_grade_rag_spark.plans.catalog import CATALOG

from conftest import SF001


_CACHE: dict[str, str] = {}


def _plan(spark, name: str) -> str:
    """Pre-execution physical plan (single-section, deterministic).
    The post-execution AdaptiveSparkPlan string prints initial+final
    sections, double-counting nodes; for SHAPE pins (which joins,
    which exchanges, what reaches the scan) the static plan is the
    stable surface — AQE only re-plans within these shapes."""
    if name not in _CACHE:
        df = CATALOG[name].build(spark, SF001)
        _CACHE[name] = df._jdf.queryExecution().executedPlan().toString()
    return _CACHE[name]


NEVER_ANYWHERE = ("CartesianProduct",)


@pytest.mark.parametrize("name", [
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
    "q6_forecast_revenue", "q18_large_volume_customers",
    "r4_knn_topk", "r1_attribution_join", "ev_sessionize",
    "dd_minhash_lsh", "cc_curate",
])
def test_no_cartesian_products(spark, name):
    plan = _plan(spark, name)
    for bad in NEVER_ANYWHERE:
        assert bad not in plan, f"{name} plans a {bad}"


def test_q1_is_pushdown_scan_plus_partial_agg(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # the shipdate filter reaches the parquet scan
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan and "l_shipdate" in scan[0]
    # two-phase agg: partial (map-side) + final
    assert plan.count("HashAggregate") >= 2


def test_q6_scan_prunes_columns(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln][0]
    # only the 4 referenced columns survive into ReadSchema
    cols = re.search(r"FileScan parquet \[([^\]]*)\]", scan).group(1)
    names = {c.split("#")[0] for c in cols.split(",")}
    assert names == {"l_quantity", "l_extendedprice", "l_discount",
                     "l_shipdate"}


def test_q5_broadcasts_only_fixed_dims(spark):
    plan = _plan(spark, "q5_nation_revenue")
    # nation x region ride a broadcast; no nested-loop fallback
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_topk_is_take_ordered_no_exchange_before_scan(spark):
    plan = _plan(spark, "r4_knn_topk")
    # single-query exact knn: literal query column + global top-k
    assert "TakeOrderedAndProject" in plan
    # the corpus is never shuffled — scoring is map-side
    assert "Exchange hashpartitioning" not in plan


def test_sessionize_shuffles_once_on_user(spark):
    plan = _plan(spark, "ev_sessionize")
    exchanges = [ln for ln in plan.splitlines()
                 if "Exchange hashpartitioning" in ln]
    assert len(exchanges) == 1 and "user_id" in exchanges[0]


def test_attribution_join_broadcasts_doc_side(spark):
    plan = _plan(spark, "r1_attribution_join")
    assert "BroadcastHashJoin" in plan


def test_minhash_candidates_shuffle_on_band_hash(spark):
    plan = _plan(spark, "dd_minhash_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    # the bucket self-join keys on (band, band_hash)
    assert any("band_hash" in ln for ln in plan.splitlines()
               if "Exchange hashpartitioning" in ln)


def test_flagship_ends_in_take_ordered(spark):
    plan = _plan(spark, "flagship_dim384")
    assert "TakeOrderedAndProject" in plan
