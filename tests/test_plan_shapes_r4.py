"""Physical-plan pins for the round-4 operators — the docstrings' scale
claims asserted mechanically (same contract as test_plan_shapes.py)."""

from __future__ import annotations

import contextlib
import io

from matt3r_data_ingestion_serverless_spark.plans import all_queries
from tests.conftest import SF_CORRECTNESS

_QUERIES = all_queries()


def _plan(spark, name: str) -> str:
    df = _QUERIES[name][0](spark, SF_CORRECTNESS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_setsim_prefix_join_no_allpairs(spark):
    """The PPJoin plan must never fall back to doc×doc pairing."""
    plan = _plan(spark, "ns_setsim_prefix_join")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_basket_pair_lift_broadcasts_singles(spark):
    """Pair generation is basket-keyed; the singles/total sides
    broadcast — nothing pairs across baskets."""
    plan = _plan(spark, "basket_pair_lift")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_phrase_match_filters_before_join(spark):
    """Only the two query terms' postings may reach the adjacency
    join: the term filter must sit below it, and the join is an
    equi-join (no nested loop)."""
    plan = _plan(spark, "phrase_match_positional")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_keyset_pagination_no_full_sort_exchange(spark):
    """The rank cutoff must plan as a per-partition top-k (no shuffle
    of the orders table for a 150-row page fetch)."""
    plan = _plan(spark, "keyset_pagination_pages")
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan, plan


def test_ohlc_single_exchange_partial_agg(spark):
    """OHLC is ONE hash aggregate: min_by/max_by partials combine
    map-side, so exactly one exchange (the day key) appears."""
    plan = _plan(spark, "ohlc_daily_bars")
    assert plan.count("Exchange") <= 2, plan  # agg exchange (+ AQE read)
    assert "min_by" in plan and "max_by" in plan, plan


def test_mad_outliers_stat_joins_broadcast(spark):
    """The 5-row per-type median/MAD tables broadcast back; the fact
    table never shuffles for the joins."""
    plan = _plan(spark, "mad_robust_outliers")
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_locf_running_frame_only(spark):
    """LOCF uses the running frame — an UNBOUNDED FOLLOWING frame
    would buffer whole partitions."""
    plan = _plan(spark, "locf_imputation")
    assert "unboundedfollowing" not in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan


def test_peak_concurrency_sweep_aggregates_before_window(spark):
    """The single-partition running sum may only see the per-day
    aggregate, never raw boundary rows: the plan must aggregate
    (day-keyed exchange) below the SinglePartition window."""
    df = _QUERIES["interval_peak_concurrency"][0](spark, SF_CORRECTNESS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pos_single = plan.find("Exchange SinglePartition")
    pos_agg = plan.find("Exchange hashpartitioning(day", pos_single)
    # the plan string prints root first: the single-partition exchange
    # must sit ABOVE (= before) the day-keyed aggregation exchange
    assert pos_single != -1 and pos_agg != -1, plan
