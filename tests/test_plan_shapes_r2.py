"""Physical-plan regression tests for the round-2 breadth batches —
the scale claims in the new docstrings asserted mechanically.
"""

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


def test_bloom_probe_join_broadcasts(spark):
    """The ~1 KB bit set must broadcast onto the probe stream — a
    shuffled join on bit positions would move the whole probe side."""
    plan = _plan(spark, "ns_bloom_filter_audit")
    assert "BroadcastHashJoin" in plan, plan


def test_sorted_neighborhood_is_equi_join(spark):
    """The rn-offset pairing must plan as an EQUI join — a range
    condition would fall back to BroadcastNestedLoopJoin/cartesian and
    compare every record with every record."""
    plan = _plan(spark, "sorted_neighborhood_pairs")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    ), plan


def test_hhi_all_joins_broadcast(spark):
    """HHI joins only dimensions (supplier, totals, nation) onto the
    revenue rollup — none may shuffle the fact side."""
    plan = _plan(spark, "hhi_concentration")
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 0, plan


def test_decimal_aggregates_partial_map_side(spark):
    """DECIMAL sums must partial-aggregate before the shuffle — the
    exchange carries 3 rows per mapper, never raw lineitem."""
    plan = _plan(spark, "decimal_money_aggregates")
    assert "partial_sum" in plan, plan


def test_quantile_scans_prune_columns(spark):
    """exact_interpolated_quantiles touches only (event_type, value):
    the JSON props payload must never be read."""
    plan = _plan(spark, "exact_interpolated_quantiles")
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads, plan
    for ln in reads:
        assert "props" not in ln, ln


def test_rrf_scoring_broadcasts_queries(spark):
    """The query set must broadcast against the corpus (the brute-force
    scoring pattern) — queries ≪ corpus, so the corpus never moves."""
    plan = _plan(spark, "retrieval_rrf_fusion")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
