"""Physical-plan pins for the r83-r88 operators (same contract as
test_plan_shapes.py). Note: formatted plans print each node twice
(tree line + detail section), so count thresholds are per-occurrence
doubled."""

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


def test_novelty_no_pairwise_stage(spark):
    """Novelty derives from shingle document frequency — one explode +
    two hash joins on the shingle key; nothing pairs docs."""
    plan = _plan(spark, "ns_ngram_novelty")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_prefix_lcp_windows_partitioned_by_first_word(spark):
    """The LCP window must be partitioned (first word), never a global
    single-partition sort over the corpus."""
    plan = _plan(spark, "ns_prefix_cache_lcp")
    assert "Window" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_wasserstein_aggregates_before_global_sweep(spark):
    """The single-partition CDF sweep may only see the support grid:
    the cent-keyed aggregation exchange must sit BELOW the
    single-partition window exchange."""
    df = _QUERIES["drift_wasserstein_1d"][0](spark, SF_CORRECTNESS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pos_single = plan.find("Exchange SinglePartition")
    pos_agg = plan.find("Exchange hashpartitioning(c#", pos_single)
    assert pos_single != -1 and pos_agg != -1, plan


def test_shapley_lattice_joins_broadcast(spark):
    """The coalition sums run on the 16-row lattice against the 32-row
    literal pair table — broadcast joins only."""
    plan = _plan(spark, "attribution_shapley_subsets")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_followed_by_matrix_banded_equijoin(spark):
    """The time self-join must band on (user, hour-bucket): an
    equi-join with the window predicate as residual, never a pure
    range nested-loop."""
    plan = _plan(spark, "seq_followed_by_matrix")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_apriori_support_joins_are_equijoins(spark):
    """Candidate generation and the 3-way support count must stay
    equi-joins (basket keys / frequent-pair keys); no lattice-sized
    nested loop."""
    plan = _plan(spark, "basket_triples_apriori")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rouge2_clip_join_on_gram_key(spark):
    """The clipped-count join fans out only (pair × shared gram): hash
    joins on doc/gram keys, no nested loop."""
    plan = _plan(spark, "ns_rouge2_neardup_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
