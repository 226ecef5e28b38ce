"""Physical-plan pins for the r93-r99 operators, plus the regression
guard for the shingle-explode pathology (same contract as
test_plan_shapes.py)."""

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


def test_novelty_explodes_materialized_arrays(spark):
    """The 89s regression guard: the explode must read the
    localCheckpointed (doc_id, sh) table — a plan that re-derives the
    md5 shingle transform below the Generate re-evaluates it per
    OUTPUT row (~50× the work)."""
    for name in ("ns_ngram_novelty", "ns_shingle_heaps_fit"):
        plan = _plan(spark, name)
        assert "Scan ExistingRDD" in plan, (name, plan)  # the checkpoint
        assert "md5" not in plan, (name, plan)  # hashing happened before it


def test_cart_split_stays_jvm_side(spark):
    """The prefix-sum split search is windows + TakeOrdered — no Python
    stage, no cartesian."""
    plan = _plan(spark, "ml_cart_root_split")
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_f1_sweep_aggregates_before_global_sort(spark):
    """The single-partition suffix-sum sweep may only see the score
    grid: the score-keyed aggregation exchange sits below the
    single-partition window exchange."""
    df = _QUERIES["ml_f1_threshold_sweep"][0](spark, SF_CORRECTNESS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pos_single = plan.find("Exchange SinglePartition")
    pos_agg = plan.find("Exchange hashpartitioning(s#", pos_single)
    assert pos_single != -1 and pos_agg != -1, plan


def test_knn_regression_no_pairwise_stage(spark):
    """The 1-D kNN plan is windows over one sort — no join of the
    point set against itself."""
    plan = _plan(spark, "ml_knn_regression_1d")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dedup_savings_label_join_broadcast(spark):
    """The cluster-label table joins broadcast-style; the documents
    scan never shuffles for it."""
    plan = _plan(spark, "ns_dedup_cost_savings")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
