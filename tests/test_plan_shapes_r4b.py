"""Physical-plan pins for the r81/r82 operators (same contract as
test_plan_shapes.py: the docstrings' scale claims asserted
mechanically). Iterative plans (SSSP, topo layering) checkpoint each
round, so their pins target the final round's join shape; streamed
queries are excluded (no batch plan to pin)."""

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


def test_knn_outliers_no_allpairs_join(spark):
    """The kth-NN score must ride the blocked GEMM: block-pair
    replication is a broadcast equi-join, never a nested-loop or
    cartesian pairing of the corpus with itself."""
    plan = _plan(spark, "ns_knn_outlier_scores")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan  # the GEMM scorer


def test_graph_iterations_no_cartesian(spark):
    """Every Bellman-Ford / layering round is an equi-join on the
    frontier key (the final round's plan is representative — all rounds
    build the same shape)."""
    for name in ("graph_sssp_bounded", "graph_topo_longest_path"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)


def test_radius_nn_is_cell_equijoin(spark):
    """The spatial candidate join must be a hash join on the grid-cell
    key — the 9× neighbourhood replication happens via explode, never
    via a distance cross-product."""
    plan = _plan(spark, "geo_radius_nn_join")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate" in plan, plan  # the 9× neighbourhood explode
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_edit_drift_single_user_day_shuffle(spark):
    """Sequence build + lag reuse the user hash: one exchange for the
    (user, day) aggregate, one for the user window — nothing wider, and
    the Levenshtein stays a JVM expression (no Python stage)."""
    plan = _plan(spark, "seq_edit_distance_drift")
    assert "levenshtein" in plan, plan
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_haar_details_one_level_pos_aggregate(spark):
    """Haar details are one hash aggregate over the exploded level
    array; the dense-slot frame joins broadcast-style (512 rows). The
    plan's one BroadcastNestedLoopJoin is the 1-row h0 anchor scalar
    (build side = a single aggregate row — constant size at any SF),
    so the pin asserts at most that one and no cartesian."""
    plan = _plan(spark, "ts_haar_coefficients")
    assert "CartesianProduct" not in plan, plan
    assert "Generate" in plan, plan  # the 6-level explode
    # formatted plans print each node twice (tree line + detail
    # section) — one physical BNLJ node = 2 string occurrences
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    assert "BroadcastHashJoin" in plan, plan  # dense-slot frame join
