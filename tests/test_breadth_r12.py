"""Brute-force property tests for plans/breadth_r12.py."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from matt3r_data_ingestion_serverless_spark.plans.breadth_r12 import (
    _DBSCAN_EPS,
    _DBSCAN_MINPTS,
    ns_dbscan_clusters,
    ols_normal_equations,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_ols_matches_numpy_lstsq(spark):
    o = load_table(spark, SF_SMOKE, "orders").collect()
    X = np.array(
        [
            [r.o_orderdate.month, int(r.o_orderpriority[0]), 1.0]
            for r in o
        ]
    )
    y = np.array(
        [math.floor(abs(r.o_totalprice) * 100 + 0.5) for r in o], dtype=np.float64
    )
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    r = ols_normal_equations(spark, SF_SMOKE).collect()[0]
    assert r.n == len(o)
    # Cramer on exact moments vs numpy's QR — agree to ~1e-6 relative
    for got, ref in [
        (r.b_month, beta[0]),
        (r.b_priority, beta[1]),
        (r.b_intercept, beta[2]),
    ]:
        assert abs(got - ref) < 1e-3 * max(1.0, abs(ref)), (got, ref)


def test_dbscan_matches_sklearn_free_python(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    ids = [r.vec_id for r in emb]
    X = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1)
    cs = (X @ X.T) / np.outer(nrm, nrm)
    cs6 = np.sign(cs) * np.floor(np.abs(cs) * 1e6 + 0.5) / 1e6
    n = len(ids)
    nbrs = {
        ids[i]: {ids[j] for j in range(n) if j != i and cs6[i, j] >= _DBSCAN_EPS}
        for i in range(n)
    }
    core = {u for u, ns_ in nbrs.items() if len(ns_) >= _DBSCAN_MINPTS}
    # components over core-core edges (min-label = min id in component)
    label = {u: u for u in core}
    changed = True
    while changed:
        changed = False
        for u in core:
            for w in nbrs[u]:
                if w in core and label[w] < label[u]:
                    label[u] = label[w]
                    changed = True
    expected = {}
    for r_id in ids:
        if r_id in core:
            expected[r_id] = ("core", label[r_id])
        else:
            cands = [label[w] for w in nbrs.get(r_id, ()) if w in core]
            if cands:
                expected[r_id] = ("border", min(cands))
            else:
                expected[r_id] = ("noise", -1)
    got = {
        r.vec_id: (r.role, r.cluster_id)
        for r in ns_dbscan_clusters(spark, SF_SMOKE).collect()
    }
    assert got == expected
    roles = defaultdict(int)
    for role, _ in got.values():
        roles[role] += 1
    assert roles["core"] > 0  # the fixture has dense regions