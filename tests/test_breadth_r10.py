"""Brute-force property tests for plans/breadth_r10.py."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from matt3r_data_ingestion_serverless_spark.plans.breadth_r10 import (
    _CHURN_GAP_US,
    _PCA_Q,
    ns_pca_power_iteration,
    survival_hazard_table,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_survival_table_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    spans = defaultdict(lambda: [None, None])
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        s = spans[r.user_id]
        s[0] = us if s[0] is None else min(s[0], us)
        s[1] = us if s[1] is None else max(s[1], us)
    end_us = max(s[1] for s in spans.values())
    n_users = len(spans)
    # churn = absolute gap bar OR top-5% inactivity censoring floor
    # (rank with ties: 1 + count of strictly larger gaps)
    gaps = [end_us - s[1] for s in spans.values()]
    k = math.ceil(0.05 * n_users)
    durs, churned_at = defaultdict(int), defaultdict(int)
    for s in spans.values():
        d = (s[1] - s[0]) // 86_400_000_000
        durs[d] += 1
        gap = end_us - s[1]
        rank = 1 + sum(g > gap for g in gaps)
        if gap >= _CHURN_GAP_US or rank <= k:
            churned_at[d] += 1
    got = {r.t_days: r for r in survival_hazard_table(spark, SF_SMOKE).collect()}
    assert set(got) == {t for t, d in churned_at.items() if d > 0}
    for t, d in churned_at.items():
        if d == 0:
            continue
        n_risk = n_users - sum(c for tt, c in durs.items() if tt < t)
        r = got[t]
        assert (r.n_risk, r.d_churned) == (n_risk, d), t
        assert abs(r.hazard - _round6(d / n_risk)) < 1e-12


def test_pca_power_iteration_matches_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    X = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    lab = np.array([r.label for r in emb])
    q = (np.sign(X) * np.floor(np.abs(X) * _PCA_Q + 0.5)).astype(np.int64)
    n = len(q)
    s = q.sum(0)
    M = np.zeros((64, 64), dtype=np.float64)
    for c in sorted(set(lab.tolist())):
        qc = q[lab == c]
        e = n * qc.sum(0) - len(qc) * s
        M += np.outer(e, e)

    def seq_dot(row, vec):
        acc = 0.0
        for a, b in zip(row, vec):
            acc += a * b  # sequential, like aggregate()/list_reduce
        return acc

    x = np.full(64, 1.0 / 8.0)
    for it in range(6):
        y = np.array([seq_dot(M[i], x) for i in range(64)])
        nrm = math.sqrt(seq_dot(y, y))
        x = np.array([_round6(v / nrm) for v in y])
    expected = x * np.sign(x[0])
    got = {r.dim: r.component for r in ns_pca_power_iteration(spark, SF_SMOKE).collect()}
    assert set(got) == set(range(1, 65))
    for k in range(64):
        assert abs(got[k + 1] - expected[k]) < 1e-12, k
    # and the direction is actually the dominant eigenvector (sanity):
    w, v = np.linalg.eigh(M)
    top = v[:, np.argmax(w)]
    cos = abs(float(top @ expected) / (np.linalg.norm(top) * np.linalg.norm(expected)))
    assert cos > 0.98, cos
