"""Brute-force property tests for plans/breadth_r93.py."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r93 import (
    _KNN_REG_K,
    _SPLIT,
    _SRM_CHI2_CRIT,
    ab_srm_check,
    ml_cart_root_split,
    ml_knn_regression_1d,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _per_user(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    split = dt.datetime.fromisoformat(_SPLIT)
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        c = int(math.floor(r.value * 100 + 0.5))
        agg[r.user_id][0 if r.ts < split else 1] += c
    return agg


def test_cart_root_split_matches_exhaustive(spark):
    agg = _per_user(spark)
    pts = sorted((x, u, y) for u, (x, y) in agg.items())
    n = len(pts)
    best = None
    for i in range(1, n):
        if pts[i][0] == pts[i - 1][0]:
            continue
        left = [y for _, _, y in pts[:i]]
        right = [y for _, _, y in pts[i:]]

        def sse(ys):
            m = sum(ys) / len(ys)
            return sum((v - m) ** 2 for v in ys)

        s = sse(left) + sse(right)
        key = (math.floor(s * 1e6 + 0.5), pts[i - 1][0])
        if best is None or key < best[0]:
            best = (key, i, pts[i - 1][0], pts[i][0], s)
    _, i, xlo, xhi, s = best
    ys = [y for _, _, y in pts]
    m = sum(ys) / n
    sse0 = sum((v - m) ** 2 for v in ys)
    row = ml_cart_root_split(spark, SF_SMOKE).collect()[0]
    assert (row.n_left, row.n_right) == (i, n - i)
    assert math.isclose(row.threshold_r, (xlo + xhi) / 2 / 100, abs_tol=1e-6)
    assert math.isclose(row.sse_split_r, s / 10000, abs_tol=1e-3)
    assert math.isclose(row.var_reduction_r, (sse0 - s) / sse0, abs_tol=1e-6)
    assert 0 <= row.var_reduction_r <= 1


def test_knn_regression_matches_exhaustive_pairwise(spark):
    agg = _per_user(spark)
    users = list(agg)
    sq, n = 0.0, 0
    for u in users:
        x, y = agg[u]
        cands = sorted(
            (abs(x - agg[v][0]), v, agg[v][1]) for v in users if v != u
        )
        if len(cands) < _KNN_REG_K:
            continue
        top = cands[:_KNN_REG_K]
        pred = sum(yy for _, _, yy in top) / _KNN_REG_K
        sq += (y - pred) ** 2
        n += 1
    want = math.sqrt(sq / n) / 100
    row = ml_knn_regression_1d(spark, SF_SMOKE).collect()[0]
    assert row.n_scored == n
    assert math.isclose(row.rmse_r, want, abs_tol=1e-5)


def test_srm_check_matches_python(spark):
    users = {r.user_id for r in load_table(spark, SF_SMOKE, "events").collect()}
    n0 = sum(1 for u in users if u % 2 == 0)
    n1 = len(users) - n0
    half = (n0 + n1) / 2
    chi2 = (n0 - half) ** 2 / half + (n1 - half) ** 2 / half
    row = ab_srm_check(spark, SF_SMOKE).collect()[0]
    assert (row.n0, row.n1) == (n0, n1)
    assert math.isclose(row.chi2_r, chi2, abs_tol=1e-6)
    assert row.srm_flag == (chi2 > _SRM_CHI2_CRIT)
