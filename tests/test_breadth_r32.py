"""Brute-force property tests for plans/breadth_r32.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r32 import (
    exact_interpolated_quantiles,
    harmonic_mean_by_type,
    ratio_metric_delta_ci,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _cont(sorted_cents, p10):
    """PERCENTILE_CONT via the integer tenth-split used by the query."""
    n = len(sorted_cents)
    num = (n - 1) * p10
    k, r = num // 10, num % 10
    a = sorted_cents[k]
    b = sorted_cents[k + 1] if k + 1 < n else a
    return ((10 - r) * a + r * b) / 1000.0


def test_interpolated_quantiles_match_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append(int(math.floor(r.value * 100 + 0.5)))
    got = {r.event_type: r for r in exact_interpolated_quantiles(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_type)
    for et, cents in by_type.items():
        cents.sort()
        r = got[et]
        assert r.n == len(cents)
        assert abs(r.p50_cont - _round6(_cont(cents, 5))) <= 1e-6
        assert abs(r.p90_cont - _round6(_cont(cents, 9))) <= 1e-6
        assert r.p50_cont <= r.p90_cont
        # statistics.quantiles uses the same (n-1)p definition
        import statistics

        qs = statistics.quantiles([c / 100 for c in cents], n=10, method="inclusive")
        assert abs(r.p90_cont - qs[8]) < 0.02  # same definition, cents grid


def test_ratio_delta_ci_matches_python(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    by_year = defaultdict(list)
    for o in orders:
        by_year[o.o_orderdate.strftime("%Y")].append(
            int(math.floor(o.o_totalprice * 100 + 0.5))
        )
    got = {r.year: r for r in ratio_metric_delta_ci(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_year)
    for y, cents in by_year.items():
        n = len(cents)
        sx = sum(cents)
        sxx = sum(c * c for c in cents)
        ratio = sx / n / 100.0
        se = math.sqrt(max((sxx / n - (sx / n) ** 2) / n, 0.0)) / 100.0
        r = got[y]
        assert r.n_orders == n
        assert abs(r.revenue_per_order - _round6(ratio)) <= 1e-6
        assert abs(r.se_delta - _round6(se)) <= 1e-6
        assert abs(r.ci_lo - _round6(ratio - 1.96 * se)) <= 1e-6
        assert abs(r.ci_hi - _round6(ratio + 1.96 * se)) <= 1e-6
        assert r.ci_lo < r.revenue_per_order < r.ci_hi


def test_harmonic_mean_matches_python_and_mean_inequality(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    sums = defaultdict(lambda: [0, 0, 0.0])
    for r in ev:
        if r.value <= 0:
            continue
        cell = sums[r.event_type]
        cell[0] += 1
        cell[1] += int(math.floor(1e9 / r.value + 0.5))
        cell[2] += r.value
    got = {r.event_type: r for r in harmonic_mean_by_type(spark, SF_SMOKE).collect()}
    assert set(got) == set(sums)
    for et, (n, s1, total) in sums.items():
        r = got[et]
        assert (r.n, r.sum_inv_nano) == (n, s1)
        assert abs(r.harmonic_mean - _round6(n * 1e9 / s1)) <= 1e-6
        # HM <= AM (up to quantization slack)
        assert r.harmonic_mean <= total / n + 1e-3
