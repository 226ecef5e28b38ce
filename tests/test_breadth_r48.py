"""Brute-force property tests for plans/breadth_r48.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r48 import (
    hourly_latency_percentiles,
    moments_skew_kurtosis,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_hourly_percentiles_match_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_hr = defaultdict(list)
    for r in ev:
        by_hr[r.ts.hour].append(int(math.floor(r.value * 100 + 0.5)))
    got = {r.hr: r for r in hourly_latency_percentiles(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_hr)
    for hr, cents in by_hr.items():
        cents.sort()
        n = len(cents)

        def pct(q):
            # smallest value whose cumulative count*100 >= n*q
            cum = 0
            prev = None
            for v in cents:
                cum += 1
                if cum * 100 >= n * q:
                    return v
            return cents[-1]

        r = got[hr]
        assert r.n == n
        assert r.p50_cents == pct(50)
        assert r.p95_cents == pct(95)
        assert r.p99_cents == pct(99)
        assert r.p50_cents <= r.p95_cents <= r.p99_cents


def test_moments_match_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append(int(math.floor(r.value * 100 + 0.5)))
    got = {r.event_type: r for r in moments_skew_kurtosis(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_type)
    for et, xs in by_type.items():
        n = len(xs)
        s1 = sum(xs)
        s2 = sum(x * x for x in xs)
        s3 = sum(x**3 for x in xs)
        s4 = sum(x**4 for x in xs)
        mu = s1 / n
        e2, e3, e4 = s2 / n, s3 / n, s4 / n
        m2 = e2 - mu * mu
        m3 = e3 - 3 * mu * e2 + 2 * mu**3
        m4 = e4 - 4 * mu * e3 + 6 * mu * mu * e2 - 3 * mu**4
        r = got[et]
        assert r.n == n
        assert abs(r.mean_value - _round6(mu / 100.0)) <= 1e-6
        assert abs(r.skewness - _round6(m3 / (m2 * math.sqrt(m2)))) <= 2e-6
        assert abs(r.excess_kurtosis - _round6(m4 / (m2 * m2) - 3.0)) <= 2e-6
