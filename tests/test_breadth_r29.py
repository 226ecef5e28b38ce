"""Brute-force property tests for plans/breadth_r29.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r29 import (
    odds_ratio_weekend_highvalue,
    paired_ttest_am_pm,
    poisson_rate_ci,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_odds_ratio_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for r in ev:
        weekend = r.ts.weekday() >= 5  # python: Mon=0..Sun=6
        hi = r.value > 100
        idx = (0 if hi else 1) if weekend else (2 if hi else 3)
        cells[r.event_type][idx] += 1
    got = {r.event_type: r for r in odds_ratio_weekend_highvalue(spark, SF_SMOKE).collect()}
    assert set(got) == set(cells)
    for et, (a, b, c, d) in cells.items():
        r = got[et]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
        orr = a * d / (b * c)
        half = 1.96 * math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
        assert abs(r.odds_ratio - _round6(orr)) <= 1e-6
        assert abs(r.log_or_lo - _round6(math.log(orr) - half)) <= 1e-6
        assert abs(r.log_or_hi - _round6(math.log(orr) + half)) <= 1e-6
        assert r.log_or_lo < r.log_or_hi


def test_paired_ttest_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    halves = defaultdict(lambda: [0, 0, 0, 0])  # s_am, n_am, s_pm, n_pm
    for r in ev:
        cents = int(math.floor(r.value * 100 + 0.5))
        h = halves[r.user_id]
        if r.ts.hour < 12:
            h[0] += cents
            h[1] += 1
        else:
            h[2] += cents
            h[3] += 1
    diffs = [
        (sa * 1000) // na - (sp * 1000) // np
        for sa, na, sp, np in halves.values()
        if na > 0 and np > 0
    ]
    n, s1 = len(diffs), sum(diffs)
    s2 = sum(d * d for d in diffs)
    se = math.sqrt((s2 - s1 * s1 / n) / (n - 1) / n)
    row = paired_ttest_am_pm(spark, SF_SMOKE).collect()[0]
    assert row.n_users == n
    assert abs(row.mean_diff_cents - _round6(s1 / n / 1e3)) <= 1e-6
    assert abs(row.t_stat - _round6(s1 / n / se)) <= 1e-6


def test_poisson_rate_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append(int(r.ts.timestamp() * 1e6))
    got = {r.event_type: r for r in poisson_rate_ci(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_type)
    for et, us in by_type.items():
        n, span = len(us), max(us) - min(us)
        r = got[et]
        assert (r.n, r.span_us) == (n, span)
        assert abs(r.rate_per_hour - _round6(n * 3600e6 / span)) <= 1e-6
        assert abs(r.rate_lo - _round6((n - 1.96 * math.sqrt(n)) * 3600e6 / span)) <= 1e-6
        assert abs(r.rate_hi - _round6((n + 1.96 * math.sqrt(n)) * 3600e6 / span)) <= 1e-6
        assert r.rate_lo < r.rate_per_hour < r.rate_hi
