"""Brute-force property tests for plans/breadth_r64.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r64 import (
    events_hour_entropy_by_type,
    ml_proper_scoring_rules,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_scoring_rules_match_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    n = n_pos = sq_sum = nll_sum = 0
    excluded = 0
    for r in ev:
        p = int(math.floor(1.0 / (1.0 + math.exp(-(r.value - 50.0) / 25.0)) * 1e6 + 0.5))
        if p <= 0 or p >= 1000000:
            excluded += 1
            continue
        y = 1 if r.event_type == "purchase" else 0
        n += 1
        n_pos += y
        sq_sum += (p - y * 1000000) ** 2
        prob = p / 1e6 if y == 1 else 1.0 - p / 1e6
        nll_sum += int(math.floor(abs(math.log(prob)) * 1e6 + 0.5))
    row = ml_proper_scoring_rules(spark, SF_SMOKE).collect()[0]
    assert (row.n, row.n_pos, row.brier_sq_sum, row.nll_micro_sum) == (
        n,
        n_pos,
        sq_sum,
        nll_sum,
    )
    assert abs(row.brier - _round6(sq_sum / n / 1e12)) <= 1e-6
    assert abs(row.log_loss - _round6(nll_sum / n / 1e6)) <= 1e-6
    assert 0.0 <= row.brier <= 1.0
    assert excluded == 0  # this scorer never saturates to exactly 0/1


def test_hour_entropy_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    cnt = defaultdict(lambda: defaultdict(int))
    for r in ev:
        cnt[r.event_type][r.ts.hour] += 1
    got = {r.event_type: r for r in events_hour_entropy_by_type(spark, SF_SMOKE).collect()}
    assert set(got) == set(cnt)
    ln24 = int(math.floor(math.log(24.0) * 1e6 + 0.5))
    for et, by_hr in cnt.items():
        n = sum(by_hr.values())
        num = sum(
            k * int(math.floor(abs(math.log(k / n)) * 1e6 + 0.5))
            for k in by_hr.values()
        )
        r = got[et]
        assert (r.n, r.n_active_hours) == (n, len(by_hr))
        assert r.entropy_micro == num // n
        assert abs(r.entropy_vs_uniform - _round6((num // n) / ln24)) <= 1e-6
        assert 0.0 <= r.entropy_vs_uniform <= 1.01
