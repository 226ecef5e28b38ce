"""Brute-force property tests for plans/breadth_r59.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r59 import (
    ns_bot_score_composite,
    spc_p_chart_returns,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_p_chart_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    m = defaultdict(lambda: [0, 0])
    for r in li:
        cell = m[r.l_shipdate.strftime("%Y-%m")]
        cell[0] += 1
        cell[1] += r.l_returnflag == "R"
    n_tot = sum(c[0] for c in m.values())
    r_tot = sum(c[1] for c in m.values())
    pbar = r_tot / n_tot
    got = {r.month: r for r in spc_p_chart_returns(spark, SF_SMOKE).collect()}
    assert set(got) == set(m)
    for month, (n, ret) in m.items():
        r = got[month]
        assert (r.n_lines, r.n_returned) == (n, ret)
        assert r.p_micro == (ret * 1000000) // n
        half = 3.0 * math.sqrt(pbar * (1 - pbar) / n)
        assert abs(r.ucl - _round6(pbar + half)) <= 1e-6
        assert abs(r.lcl - _round6(pbar - half)) <= 1e-6
        assert r.out_of_control == (ret / n > pbar + half or ret / n < pbar - half)


def test_bot_score_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per = defaultdict(lambda: [0, [], set(), 0])
    for r in ev:
        cell = per[r.user_id]
        cell[0] += 1
        cell[1].append(int(r.ts.timestamp() * 1e6))
        cell[2].add(r.event_type)
        cell[3] += 2 <= r.ts.hour < 5
    got = {r.user_id: r for r in ns_bot_score_composite(spark, SF_SMOKE).collect()}
    expected_users = {u for u, c in per.items() if c[0] >= 5}
    assert set(got) == expected_users
    for uid in expected_users:
        n, us, types, night = per[uid]
        span = max(us) - min(us)
        rate = (n * 3_600_000_000) // span if span > 0 else n
        night_micro = (night * 1000000) // n
        score = (
            (400 if rate >= 2 else 0)
            + (300 if len(types) <= 2 else 0)
            + (300 if night_micro >= 250000 else 0)
        )
        r = got[uid]
        assert (r.n_events, r.rate_per_hour, r.n_types) == (n, rate, len(types))
        assert r.night_micro == night_micro
        assert r.bot_score_milli == score
        assert r.flagged == (score >= 600)
