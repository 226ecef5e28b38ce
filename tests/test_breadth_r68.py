"""Brute-force property tests for plans/breadth_r68.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r68 import (
    _FWS_WINDOWS_US,
    funnel_window_sensitivity,
    weekday_profile_similarity,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_funnel_sensitivity_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    signups = defaultdict(list)
    clicks = defaultdict(list)
    for r in ev:
        us = int(r.ts.timestamp() * 1e6)
        if r.event_type == "signup":
            signups[r.user_id].append(us)
        elif r.event_type == "click":
            clicks[r.user_id].append(us)
    min_gap = {}
    for uid, ss in signups.items():
        gaps = [c - s for s in ss for c in clicks.get(uid, []) if c > s]
        if gaps:
            min_gap[uid] = min(gaps)
    row = funnel_window_sensitivity(spark, SF_SMOKE).collect()[0]
    assert row.n_signup_users == len(signups)
    assert row.n_with_any_click_after == len(min_gap)
    prev = -1
    for w in _FWS_WINDOWS_US:
        col = f"converted_{w // 3_600_000_000}h"
        expected = sum(1 for g in min_gap.values() if g <= w)
        assert getattr(row, col) == expected
        assert expected >= prev  # monotone in window size
        prev = expected


def test_weekday_similarity_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per = defaultdict(lambda: defaultdict(int))
    for r in ev:
        per[r.user_id][r.ts.weekday()] += 1
    g = defaultdict(int)
    for prof in per.values():
        for d, k in prof.items():
            g[d] += k
    gg = sum(v * v for v in g.values())
    got = {r.user_id: r for r in weekday_profile_similarity(spark, SF_SMOKE).collect()}
    assert set(got) == set(per)
    for uid, prof in per.items():
        dot = sum(k * g[d] for d, k in prof.items())
        uu = sum(k * k for k in prof.values())
        n = sum(prof.values())
        r = got[uid]
        assert (r.n_events, r.dot_int) == (n, dot)
        cos = dot / (math.sqrt(uu) * math.sqrt(gg))
        assert abs(r.profile_cosine - _round6(cos)) <= 1e-6
        assert 0.0 < r.profile_cosine <= 1.0
