"""Brute-force property tests for plans/breadth_r53.py."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r53 import (
    diff_in_diff_estimate,
    price_ending_distribution,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_did_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    cutover = dt.datetime(2024, 1, 16)
    cells = defaultdict(lambda: [0, 0])
    for r in ev:
        key = (r.user_id % 2, 1 if r.ts >= cutover else 0)
        cells[key][0] += 1
        cells[key][1] += int(math.floor(r.value * 100 + 0.5))
    mean = {k: (s * 1000) // n for k, (n, s) in cells.items()}
    t_delta = mean[(1, 1)] - mean[(1, 0)]
    c_delta = mean[(0, 1)] - mean[(0, 0)]
    row = diff_in_diff_estimate(spark, SF_SMOKE).collect()[0]
    assert row.n_total == sum(n for n, _ in cells.values())
    assert (row.treated_delta_milli, row.control_delta_milli) == (t_delta, c_delta)
    assert row.did_milli == t_delta - c_delta
    assert abs(row.did_cents - _round6((t_delta - c_delta) / 1000.0)) <= 1e-6


def test_price_endings_match_python(spark):
    part = load_table(spark, SF_SMOKE, "part").collect()
    agg = defaultdict(lambda: [0, 0])
    for p in part:
        cents = int(math.floor(p.p_retailprice * 100 + 0.5))
        cell = agg[cents % 100]
        cell[0] += 1
        cell[1] += cents
    n = len(part)
    top = sorted(agg.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    rows = price_ending_distribution(spark, SF_SMOKE).collect()
    assert [(r.ending, r.n_parts) for r in rows] == [(e, c[0]) for e, c in top]
    for r in rows:
        assert r.share_micro == (r.n_parts * 1000000) // n
        assert r.revenue_weight_cents == agg[r.ending][1]
        assert 0 <= r.ending <= 99
