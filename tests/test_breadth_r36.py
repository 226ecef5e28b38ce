"""Brute-force property tests for plans/breadth_r36.py."""

from __future__ import annotations

import json
import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r36 import (
    freshness_lag_audit,
    json_key_profile,
    sum_distinct_semantics,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_freshness_audit_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.event_type].append(int(r.ts.timestamp() * 1e6))
    watermark = max(max(v) for v in per.values())
    got = {r.event_type: r for r in freshness_lag_audit(spark, SF_SMOKE).collect()}
    assert set(got) == set(per)
    for et, us in per.items():
        r = got[et]
        assert r.n == len(us)
        assert r.last_us == max(us)
        assert r.lag_us == watermark - max(us)
        assert r.stale_24h == (r.lag_us > 86_400_000_000)
        assert r.mean_interarrival_us == (max(us) - min(us)) // max(len(us) - 1, 1)
    assert any(r.lag_us == 0 for r in got.values())  # the watermark stream itself


def test_json_key_profile_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    counts = Counter()
    for r in ev:
        if r.props is None:
            continue
        for k in json.loads(r.props):
            counts[(r.event_type, k)] += 1
    got = {
        (r.event_type, r.key): r.n_rows for r in json_key_profile(spark, SF_SMOKE).collect()
    }
    assert got == dict(counts)


def test_sum_distinct_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    by_flag = defaultdict(list)
    for r in li:
        by_flag[r.l_returnflag].append(int(r.l_quantity))
    got = {r.l_returnflag: r for r in sum_distinct_semantics(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_flag)
    for flag, qs in by_flag.items():
        distinct = set(qs)
        r = got[flag]
        assert (r.n, r.n_distinct) == (len(qs), len(distinct))
        assert r.sum_all == sum(qs)
        assert r.sum_distinct == sum(distinct)
        assert abs(r.avg_distinct - _round6(sum(distinct) / len(distinct))) <= 1e-6
        assert r.sum_distinct <= r.sum_all
