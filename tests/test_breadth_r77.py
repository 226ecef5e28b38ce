"""Brute-force property tests for plans/breadth_r77.py."""

from __future__ import annotations

from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r77 import (
    basket_pair_lift,
    interval_peak_concurrency,
    rfm_segments,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_rfm_segments_partition_users(spark):
    rows = rfm_segments(spark, SF_SMOKE).collect()
    users = load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == users
    for r in rows:
        digits = (r.segment // 100, (r.segment // 10) % 10, r.segment % 10)
        assert all(1 <= d <= 5 for d in digits)


def test_basket_pair_lift_matches_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    baskets = defaultdict(set)
    for r in ev:
        baskets[(r.user_id, r.ts.date())].add(r.event_type)
    n = len(baskets)
    singles = Counter()
    pairs = Counter()
    for types in baskets.values():
        for t in types:
            singles[t] += 1
        ts = sorted(types)
        for i, a in enumerate(ts):
            for b in ts[i + 1:]:
                pairs[(a, b)] += 1
    rows = {(r.type_a, r.type_b): r for r in basket_pair_lift(spark, SF_SMOKE).collect()}
    assert set(rows) == set(pairs)
    for (a, b), c_ab in pairs.items():
        r = rows[(a, b)]
        assert (r.c_ab, r.c_a, r.c_b) == (c_ab, singles[a], singles[b])
        lift = c_ab * n / (singles[a] * singles[b])
        assert abs(r.lift - lift) < 1e-6


def test_interval_peak_matches_bruteforce(spark):
    orders = {
        r.o_orderkey: r.o_orderdate.date()
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    }
    last_ship = {}
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        d = r.l_shipdate.date()
        k = r.l_orderkey
        if k not in last_ship or d > last_ship[k]:
            last_ship[k] = d
    import datetime as dt

    deltas = Counter()
    for k, hi in last_ship.items():
        deltas[orders[k]] += 1
        deltas[hi + dt.timedelta(days=1)] -= 1
    live, peaks = 0, defaultdict(list)
    for day in sorted(deltas):
        live += deltas[day]
        peaks[day.strftime("%Y-%m")].append(live)
    rows = {r.month: r for r in interval_peak_concurrency(spark, SF_SMOKE).collect()}
    assert set(rows) == set(peaks)
    for m, vals in peaks.items():
        assert rows[m].peak_concurrent == max(vals)
        assert rows[m].min_concurrent == min(vals)
    assert any(max(v) > 1 for v in peaks.values()), "intervals must overlap"
