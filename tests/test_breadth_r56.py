"""Brute-force property tests for plans/breadth_r56.py."""

from __future__ import annotations

from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r56 import (
    _RET_DAYS,
    day_n_retention_curve,
    leadtime_percentiles_by_priority,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_day_n_retention_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    days = defaultdict(set)
    for r in ev:
        days[r.user_id].add(r.ts.date())
    cohort = len(days)
    retained = {n: 0 for n in _RET_DAYS}
    for uid, ds in days.items():
        d0 = min(ds)
        for n in _RET_DAYS:
            if any((d - d0).days == n for d in ds):
                retained[n] += 1
    row = day_n_retention_curve(spark, SF_SMOKE).collect()[0]
    assert row.cohort_size == cohort
    for n in _RET_DAYS:
        assert getattr(row, f"d{n}_retained") == retained[n]
        assert getattr(row, f"d{n}_share_micro") == (retained[n] * 1000000) // cohort


def test_leadtime_percentiles_match_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    first_ship = {}
    for r in li:
        k = r.l_orderkey
        if k not in first_ship or r.l_shipdate < first_ship[k]:
            first_ship[k] = r.l_shipdate
    by_prio = defaultdict(list)
    for o in orders:
        if o.o_orderkey not in first_ship:
            continue
        dd = (first_ship[o.o_orderkey].date() - o.o_orderdate.date()).days
        by_prio[o.o_orderpriority].append(dd)
    got = {r.priority: r for r in leadtime_percentiles_by_priority(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_prio)
    for prio, ds in by_prio.items():
        ds.sort()
        n = len(ds)

        def pct(q):
            cum = 0
            for v in ds:
                cum += 1
                if cum * 100 >= n * q:
                    return v
            return ds[-1]

        r = got[prio]
        assert r.n_orders == n
        assert r.p50_days == pct(50)
        assert r.p90_days == pct(90)
        assert r.max_days == ds[-1]
        assert r.p50_days <= r.p90_days <= r.max_days
