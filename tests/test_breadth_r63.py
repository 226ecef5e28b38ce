"""Brute-force property tests for plans/breadth_r63.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r63 import (
    geo_bbox_extent,
    interorder_gap_by_segment,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_bbox_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per = defaultdict(lambda: [0, [], []])
    for r in ev:
        lat = 49.0 + (r.event_id % 1000) / 1000.0
        lon = -123.0 + (r.user_id % 1000) / 500.0 + (r.event_id % 97) / 970.0
        cell = per[r.user_id]
        cell[0] += 1
        cell[1].append(int(math.floor(lat * 1e6 + 0.5)))
        cell[2].append(int(math.floor(lon * 1e6 - 0.5)))
    got = {r.user_id: r for r in geo_bbox_extent(spark, SF_SMOKE).collect()}
    assert set(got) == set(per)
    for uid, (n, lats, lons) in per.items():
        r = got[uid]
        assert r.n_points == n
        assert (r.lat_min_micro, r.lat_max_micro) == (min(lats), max(lats))
        assert (r.lon_min_micro, r.lon_max_micro) == (min(lons), max(lons))
        assert r.l1_extent_micro == (max(lats) - min(lats)) + (max(lons) - min(lons))
        assert r.l1_extent_micro >= 0


def test_interorder_gaps_match_python(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    seg = {c.c_custkey: c.c_mktsegment for c in load_table(spark, SF_SMOKE, "customer").collect()}
    per_cust = defaultdict(list)
    for o in orders:
        per_cust[o.o_custkey].append((o.o_orderdate, o.o_orderkey))
    gaps = defaultdict(list)
    for ck, rows in per_cust.items():
        ordered = sorted(rows)
        for (d1, _), (d2, _) in zip(ordered, ordered[1:]):
            gaps[seg[ck]].append((d2.date() - d1.date()).days)
    got = {r.segment: r for r in interorder_gap_by_segment(spark, SF_SMOKE).collect()}
    assert set(got) == set(gaps)
    for segment, ds in gaps.items():
        ds.sort()
        n = len(ds)

        def pct(q):
            cum = 0
            for v in ds:
                cum += 1
                if cum * 100 >= n * q:
                    return v
            return ds[-1]

        r = got[segment]
        assert r.n_gaps == n
        assert r.p50_gap_days == pct(50)
        assert r.p90_gap_days == pct(90)
        assert r.p50_gap_days <= r.p90_gap_days
