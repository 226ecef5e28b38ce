"""Brute-force property tests for plans/breadth_r9.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r9 import (
    _BAND_CENTS,
    _FENCE,
    counter_rollover_totals,
    geo_geofence_transitions,
    price_band_pairs,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _cents(x: float) -> int:
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def test_geofence_transitions_match_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    tracks = defaultdict(list)
    for r in ev:
        lat = 49.0 + (r.event_id % 1000) / 1000.0
        lon = -123.0 + (r.user_id % 1000) / 500.0 + (r.event_id % 97) / 970.0
        inside = (
            _FENCE[0] <= lat < _FENCE[1] and _FENCE[2] <= lon < _FENCE[3]
        )
        tracks[r.user_id].append((r.ts, r.event_id, inside))
    expected = set()
    for uid, pts in tracks.items():
        pts.sort(key=lambda t: (t[0], t[1]))
        for (t0, e0, in0), (t1, e1, in1) in zip(pts, pts[1:]):
            if in0 != in1:
                expected.add((uid, e1, "enter" if in1 else "exit"))
    got = {
        (r.user_id, r.event_id, r.kind)
        for r in geo_geofence_transitions(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_counter_rollover_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    tracks = defaultdict(list)
    for r in ev:
        if r.event_type == "view":
            tracks[r.user_id].append((r.ts, r.event_id, _cents(r.value) % 100000))
    got = {r.user_id: r for r in counter_rollover_totals(spark, SF_SMOKE).collect()}
    assert set(got) == set(tracks)
    for uid, samples in tracks.items():
        samples.sort(key=lambda t: (t[0], t[1]))
        total = rollovers = 0
        for (_, _, a), (_, _, b) in zip(samples, samples[1:]):
            d = b - a
            if d < 0:
                rollovers += 1
                d += 100000
            total += d
        r = got[uid]
        assert (r.n_samples, r.total_delta, r.n_rollovers) == (
            len(samples),
            total,
            rollovers,
        ), uid


def test_price_band_pairs_match_bruteforce(spark):
    o = load_table(spark, SF_SMOKE, "orders").collect()
    rows = [(r.o_orderkey, r.o_orderstatus, _cents(r.o_totalprice)) for r in o]
    agg = defaultdict(lambda: [0, None, None])
    for i, (ka, sa, ca) in enumerate(rows):
        for kb, sb, cb in rows:
            if kb > ka and abs(ca - cb) <= _BAND_CENTS:
                cell = agg[(sa, sb)]
                d = abs(ca - cb)
                cell[0] += 1
                cell[1] = d if cell[1] is None else min(cell[1], d)
                cell[2] = d if cell[2] is None else max(cell[2], d)
    got = {
        (r.status_a, r.status_b): (r.n_pairs, r.min_diff, r.max_diff)
        for r in price_band_pairs(spark, SF_SMOKE).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
