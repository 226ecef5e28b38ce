"""Brute-force property tests for plans/breadth_r33.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r33 import (
    array_set_ops_surface,
    window_nth_value_surface,
    window_offset_buckets,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_nth_value_surface_matches_python(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append(
            (o.o_orderdate, o.o_orderkey, int(math.floor(o.o_totalprice * 100 + 0.5)))
        )
    got = {r.o_custkey: r for r in window_nth_value_surface(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_cust)
    for ck, rows in by_cust.items():
        cents = [c for _, _, c in sorted(rows)]
        r = got[ck]
        assert r.n_orders == len(cents)
        assert r.second_order_cents == (cents[1] if len(cents) >= 2 else None)
        assert r.n_last == 1  # exactly one row has no successor
        assert r.sum_lag2_cents == sum(cents[:-2])


def test_array_set_ops_match_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    seqs = defaultdict(list)
    for r in ev:
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    got = {r.user_id: r for r in array_set_ops_surface(spark, SF_SMOKE).collect()}
    expected_users = {u for u, rows in seqs.items() if len(rows) >= 2}
    assert set(got) == expected_users
    for uid in expected_users:
        types = [t for _, _, t in sorted(seqs[uid])]
        h1 = set(types[: len(types) // 2])
        h2 = set(types[len(types) // 2 :])
        r = got[uid]
        assert (r.n_first, r.n_second) == (len(h1), len(h2))
        assert r.n_union == len(h1 | h2)
        assert r.n_intersect == len(h1 & h2)
        assert r.n_only_first == len(h1 - h2)
        # inclusion-exclusion invariant
        assert r.n_union == r.n_first + r.n_second - r.n_intersect


def test_offset_buckets_match_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        us = int(r.ts.timestamp() * 1e6)
        bucket = ((us - 1_800_000_000) // 3_600_000_000) * 3_600_000_000 + 1_800_000_000
        cell = agg[bucket]
        cell[0] += 1
        cell[1] += int(math.floor(r.value * 100 + 0.5))
    got = {r.bucket_us: (r.n, r.sum_cents) for r in window_offset_buckets(spark, SF_SMOKE).collect()}
    assert got == {b: tuple(v) for b, v in agg.items()}
    # every bucket boundary sits at :30
    for b in got:
        assert (b // 1_000_000) % 3600 == 1800
