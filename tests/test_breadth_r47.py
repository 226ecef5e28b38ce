"""Brute-force property tests for plans/breadth_r47.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r47 import (
    _PVM_Y0,
    _PVM_Y1,
    duplicate_payment_audit,
    new_vs_repeat_revenue,
    price_volume_mix_bridge,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division — Spark's `div` / DuckDB's `//`."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def test_pvm_bridge_matches_and_reconciles(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    per = defaultdict(lambda: [0, 0, 0, 0])  # q0, r0, q1, r1
    for r in li:
        y = r.l_shipdate.strftime("%Y")
        if y not in (_PVM_Y0, _PVM_Y1):
            continue
        cents = int(math.floor(r.l_extendedprice * 100 + 0.5))
        cell = per[r.l_partkey]
        if y == _PVM_Y0:
            cell[0] += int(r.l_quantity)
            cell[1] += cents
        else:
            cell[2] += int(r.l_quantity)
            cell[3] += cents
    n = pe = ve = me = td = 0
    for q0, r0, q1, r1 in per.values():
        n += 1
        delta = r1 - r0
        if q0 > 0 and q1 > 0:
            p = _tdiv(r1 * q0 - r0 * q1, q0)
            v = _tdiv(r0 * q1 - r0 * q0, q0)
        else:
            p = v = 0
        pe += p
        ve += v
        me += delta - p - v
        td += delta
    row = price_volume_mix_bridge(spark, SF_SMOKE).collect()[0]
    assert (row.n_parts, row.price_effect_cents, row.volume_effect_cents) == (n, pe, ve)
    assert (row.mix_residual_cents, row.total_delta_cents) == (me, td)
    # bridge reconciles exactly
    assert (
        row.price_effect_cents + row.volume_effect_cents + row.mix_residual_cents
        == row.total_delta_cents
    )


def test_new_vs_repeat_matches_python(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    first = {}
    for o in orders:
        y = o.o_orderdate.strftime("%Y")
        if o.o_custkey not in first or y < first[o.o_custkey]:
            first[o.o_custkey] = y
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for o in orders:
        y = o.o_orderdate.strftime("%Y")
        cents = int(math.floor(o.o_totalprice * 100 + 0.5))
        cell = agg[y]
        if y == first[o.o_custkey]:
            cell[0] += 1
            cell[1] += cents
        else:
            cell[2] += 1
            cell[3] += cents
    got = {r.y: r for r in new_vs_repeat_revenue(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for y, (no, nr, ro, rr) in agg.items():
        r = got[y]
        assert (r.new_orders, r.new_revenue_cents, r.repeat_orders, r.repeat_revenue_cents) == (
            no,
            nr,
            ro,
            rr,
        )
    # the earliest year is all-new
    y0 = min(agg)
    assert got[y0].repeat_orders == 0


def test_duplicate_payments_match_python(spark):
    """Brute-force twin on the payment-events stream (r08 substrate:
    the orders variant was vacuous at every SF — uniform amounts over
    ~10^7 distinct cents never collide)."""
    ev = load_table(spark, SF_SMOKE, "events").collect()
    groups = defaultdict(list)
    for e in ev:
        cents = int(math.floor(e.value * 100 + 0.5))
        groups[(e.user_id, cents)].append((e.event_id, e.ts))
    expected = {}
    for (uid, cents), rows in groups.items():
        if len(rows) <= 1:
            continue
        eids = [r[0] for r in rows]
        days = [r[1] for r in rows]
        expected[(uid, cents)] = (
            len(rows),
            min(eids),
            max(eids),
            min(days).strftime("%Y-%m-%d"),
            max(days).strftime("%Y-%m-%d"),
            (len(rows) - 1) * cents,
        )
    got = {
        (r.user_id, r.cents): (
            r.n_payments,
            r.first_event,
            r.last_event,
            r.first_day,
            r.last_day,
            r.exposure_cents,
        )
        for r in duplicate_payment_audit(spark, SF_SMOKE).collect()
    }
    assert got == expected and len(got) > 0
