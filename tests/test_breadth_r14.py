"""Brute-force property tests for plans/breadth_r14.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r14 import (
    _FIFO_MAX_PART,
    _PSI_BINS,
    drift_psi_bins,
    fifo_lot_matching,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_fifo_matches_literal_queue_walk(spark):
    """The cumulative-interval-overlap formulation must produce exactly
    the allocations of a literal FIFO queue simulation."""
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    buys, sells = defaultdict(list), defaultdict(list)
    for r in li:
        if r.l_partkey > _FIFO_MAX_PART:
            continue
        rec = (r.l_shipdate, r.l_orderkey, r.l_linenumber, int(r.l_quantity))
        if r.l_returnflag == "N":
            buys[r.l_partkey].append(rec)
        elif r.l_returnflag == "R":
            sells[r.l_partkey].append(rec)
    expected = {}
    for part in set(buys) | set(sells):
        bq = sorted(buys.get(part, []))
        sq = sorted(sells.get(part, []))
        bi = si = 0
        brem = bq[0][3] if bq else 0
        srem = sq[0][3] if sq else 0
        while bi < len(bq) and si < len(sq):
            m = min(brem, srem)
            key = (part, bq[bi][1], bq[bi][2], sq[si][1], sq[si][2])
            expected[key] = expected.get(key, 0) + m
            brem -= m
            srem -= m
            if brem == 0:
                bi += 1
                brem = bq[bi][3] if bi < len(bq) else 0
            if srem == 0:
                si += 1
                srem = sq[si][3] if si < len(sq) else 0
    got = {
        (r.part, r.buy_order, r.buy_line, r.sell_order, r.sell_line): r.qty_matched
        for r in fifo_lot_matching(spark, SF_SMOKE).collect()
    }
    # the interval formulation can emit zero-qty rows only at exact lot
    # boundaries — it does not (strict inequalities); every allocation
    # must be positive and equal the simulation's
    assert got == {k: v for k, v in expected.items() if v > 0}


def test_psi_matches_python(spark):
    o = load_table(spark, SF_SMOKE, "orders").collect()
    base, cur = [], []
    for r in o:
        cents = int(math.floor(abs(r.o_totalprice) * 100 + 0.5))
        (base if r.o_orderdate.month <= 6 else cur).append(cents)
    lo, hi = min(base), max(base)

    def bin_of(c):
        return min(max(int(math.floor((c - lo) * _PSI_BINS / (hi - lo + 1))), 0), _PSI_BINS - 1)

    nb, nc = defaultdict(int), defaultdict(int)
    for c in base:
        nb[bin_of(c)] += 1
    for c in cur:
        nc[bin_of(c)] += 1
    tb, tc = len(base), len(cur)
    got = {r.bin: r for r in drift_psi_bins(spark, SF_SMOKE).collect()}
    assert set(got) == set(nb) | set(nc)
    for b in got:
        r = got[b]
        assert (r.n_base, r.n_current) == (nb[b], nc[b])
        if nb[b] > 0 and nc[b] > 0:
            pb, pc = nb[b] / tb, nc[b] / tc
            assert abs(r.psi_contrib - _round6((pc - pb) * math.log(pc / pb))) < 1e-9
        else:
            assert r.psi_contrib is None
