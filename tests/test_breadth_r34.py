"""Brute-force property tests for plans/breadth_r34.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r34 import (
    _MUS_INTERVAL,
    cramers_v_type_dow,
    ks_two_sample_types,
    monetary_unit_sampling,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_cramers_v_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    cells = Counter()
    for r in ev:
        # Spark dayofweek: 1=Sunday..7=Saturday; python weekday: Mon=0
        dow = (r.ts.weekday() + 1) % 7 + 1
        cells[(r.event_type, dow)] += 1
    n = sum(cells.values())
    rx = Counter()
    cy = Counter()
    for (et, dow), o in cells.items():
        rx[et] += o
        cy[dow] += o
    chi_micro = 0
    for (et, dow), o in cells.items():
        num = o * n - rx[et] * cy[dow]
        chi_micro += int(math.floor(num * num / (rx[et] * cy[dow] * n) * 1e6 + 0.5))
    row = cramers_v_type_dow(spark, SF_SMOKE).collect()[0]
    assert (row.n, row.n_rows, row.n_cols) == (n, len(rx), len(cy))
    assert row.chi2_micro == chi_micro
    v = math.sqrt(chi_micro / 1e6 / (n * (min(len(rx), len(cy)) - 1)))
    assert abs(row.cramers_v - _round6(v)) <= 1e-6
    assert 0 <= row.cramers_v <= 1


def test_mus_matches_python(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    cum = 0
    expected = {}
    for o in sorted(orders, key=lambda x: x.o_orderkey):
        cents = int(math.floor(o.o_totalprice * 100 + 0.5))
        lo, cum = cum, cum + cents
        hits = cum // _MUS_INTERVAL - lo // _MUS_INTERVAL
        if hits > 0:
            expected[o.o_orderkey] = (cents, cum, hits)
    got = {
        r.o_orderkey: (r.cents, r.cum_cents, r.n_hits)
        for r in monetary_unit_sampling(spark, SF_SMOKE).collect()
    }
    assert got == expected
    # PPS property: total hits equals interval crossings of the grand total
    assert sum(h for _, _, h in got.values()) == cum // _MUS_INTERVAL


def test_ks_two_sample_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    c1 = Counter()
    c2 = Counter()
    for r in ev:
        cents = int(math.floor(r.value * 100 + 0.5))
        if r.event_type == "purchase":
            c1[cents] += 1
        elif r.event_type == "click":
            c2[cents] += 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    f1 = f2 = 0
    best = (-1, -1)
    for cents in sorted(set(c1) | set(c2)):
        f1 += c1.get(cents, 0)
        f2 += c2.get(cents, 0)
        num = abs(f1 * n2 - f2 * n1)
        if num > best[0] or (num == best[0] and cents > best[1]):
            best = (num, cents)
    row = ks_two_sample_types(spark, SF_SMOKE).collect()[0]
    assert (row.n_purchase, row.n_click) == (n1, n2)
    assert row.d_at_cents == best[1]
    assert abs(row.d_stat - _round6(best[0] / (n1 * n2))) <= 1e-6
