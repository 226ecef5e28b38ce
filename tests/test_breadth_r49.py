"""Brute-force property tests for plans/breadth_r49.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r49 import (
    cohens_kappa_raters,
    lorenz_curve_deciles,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_kappa_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    a = b = c = d = 0
    for r in ev:
        r1 = r.value > 100
        r2 = r.event_type in ("purchase", "signup")
        if r1 and r2:
            a += 1
        elif r1:
            b += 1
        elif r2:
            c += 1
        else:
            d += 1
    n = a + b + c + d
    row = cohens_kappa_raters(spark, SF_SMOKE).collect()[0]
    assert (row.n, row.both_pos, row.both_neg, row.disagreements) == (n, a, d, b + c)
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    assert abs(row.p_observed - _round6(po)) <= 1e-6
    assert abs(row.p_expected - _round6(pe)) <= 1e-6
    assert abs(row.kappa - _round6((po - pe) / (1 - pe))) <= 1e-6
    assert -1.0 <= row.kappa <= 1.0


def _ntile10(ordered):
    n = len(ordered)
    base, rem = divmod(n, 10)
    out = []
    pos = 0
    for q in range(1, 11):
        size = base + (1 if q <= rem else 0)
        out.extend([q] * size)
        pos += size
    return out


def test_lorenz_deciles_match_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    rev = defaultdict(int)
    for r in li:
        rev[r.l_suppkey] += int(math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5))
    ordered = sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))
    tiles = _ntile10([k for k, _ in ordered])
    total = sum(rev.values())
    dec = defaultdict(lambda: [0, 0])
    for (sk, cents), q in zip(ordered, tiles):
        cell = dec[q]
        cell[0] += 1
        cell[1] += cents
    got = {r.decile: r for r in lorenz_curve_deciles(spark, SF_SMOKE).collect()}
    assert set(got) == set(range(1, 11))
    cum = 0
    prev_share = -1
    for q in range(1, 11):
        n_s, cents = dec[q]
        cum += cents
        r = got[q]
        assert (r.n_suppliers, r.decile_cents) == (n_s, cents)
        assert r.cum_share_micro == (cum * 1000000) // total
        assert r.cum_share_micro > prev_share  # monotone Lorenz curve
        prev_share = r.cum_share_micro
    assert got[10].cum_share_micro == 1000000  # curve ends at 100%
