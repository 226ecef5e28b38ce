"""Brute-force property tests for plans/breadth_r54.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r54 import (
    anova_twoway_interaction,
    nps_score_by_type,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def test_nps_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        cell = agg[r.event_type]
        cell[0] += 1
        cell[1] += r.value >= 200
        cell[2] += r.value < 50
    got = {r.event_type: r for r in nps_score_by_type(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for et, (n, p, d) in agg.items():
        r = got[et]
        assert (r.n, r.promoters, r.detractors) == (n, p, d)
        assert r.passives == n - p - d
        assert r.nps_micro == _tdiv((p - d) * 1000000, n)
        assert abs(r.nps_score - _round6((p - d) / n * 100.0)) <= 1e-6
        assert -100.0 <= r.nps_score <= 100.0


def test_twoway_anova_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    cells = defaultdict(lambda: [0, 0])
    for r in ev:
        a = 1 if r.ts.weekday() >= 5 else 0
        b = 1 if r.ts.hour >= 12 else 0
        cents = int(math.floor(r.value * 100 + 0.5))
        cells[(a, b)][0] += 1
        cells[(a, b)][1] += cents
    m_cell = {k: _tdiv(s * 1000, n) for k, (n, s) in cells.items()}
    ma = {}
    mb = {}
    for lvl in (0, 1):
        na = sum(n for (a, _), (n, _) in cells.items() if a == lvl)
        sa = sum(s for (a, _), (_, s) in cells.items() if a == lvl)
        ma[lvl] = (_tdiv(sa * 1000, na), na)
        nb = sum(n for (_, b), (n, _) in cells.items() if b == lvl)
        sb = sum(s for (_, b), (_, s) in cells.items() if b == lvl)
        mb[lvl] = (_tdiv(sb * 1000, nb), nb)
    n_tot = sum(n for n, _ in cells.values())
    s_tot = sum(s for _, s in cells.values())
    g = _tdiv(s_tot * 1000, n_tot)
    ssa = sum(_tdiv(na * (m - g) * (m - g), 1000000) for m, na in ma.values())
    ssb = sum(_tdiv(nb * (m - g) * (m - g), 1000000) for m, nb in mb.values())
    ssab = 0
    for (a, b), (n, _) in cells.items():
        dev = m_cell[(a, b)] - ma[a][0] - mb[b][0] + g
        ssab += _tdiv(n * dev * dev, 1000000)
    row = anova_twoway_interaction(spark, SF_SMOKE).collect()[0]
    assert row.n == n_tot
    assert (row.ss_weekend_cents2, row.ss_daypart_cents2, row.ss_interaction_cents2) == (
        ssa,
        ssb,
        ssab,
    )
    share = ssab / (ssa + ssb + ssab)
    assert abs(row.interaction_share - _round6(share)) <= 1e-6
    assert 0.0 <= row.interaction_share <= 1.0
