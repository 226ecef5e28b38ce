"""Brute-force property tests for plans/breadth_r91.py."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r91 import (
    _IPF_ITERS,
    _OB_DAY1,
    _OB_SPLIT,
    _WF_BUDGET_FRAC,
    ns_budget_water_filling,
    stats_ipf_raking,
    stats_oaxaca_blinder,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_ipf_matches_python_and_hits_row_targets(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    grid = Counter()
    for r in ev:
        grid[(r.event_type, r.ts.isoweekday())] += 1
    cells = {k: float(v) for k, v in grid.items()}
    t = sum(cells.values())
    for _ in range(_IPF_ITERS):
        rows = defaultdict(float)
        for (i, j), v in cells.items():
            rows[i] += v
        cells = {k: v * (t / 5.0) / rows[k[0]] for k, v in cells.items()}
        cols = defaultdict(float)
        for (i, j), v in cells.items():
            cols[j] += v
        cells = {k: v * (t / 7.0) / cols[k[1]] for k, v in cells.items()}
    got = {
        (r.event_type, r.dow): r.raked_r
        for r in stats_ipf_raking(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(cells)
    for k in cells:
        assert math.isclose(got[k], cells[k], abs_tol=1e-6)
    # after the final column sweep every column marginal is exact
    cols = defaultdict(float)
    for (i, j), v in cells.items():
        cols[j] += v
    for j, s in cols.items():
        assert math.isclose(s, t / 7.0, rel_tol=1e-9)


def test_water_filling_exhausts_budget_and_caps(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    avail = Counter(r.source for r in docs)
    budget = math.floor(sum(avail.values()) * _WF_BUDGET_FRAC)
    got = {
        r.source: (r.available, r.alloc_r)
        for r in ns_budget_water_filling(spark, SF_SMOKE).collect()
    }
    assert {s: a for s, (a, _) in got.items()} == dict(avail)
    total_alloc = sum(a for _, a in got.values())
    assert math.isclose(total_alloc, budget, abs_tol=1e-3)
    levels = {a for s, (av, a) in got.items() if a < av - 1e-9}
    # every non-saturated source sits at the common water level
    assert len(levels) <= 1
    for s, (av, a) in got.items():
        assert a <= av + 1e-9


def test_oaxaca_blinder_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    split = dt.datetime.fromisoformat(_OB_SPLIT)
    day1 = dt.datetime.fromisoformat(_OB_DAY1)
    agg = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        c = int(math.floor(r.value * 100 + 0.5))
        a = agg[r.user_id]
        if r.ts < split:
            a[0] += c
        else:
            a[1] += c
        if r.event_type == "error" and r.ts < day1:
            a[2] = 1

    def fit(rows):
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        sxy = sum(x * y for x, y in rows)
        sxx = sum(x * x for x, _ in rows)
        b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return sx / n, sy / n, b1, n

    g1 = [(v[0], v[1]) for v in agg.values() if v[2] == 1]
    g0 = [(v[0], v[1]) for v in agg.values() if v[2] == 0]
    mx1, my1, b11, n1 = fit(g1)
    mx0, my0, b10, n0 = fit(g0)
    gap = (my1 - my0) / 100
    explained = (mx1 - mx0) * b10 / 100
    row = stats_oaxaca_blinder(spark, SF_SMOKE).collect()[0]
    assert (row.n_treated, row.n_control) == (n1, n0)
    assert math.isclose(row.gap_r, gap, abs_tol=1e-6)
    assert math.isclose(row.explained_r, explained, abs_tol=1e-6)
    assert math.isclose(row.unexplained_r, gap - explained, abs_tol=1e-6)
    assert math.isclose(row.beta1_treated_r, b11, abs_tol=1e-6)
    assert math.isclose(row.beta1_control_r, b10, abs_tol=1e-6)
