"""Brute-force property tests for plans/breadth_r94.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r94 import (
    _KANON_K,
    _KANON_LEVELS,
    ml_f1_threshold_sweep,
    ops_wspt_schedule,
    privacy_generalization_ladder,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _week_start(d):
    return d - __import__("datetime").timedelta(days=d.weekday())


def test_generalization_ladder_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    want = {}
    for lvl, m, tb in _KANON_LEVELS:
        classes = Counter()
        for r in ev:
            if tb == "hour":
                t = r.ts.replace(minute=0, second=0, microsecond=0)
            elif tb == "day":
                t = r.ts.date()
            else:
                t = _week_start(r.ts.date())
            classes[(r.user_id % m, t)] += 1
        want[lvl] = (len(classes), min(classes.values()))
    got = {
        r.level: r for r in privacy_generalization_ladder(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    anon = [
        lvl for lvl, (_, mn) in want.items() if mn >= _KANON_K
    ]
    for lvl, (nc, mn) in want.items():
        r = got[lvl]
        assert (r.n_classes, r.min_class_size) == (nc, mn)
        assert r.k_anonymous == (mn >= _KANON_K)
        assert r.chosen == (bool(anon) and lvl == min(anon))
    # the ladder must be non-trivial: at least one level fails k
    assert any(mn < _KANON_K for _, mn in want.values())


def test_f1_sweep_matches_exhaustive(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    pts = [
        (int(math.floor(r.value * 100 + 0.5)), int(r.event_type == "purchase"))
        for r in ev
        if r.value is not None
    ]
    p = sum(l for _, l in pts)
    best = None
    for thr in sorted({s for s, _ in pts}):
        tp = sum(l for s, l in pts if s >= thr)
        fp = sum(1 - l for s, l in pts if s >= thr)
        f1 = 2 * tp / (2 * tp + fp + (p - tp))
        key = (-math.floor(f1 * 1e6 + 0.5), thr)
        if best is None or key < best[0]:
            best = (key, thr, tp, fp, f1)
    _, thr, tp, fp, f1 = best
    row = ml_f1_threshold_sweep(spark, SF_SMOKE).collect()[0]
    assert (row.tp, row.fp, row.n_pos) == (tp, fp, p)
    assert math.isclose(row.threshold_r, thr / 100, abs_tol=1e-6)
    assert math.isclose(row.f1_r, f1, abs_tol=1e-6)
    assert 0 < f1 <= 1


def test_wspt_matches_python_and_is_optimal(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    jobs = [
        (
            r.o_orderkey,
            int(round(r.o_totalprice)),
            6 - int(r.o_orderpriority[0]),
        )
        for r in orders
        if r.o_orderkey % 20 == 0
    ]
    sched = sorted(jobs, key=lambda j: (j[1] / j[2], j[0]))
    t, twc = 0, 0
    for job, pr, w in sched:
        t += pr
        twc += w * t
    row = ops_wspt_schedule(spark, SF_SMOKE).collect()[0]
    assert row.n_jobs == len(jobs)
    assert row.total_weighted_completion == twc
    assert row.first_job == sched[0][0]
    assert row.makespan == sum(p for _, p, _ in jobs)
    # Smith's rule optimality: any adjacent swap cannot improve
    for i in range(len(sched) - 1):
        (j1, p1, w1), (j2, p2, w2) = sched[i], sched[i + 1]
        assert p1 * w2 <= p2 * w1 + 1e-9
