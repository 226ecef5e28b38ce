"""Brute-force property tests for plans/breadth_r55.py."""

from __future__ import annotations

import math

from matt3r_data_ingestion_serverless_spark.plans.breadth_r55 import (
    ml_average_precision,
    ml_lift_gains_table,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _scored(ev):
    out = []
    for r in ev:
        score = int(math.floor(1.0 / (1.0 + math.exp(-(r.value - 50.0) / 25.0)) * 1e6 + 0.5))
        out.append((r.event_id, score, 1 if r.event_type == "purchase" else 0))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def test_average_precision_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    ranked = _scored(ev)
    tp = 0
    ap_sum = 0
    for k, (_, _, pos) in enumerate(ranked, start=1):
        tp += pos
        if pos:
            ap_sum += (tp * 1000000) // k
    n_pos = tp
    row = ml_average_precision(spark, SF_SMOKE).collect()[0]
    assert (row.n, row.n_pos, row.ap_micro_sum) == (len(ranked), n_pos, ap_sum)
    assert abs(row.average_precision - _round6(ap_sum / n_pos / 1e6)) <= 1e-6
    # AP is bounded by 1 and at least the base rate
    assert n_pos / len(ranked) - 1e-6 <= row.average_precision <= 1.0


def _ntile10(n):
    base, rem = divmod(n, 10)
    sizes = [base + (1 if q <= rem else 0) for q in range(1, 11)]
    out = []
    for q, size in enumerate(sizes, start=1):
        out.extend([q] * size)
    return out


def test_lift_gains_match_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    ranked = _scored(ev)
    tiles = _ntile10(len(ranked))
    agg = {q: [0, 0] for q in range(1, 11)}
    for (_, _, pos), q in zip(ranked, tiles):
        agg[q][0] += 1
        agg[q][1] += pos
    n_tot = len(ranked)
    p_tot = sum(p for _, p in agg.values())
    got = {r.decile: r for r in ml_lift_gains_table(spark, SF_SMOKE).collect()}
    assert set(got) == set(range(1, 11))
    cum = 0
    for q in range(1, 11):
        n, p = agg[q]
        cum += p
        r = got[q]
        assert (r.n, r.n_pos) == (n, p)
        assert r.lift_milli == (p * n_tot * 1000) // (n * p_tot)
        assert r.cum_gain_micro == (cum * 1000000) // p_tot
    assert got[10].cum_gain_micro == 1000000
    # the model is informative: the top decile over-indexes
    assert got[1].lift_milli > 1000
