"""Brute-force property tests for plans/breadth_r41.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r41 import (
    _MAHA_K,
    mahalanobis_outliers_diag,
    width_bucket_histogram,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_mahalanobis_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    feats = [
        (r.event_id, r.event_type, int(math.floor(r.value * 100 + 0.5)), r.ts.hour)
        for r in ev
    ]
    m = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sc, qc, sh, qh
    for _, et, c, h in feats:
        cell = m[et]
        cell[0] += 1
        cell[1] += c
        cell[2] += c * c
        cell[3] += h
        cell[4] += h * h

    def z2(x, n, s, q):
        num = float(x * n - s)
        den = float(n) * q - float(s) * s
        return int(math.floor(num * (x * n - s) / den / n * 1e6 + 0.5))

    scored = []
    for eid, et, c, h in feats:
        n, sc, qc, sh, qh = m[et]
        scored.append((eid, et, z2(c, n, sc, qc) + z2(h, n, sh, qh)))
    top = sorted(scored, key=lambda t: (-t[2], t[0]))[:_MAHA_K]
    rows = sorted(mahalanobis_outliers_diag(spark, SF_SMOKE).collect(), key=lambda r: r.rk)
    assert [(r.event_id, r.event_type, r.d2_micro) for r in rows] == top
    assert [r.rk for r in rows] == list(range(1, _MAHA_K + 1))
    for r in rows:
        assert abs(r.d2 - math.floor(r.d2_micro / 1e6 * 1e6 + 0.5) / 1e6) <= 1e-6


def test_width_bucket_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        if r.value < 0:
            b = 0
        elif r.value >= 500:
            b = 21
        else:
            b = int(math.floor(r.value / 25.0)) + 1
        cell = agg[b]
        cell[0] += 1
        cell[1] += int(math.floor(r.value * 100 + 0.5))
    got = {r.bucket: (r.n, r.sum_cents) for r in width_bucket_histogram(spark, SF_SMOKE).collect()}
    assert got == {b: tuple(v) for b, v in agg.items()}
    assert all(0 <= b <= 21 for b in got)
