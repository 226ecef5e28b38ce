"""Brute-force property test for plans/breadth_r58.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r58 import ks_exponential_fit
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_ks_exponential_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.event_type].append((r.ts, r.event_id))
    got = {r.event_type: r for r in ks_exponential_fit(spark, SF_SMOKE).collect()}
    assert set(got) == set(per)
    for et, rows in per.items():
        us = [int(t.timestamp() * 1e6) for t, _ in sorted(rows)]
        gaps = [b - a for a, b in zip(us, us[1:]) if b - a > 0]
        n, s = len(gaps), sum(gaps)
        cnts = Counter(gaps)
        cum = 0
        best = -1
        for gap in sorted(cnts):
            c = cnts[gap]
            lo = cum
            cum += c
            cdf = int(math.floor((1.0 - math.exp(-(float(gap) * n / s))) * 1e6 + 0.5))
            num = max(abs(cum * 1000000 - n * cdf), abs(lo * 1000000 - n * cdf))
            best = max(best, num)
        r = got[et]
        assert r.n_gaps == n
        assert r.d_num == best
        assert abs(r.d_stat - _round6(best / (n * 1e6))) <= 1e-6
        assert 0.0 <= r.d_stat <= 1.0
