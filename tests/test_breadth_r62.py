"""Brute-force property tests for plans/breadth_r62.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r62 import (
    discount_band_curve,
    ns_doc_length_lognormal_fit,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_discount_bands_match_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in li:
        pct = int(math.floor(r.l_discount * 100 + 0.5))
        cell = agg[pct]
        cell[0] += 1
        cell[1] += int(r.l_quantity)
        cell[2] += int(math.floor(r.l_extendedprice * 100 + 0.5))
        cell[3] += int(math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5))
    got = {r.discount_pct: r for r in discount_band_curve(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for pct, (n, q, g, net) in agg.items():
        r = got[pct]
        assert (r.n_lines, r.total_qty, r.gross_cents, r.net_cents) == (n, q, g, net)
        assert r.qty_per_line_milli == (q * 1000) // n
        assert abs(r.realization_rate - _round6(net / g)) <= 1e-6
        # net never exceeds gross
        assert r.net_cents <= r.gross_cents


def test_lognormal_fit_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    lns = []
    for d in docs:
        n_tok = len([t for t in d.text.split(" ") if t != ""])
        if n_tok > 0:
            lns.append(int(math.floor(math.log(float(n_tok)) * 1e6 + 0.5)))
    n, s1 = len(lns), sum(lns)
    s2 = sum(x * x for x in lns)
    row = ns_doc_length_lognormal_fit(spark, SF_SMOKE).collect()[0]
    assert (row.n_docs, row.sum_ln_micro) == (n, s1)
    mu = s1 / n / 1e6
    sigma = math.sqrt((s2 - s1 * s1 / n) / (n - 1)) / 1e6
    assert abs(row.mu - _round6(mu)) <= 1e-6
    assert abs(row.sigma - _round6(sigma)) <= 1e-6
    assert abs(row.geometric_mean_tokens - _round6(math.exp(mu))) <= 1e-5
    assert row.sigma > 0
