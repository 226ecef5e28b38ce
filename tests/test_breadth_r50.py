"""Brute-force property tests for plans/breadth_r50.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r50 import (
    graph_open_triads,
    weekday_seasonal_index,
)
from matt3r_data_ingestion_serverless_spark.plans.northstar import ns_dedup_minhash_lsh
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_weekday_index_matches_python(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    w = defaultdict(lambda: [0, 0])
    for o in orders:
        dow = (o.o_orderdate.weekday() + 1) % 7  # python Mon=0 → Sunday=0
        cents = int(math.floor(o.o_totalprice * 100 + 0.5))
        w[dow][0] += 1
        w[dow][1] += cents
    n_tot = sum(c[0] for c in w.values())
    s_tot = sum(c[1] for c in w.values())
    got = {r.dow: r for r in weekday_seasonal_index(spark, SF_SMOKE).collect()}
    assert set(got) == set(w)
    mean_tot_milli = (s_tot * 1000) // n_tot
    for dow, (n_w, s_w) in w.items():
        r = got[dow]
        assert (r.n_orders, r.revenue_cents) == (n_w, s_w)
        assert r.index_micro == (((s_w * 1000) // n_w) * 1000000) // mean_tot_milli
        idx = (s_w / n_w) / (s_tot / n_tot)
        assert abs(r.seasonal_index - _round6(idx)) <= 1e-6
        # integer and float forms agree to the milli-cent quantization
        assert abs(r.index_micro / 1e6 - r.seasonal_index) < 1e-3


def test_open_triads_match_python(spark):
    pairs = [(r.doc_a, r.doc_b) for r in ns_dedup_minhash_lsh(spark, SF_SMOKE).collect()]
    deg = defaultdict(int)
    eset = set(pairs)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    paths2 = sum(d * (d - 1) for d in deg.values()) // 2
    tris = 0
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
    for a, b in pairs:
        for c in adj.get(b, ()):
            if (a, c) in eset:
                tris += 1
    row = graph_open_triads(spark, SF_SMOKE).collect()[0]
    assert (row.n_paths2, row.n_triangles) == (paths2, tris)
    assert row.n_open_triads == paths2 - 3 * tris
    assert row.n_open_triads >= 0
    cc = 0.0 if paths2 == 0 else 3.0 * tris / paths2
    assert abs(row.global_clustering - _round6(cc)) <= 1e-6
    assert 0.0 <= row.global_clustering <= 1.0
