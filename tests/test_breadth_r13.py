"""Brute-force property tests for plans/breadth_r13.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r13 import (
    _LP_MIN_JACCARD,
    graph_link_prediction,
    ts_numerical_derivative,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_derivative_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    tracks = defaultdict(list)
    for r in ev:
        if r.event_type != "view":
            continue
        cents = int(math.floor(abs(r.value) * 100 + 0.5)) * (1 if r.value >= 0 else -1)
        tracks[r.user_id].append(
            (int(r.ts.timestamp() * 1_000_000), r.event_id, cents)
        )
    expected = {}
    for uid, pts in tracks.items():
        pts.sort(key=lambda t: (t[0], t[1]))
        for i in range(1, len(pts) - 1):
            t_prev, _, c_prev = pts[i - 1]
            t_us, eid, _ = pts[i]
            t_next, _, c_next = pts[i + 1]
            if t_next > t_prev:
                d = (c_next - c_prev) * 864.0 / ((t_next - t_prev) / 100000000.0)
                expected[(uid, eid)] = _round6(d)
    got = {
        (r.user_id, r.event_id): r.deriv_per_day
        for r in ts_numerical_derivative(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-9, k


def test_link_prediction_matches_python(spark):
    from matt3r_data_ingestion_serverless_spark.plans.northstar import (
        ns_dedup_minhash_lsh,
    )

    pairs = [
        (r.doc_a, r.doc_b)
        for r in ns_dedup_minhash_lsh(spark, SF_SMOKE).select("doc_a", "doc_b").collect()
    ]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if v in adj[u]:
                continue
            cn = len(adj[u] & adj[v])
            if cn == 0:
                continue
            jac = cn / (len(adj[u]) + len(adj[v]) - cn)
            if jac >= _LP_MIN_JACCARD:
                expected[(u, v)] = (cn, _round6(jac))
    got = {
        (r.doc_a, r.doc_b): (r.common_neighbors, r.nbr_jaccard)
        for r in graph_link_prediction(spark, SF_SMOKE).collect()
    }
    assert got == expected
