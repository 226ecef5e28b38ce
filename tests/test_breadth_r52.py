"""Brute-force property tests for plans/breadth_r52.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r52 import (
    _MK_ITERS,
    markov_stationary_dist,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_markov_stationary_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    seqs = defaultdict(list)
    for r in ev:
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    cnt = Counter()
    for rows in seqs.values():
        types = [t for _, _, t in sorted(rows)]
        for a, b in zip(types, types[1:]):
            cnt[(a, b)] += 1
    rs = Counter()
    for (a, _), c in cnt.items():
        rs[a] += c
    states = sorted(rs)
    k = len(states)
    pi = {s: 1000000 // k for s in states}
    for _ in range(_MK_ITERS):
        nxt = defaultdict(int)
        for (a, b), c in cnt.items():
            nxt[b] += (pi[a] * c) // rs[a]
        pi = nxt
    h = {}
    for a in states:
        acc = sum(
            c * int(math.floor(abs(math.log(c / rs[a])) * 1e6 + 0.5))
            for (x, _), c in cnt.items()
            if x == a
        )
        h[a] = acc // rs[a]
    got = {r.state: r for r in markov_stationary_dist(spark, SF_SMOKE).collect()}
    assert set(got) == set(states)
    total_pi = 0
    for s in states:
        r = got[s]
        assert r.n_transitions_out == rs[s]
        assert r.stationary_micro == pi.get(s, 0)
        assert r.row_entropy_micro == h[s]
        assert r.entropy_contrib_micro == (pi.get(s, 0) * h[s]) // 1000000
        total_pi += r.stationary_micro
    # floors only ever lose mass: the distribution sums to ~1e6 from below
    assert 1000000 - 5000 <= total_pi <= 1000000
