"""Brute-force property tests for plans/breadth_r38.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r38 import (
    cumulative_unique_users,
    graph_hits_hubs_authorities,
    hodges_lehmann_shift,
)
from matt3r_data_ingestion_serverless_spark.plans.northstar import ns_dedup_minhash_lsh
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_hits_matches_python(spark):
    edges = [
        (r.doc_a, r.doc_b) for r in ns_dedup_minhash_lsh(spark, SF_SMOKE).collect()
    ]
    nodes = sorted({x for e in edges for x in e})
    out_e = defaultdict(list)
    in_e = defaultdict(list)
    for s, t in edges:
        out_e[s].append(t)
        in_e[t].append(s)

    def normalize(raw):
        mx = max(raw.values())
        return {k: (v * 1000000) // mx for k, v in raw.items()}

    a1 = normalize({v: len(in_e[v]) * 1000000 for v in in_e})
    h1 = normalize({u: sum(a1[t] for t in out_e[u]) for u in out_e})
    a2 = normalize({v: sum(h1[s] for s in in_e[v] if s in h1) for v in in_e})
    # drop zero-valued nodes the engine never materializes
    a2 = {k: v for k, v in a2.items()}
    h2 = normalize({u: sum(a2.get(t, 0) for t in out_e[u]) for u in out_e})
    got = {r.doc_id: r for r in graph_hits_hubs_authorities(spark, SF_SMOKE).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        r = got[v]
        assert r.in_deg == len(in_e.get(v, []))
        assert r.out_deg == len(out_e.get(v, []))
        assert r.auth_micro == a2.get(v, 0)
        assert r.hub_micro == h2.get(v, 0)
    assert max(r.auth_micro for r in got.values()) == 1000000
    assert max(r.hub_micro for r in got.values()) == 1000000


def test_hodges_lehmann_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        if r.event_type in ("purchase", "click"):
            daily[r.event_type][r.ts.strftime("%Y-%m-%d")] += int(
                math.floor(r.value * 100 + 0.5)
            )
    p = list(daily["purchase"].values())
    c = list(daily["click"].values())
    diffs = sorted(a - b for a in p for b in c)
    n = len(diffs)
    row = hodges_lehmann_shift(spark, SF_SMOKE).collect()[0]
    assert row.n_pairs == n
    assert row.hl_lo_cents == diffs[(n + 1) // 2 - 1]
    assert row.hl_hi_cents == diffs[n // 2]
    assert row.min_diff == diffs[0]
    assert row.max_diff == diffs[-1]
    assert row.hl_lo_cents <= row.hl_hi_cents


def test_cumulative_users_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    first = {}
    for r in ev:
        d = r.ts.strftime("%Y-%m-%d")
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    new_users = Counter(first.values())
    rows = sorted(cumulative_unique_users(spark, SF_SMOKE).collect(), key=lambda r: r.day)
    assert [r.day for r in rows] == sorted(new_users)
    cum = 0
    for r in rows:
        assert r.new_users == new_users[r.day]
        cum += r.new_users
        assert r.cum_users == cum
    assert rows[-1].cum_users == len(first)
