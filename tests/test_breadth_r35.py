"""Brute-force property tests for plans/breadth_r35.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r35 import (
    _B,
    _K1,
    _OR_TERMS,
    _OR_TOP_K,
    any_all_predicates,
    keyword_search_disjunctive,
    quartile_mobility_matrix,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_disjunctive_search_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    toks = {d.doc_id: [t for t in d.text.lower().split(" ") if t != ""] for d in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    tf = defaultdict(Counter)
    for i, ts in toks.items():
        for t in ts:
            if t in _OR_TERMS:
                tf[i][t] += 1
    df = Counter()
    for i in tf:
        for t in tf[i]:
            df[t] += 1
    scores = {}
    for i, cnts in tf.items():
        per_term = []
        for t in _OR_TERMS:
            if t in cnts:
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s = idf * (cnts[t] * (_K1 + 1.0)) / (
                    cnts[t] + _K1 * (1.0 - _B + (_B * dl[i]) / avgdl)
                )
                per_term.append(_round6(s))
            else:
                per_term.append(0.0)
        total = per_term[0]
        for s in per_term[1:]:
            total += s
        scores[i] = (_round6(total), len(cnts))
    order = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:_OR_TOP_K]
    rows = keyword_search_disjunctive(spark, SF_SMOKE).collect()
    assert [(r.doc_id, r.rnk) for r in sorted(rows, key=lambda r: r.rnk)] == [
        (i, k + 1) for k, (i, _) in enumerate(order)
    ]
    for r in rows:
        assert abs(r.score - scores[r.doc_id][0]) <= 1e-6
        assert r.n_terms_hit == scores[r.doc_id][1]


def test_any_all_matches_python(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    urgent = [o.o_totalprice for o in orders if o.o_orderpriority == "1-URGENT"]
    mx, mn = max(urgent), min(urgent)
    agg = defaultdict(lambda: [0, 0, 0])
    for o in orders:
        cell = agg[o.o_orderpriority]
        cell[0] += 1
        cell[1] += o.o_totalprice > mx
        cell[2] += o.o_totalprice > mn
    got = {r.o_orderpriority: r for r in any_all_predicates(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for p, (n, na, nb) in agg.items():
        r = got[p]
        assert (r.n, r.n_above_all, r.n_above_any) == (n, na, nb)
        assert r.n_above_all <= r.n_above_any  # ALL implies ANY


def _ntile4(ordered_ids):
    n = len(ordered_ids)
    base, rem = divmod(n, 4)
    out = {}
    pos = 0
    for q in range(1, 5):
        size = base + (1 if q <= rem else 0)
        for uid in ordered_ids[pos : pos + size]:
            out[uid] = q
        pos += size
    return out


def test_mobility_matrix_matches_python(spark):
    from datetime import timezone

    ev = load_table(spark, SF_SMOKE, "events").collect()
    weekly = defaultdict(lambda: defaultdict(int))
    for r in ev:
        us = int(r.ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        weekly[us // 604_800_000_000][r.user_id] += int(
            math.floor(r.value * 100 + 0.5)
        )
    quart = {}
    for p, users in weekly.items():
        ordered = [u for u, _ in sorted(users.items(), key=lambda kv: (kv[1], kv[0]))]
        quart[p] = _ntile4(ordered)
    moves = Counter()
    for p in sorted(quart):
        if p + 1 not in quart:
            continue
        for uid, q in quart[p].items():
            if uid in quart[p + 1]:
                moves[(q, quart[p + 1][uid])] += 1
    assert moves, "fixture spans multiple 7-day periods"
    got = {
        (r.from_q, r.to_q): r.n_transitions
        for r in quartile_mobility_matrix(spark, SF_SMOKE).collect()
    }
    assert got == dict(moves)
