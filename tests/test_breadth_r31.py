"""Brute-force property tests for plans/breadth_r31.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r31 import (
    _NGRAM_K,
    _NGRAM_N,
    ns_duplicate_ngram_spans,
    revenue_waterfall_monthly,
    union_by_name_evolution,
    user_transition_entropy,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_duplicate_ngrams_match_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    occ = Counter()
    reach = defaultdict(set)
    for d in docs:
        ts = [t for t in d.text.lower().split(" ") if t != ""]
        for i in range(len(ts) - _NGRAM_N + 1):
            g = " ".join(ts[i : i + _NGRAM_N])
            occ[g] += 1
            reach[g].add(d.doc_id)
    dups = [
        (g, occ[g], len(reach[g]))
        for g in occ
        if len(reach[g]) >= 2
    ]
    dups.sort(key=lambda t: (-t[2], -t[1], t[0]))
    rows = ns_duplicate_ngram_spans(spark, SF_SMOKE).collect()
    assert [(r.gram, r.n_occurrences, r.n_docs) for r in rows] == dups[:_NGRAM_K]


def test_transition_entropy_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    seqs = defaultdict(list)
    for r in ev:
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    got = {r.user_id: r for r in user_transition_entropy(spark, SF_SMOKE).collect()}
    expected_users = {u for u, rows in seqs.items() if len(rows) >= 2}
    assert set(got) == expected_users
    for uid in expected_users:
        types = [t for _, _, t in sorted(seqs[uid])]
        bigrams = Counter(f"{a}>{b}" for a, b in zip(types, types[1:]))
        n = sum(bigrams.values())
        acc = sum(
            c * int(math.floor(abs(math.log(c / n)) * 1e6 + 0.5))
            for c in bigrams.values()
        )
        r = got[uid]
        assert r.n_bigrams == n
        assert abs(r.bigram_entropy - _round6(acc / n / 1e6)) <= 1e-6
        assert r.bigram_entropy >= 0


def test_waterfall_reconciles_and_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in li:
        m = r.l_shipdate.strftime("%Y-%m")
        g = int(math.floor(r.l_extendedprice * 100 + 0.5))
        d = int(math.floor(r.l_extendedprice * r.l_discount * 100 + 0.5))
        t = int(math.floor(r.l_extendedprice * (1 - r.l_discount) * r.l_tax * 100 + 0.5))
        cell = agg[m]
        cell[0] += 1
        cell[1] += g
        cell[2] += d
        cell[3] += t
    got = {r.month: r for r in revenue_waterfall_monthly(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for m, (n, g, d, t) in agg.items():
        r = got[m]
        assert (r.n_lines, r.gross_cents, r.discount_cents, r.tax_cents) == (n, g, -d, t)
        # waterfall reconciles to the cent by construction
        assert r.net_cents == r.gross_cents + r.discount_cents + r.tax_cents


def test_union_by_name_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        cell = agg[r.event_type]
        cell[0] += 1
        if r.event_id % 2 == 0:
            cell[1] += 1
            cell[2] += int(math.floor(r.value * 100 + 0.5))
    got = {r.event_type: r for r in union_by_name_evolution(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for et, (n, nv, s) in agg.items():
        r = got[et]
        assert (r.n, r.n_with_value, r.sum_cents) == (n, nv, s)
