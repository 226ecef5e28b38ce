"""Brute-force property tests for plans/breadth_r28.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r28 import (
    _KS_HI,
    _RRF_C,
    _RRF_DEPTH,
    _RRF_DIMS,
    _RRF_K,
    _TRIGRAM_K,
    backlog_month_end_snapshot,
    decimal_money_aggregates,
    event_sequence_ngrams,
    hhi_concentration,
    ks_uniform_test,
    retrieval_rrf_fusion,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_hhi_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    sup = {s.s_suppkey: s.s_nationkey for s in load_table(spark, SF_SMOKE, "supplier").collect()}
    nat = {n.n_nationkey: n.n_name for n in load_table(spark, SF_SMOKE, "nation").collect()}
    rev = Counter()
    for r in li:
        cents = int(math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5))
        rev[(sup[r.l_suppkey], r.l_suppkey)] += cents
    by_nation = defaultdict(dict)
    for (nk, sk), c in rev.items():
        by_nation[nk][sk] = c
    got = {r.nation: r for r in hhi_concentration(spark, SF_SMOKE).collect()}
    assert set(got) == {nat[nk] for nk in by_nation}
    for nk, sups in by_nation.items():
        total = sum(sups.values())
        shares = {sk: (c * 1000000) // total for sk, c in sups.items()}
        hhi = sum(s * s for s in shares.values()) / 1e12
        order = sorted(sups.items(), key=lambda kv: (-kv[1], kv[0]))
        cr4 = sum(shares[sk] for sk, _ in order[:4])
        r = got[nat[nk]]
        assert (r.n_suppliers, r.total_cents) == (len(sups), total)
        assert abs(r.hhi - _round6(hhi)) <= 1e-6
        assert r.top_share_micro == max(shares.values())
        assert r.cr4_micro == cr4
        assert r.cr4_micro >= r.top_share_micro  # CR4 dominates CR1


def test_trigram_motifs_match_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    seqs = defaultdict(list)
    for r in ev:
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    occurrences = Counter()
    users = defaultdict(set)
    for uid, rows in seqs.items():
        types = [t for _, _, t in sorted(rows)]
        for i in range(len(types) - 2):
            m = ">".join(types[i : i + 3])
            occurrences[m] += 1
            users[m].add(uid)
    top = sorted(occurrences.items(), key=lambda kv: (-kv[1], kv[0]))[:_TRIGRAM_K]
    rows = event_sequence_ngrams(spark, SF_SMOKE).collect()
    assert [(r.motif, r.n_occurrences) for r in rows] == top
    for r in rows:
        assert r.n_users == len(users[r.motif])


def test_backlog_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    shipped = {}
    for r in li:
        k = r.l_orderkey
        shipped[k] = max(shipped.get(k, r.l_shipdate), r.l_shipdate)
    backlog = defaultdict(lambda: [0, 0])
    for o in orders:
        if o.o_orderkey not in shipped:
            continue
        cents = int(math.floor(o.o_totalprice * 100 + 0.5))
        m = o.o_orderdate.year * 12 + (o.o_orderdate.month - 1)
        ship = shipped[o.o_orderkey]
        m_end = ship.year * 12 + (ship.month - 1)
        while m < m_end:
            cell = backlog[f"{m // 12:04d}-{m % 12 + 1:02d}"]
            cell[0] += 1
            cell[1] += cents
            m += 1
    got = {r.month: (r.open_orders, r.open_cents) for r in backlog_month_end_snapshot(spark, SF_SMOKE).collect()}
    assert got == {m: tuple(v) for m, v in backlog.items()}


def test_decimal_aggregates_match_python(spark):
    from decimal import Decimal

    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    groups = defaultdict(list)
    for r in li:
        q = Decimal(str(round(r.l_extendedprice, 2))).quantize(Decimal("0.01"))
        d = Decimal(str(round(r.l_discount, 2))).quantize(Decimal("0.01"))
        groups[r.l_returnflag].append((q, d))
    got = {r.l_returnflag: r for r in decimal_money_aggregates(spark, SF_SMOKE).collect()}
    assert set(got) == set(groups)
    for flag, vals in groups.items():
        r = got[flag]
        sp = sum(p for p, _ in vals)
        sd = sum(p * (1 - d) for p, d in vals)
        assert r.n == len(vals)
        assert abs(r.sum_price - float(sp)) < 1e-6
        assert r.min_price == float(min(p for p, _ in vals))
        assert r.max_price == float(max(p for p, _ in vals))
        assert abs(r.sum_discounted - float(sd)) < 1e-4
        assert abs(r.avg_price - _round6(float(sp) / len(vals))) <= 1e-6


def test_ks_uniform_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_type = defaultdict(Counter)
    for r in ev:
        by_type[r.event_type][int(math.floor(r.value * 100 + 0.5))] += 1
    got = {r.event_type: r for r in ks_uniform_test(spark, SF_SMOKE).collect()}
    for et, cnts in by_type.items():
        n = sum(cnts.values())
        cum = 0
        best = (-1, -1)
        for cents in sorted(cnts):
            lo = cum
            cum += cnts[cents]
            num = max(abs(cum * _KS_HI - cents * n), abs(lo * _KS_HI - cents * n))
            if num > best[0] or (num == best[0] and cents > best[1]):
                best = (num, cents)
        r = got[et]
        assert r.n == n
        assert abs(r.d_stat - _round6(best[0] / (n * _KS_HI))) <= 1e-6
        assert r.d_at_cents == best[1]


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def test_rrf_fusion_matches_python(spark):
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    norms = {i: math.sqrt(_fold_dot(v, v)) for i, v in vecs.items()}
    tvecs = {i: v[:_RRF_DIMS] for i, v in vecs.items()}
    tnorms = {i: math.sqrt(_fold_dot(v, v)) for i, v in tvecs.items()}
    got = defaultdict(dict)
    for r in retrieval_rrf_fusion(spark, SF_SMOKE).collect():
        got[r.query_id][r.match_id] = (r.rrf_micro, r.fused_rank)
    queries = [i for i in vecs if i % 100 == 7]
    assert set(got) == set(queries)
    for qid in queries:
        scored = []
        for cid in vecs:
            if cid == qid:
                continue
            fc = _round6(_fold_dot(vecs[qid], vecs[cid]) / (norms[qid] * norms[cid]))
            tc = _round6(
                _fold_dot(tvecs[qid], tvecs[cid]) / (tnorms[qid] * tnorms[cid])
            )
            scored.append((cid, fc, tc))
        ra = {cid: i + 1 for i, (cid, _, _) in enumerate(sorted(scored, key=lambda s: (-s[1], s[0])))}
        rb = {cid: i + 1 for i, (cid, _, _) in enumerate(sorted(scored, key=lambda s: (-s[2], s[0])))}
        fused = {}
        for cid, _, _ in scored:
            score = 0
            if ra[cid] <= _RRF_DEPTH:
                score += 1000000 // (_RRF_C + ra[cid])
            if rb[cid] <= _RRF_DEPTH:
                score += 1000000 // (_RRF_C + rb[cid])
            if score > 0:
                fused[cid] = score
        top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:_RRF_K]
        expected = {cid: (s, i + 1) for i, (cid, s) in enumerate(top)}
        assert got[qid] == expected
