"""Brute-force property tests for plans/breadth_r74.py."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r74 import (
    _BK_K,
    _EQD_BUCKETS,
    _SSJ_DEN,
    _SSJ_NUM,
    er_fuzzy_blocked_pairs,
    histogram_equi_depth,
    mad_robust_outliers,
    ns_setsim_prefix_join,
    sample_bottomk_priority,
    seq_pattern_match_counts,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    import math

    s = -1.0 if x < 0 else (0.0 if x == 0 else 1.0)
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6


def test_setsim_prefix_join_matches_bruteforce(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    sets = {}
    for r in docs:
        ws = r.text.split(" ")
        if len(ws) >= 3:
            sets[r.doc_id] = frozenset(
                " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
            )
    want = {}
    ids = sorted(sets)
    for idx, u in enumerate(ids):
        for w in ids[idx + 1:]:
            i = len(sets[u] & sets[w])
            uni = len(sets[u] | sets[w])
            if _SSJ_DEN * i >= _SSJ_NUM * uni:
                want[(u, w)] = (i, len(sets[u]), len(sets[w]), _round6(i / uni))
    got = {
        (r.u, r.w): (r.inter, r.sz_u, r.sz_w, r.jac)
        for r in ns_setsim_prefix_join(spark, SF_SMOKE).collect()
    }
    assert want, "smoke corpus must exercise the join"
    assert got == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_er_fuzzy_blocked_pairs_matches_bruteforce(spark):
    names = sorted(
        {r.p_name for r in load_table(spark, SF_SMOKE, "part").collect()}
    )
    want = set()
    for a in names:
        for b in names:
            if a < b and a.split(" ")[-1] == b.split(" ")[-1]:
                d = _lev(a.split(" ")[0], b.split(" ")[0])
                if d <= 2:
                    want.add((a, b, a.split(" ")[-1], d))
    got = {
        (r.name_a, r.name_b, r.block_key, r.edit_dist)
        for r in er_fuzzy_blocked_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert want, "smoke parts must produce at least one fuzzy pair"


def test_seq_pattern_counts_match_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    seqs = defaultdict(list)
    for r in ev:
        seqs[r.user_id].append((int(r.ts.timestamp() * 1e6), r.event_id, r.event_type[0]))
    rows = {r.user_id: r for r in seq_pattern_match_counts(spark, SF_SMOKE).collect()}
    assert set(rows) == set(seqs)
    some_vp = False
    for uid, items in seqs.items():
        s = "".join(sym for _, _, sym in sorted(items))
        vp = (len(s) - len(s.replace("vp", ""))) // 2
        cvp = (len(s) - len(s.replace("cvp", ""))) // 3
        assert rows[uid].n_events == len(items)
        assert rows[uid].vp_count == vp
        assert rows[uid].cvp_count == cvp
        some_vp = some_vp or vp > 0
    assert some_vp


def test_mad_outliers_match_bruteforce(spark):
    import statistics

    ev = load_table(spark, SF_SMOKE, "events").collect()
    vals = defaultdict(list)
    for r in ev:
        if r.value is not None:
            vals[r.event_type].append(round(r.value * 100))
    rows = {r.event_type: r for r in mad_robust_outliers(spark, SF_SMOKE).collect()}
    for et, xs in vals.items():
        med = statistics.median(xs)
        ads = [abs(x - med) for x in xs]
        mad = statistics.median(ads)
        assert rows[et].med_cents == med
        assert rows[et].mad_cents == mad
        assert rows[et].n_outliers == sum(1 for a in ads if a > 5 * mad)


def test_bottomk_priority_sample(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    ranked = sorted(
        (hashlib.md5(str(r.event_id).encode()).hexdigest(), r.event_id) for r in ev
    )[:_BK_K]
    got = [(r.priority, r.event_id) for r in sample_bottomk_priority(spark, SF_SMOKE).collect()]
    assert got == ranked


def test_equi_depth_histogram_depths_and_bounds(spark):
    rows = sorted(
        histogram_equi_depth(spark, SF_SMOKE).collect(), key=lambda r: r.bucket
    )
    assert len(rows) == _EQD_BUCKETS
    total = sum(r.n for r in rows)
    # equal depth within 1 row (ntile's contract)
    assert max(r.n for r in rows) - min(r.n for r in rows) <= 1
    # buckets tile the value range in order (boundaries may share a value)
    for a, b in zip(rows, rows[1:]):
        assert a.lo_cents <= a.hi_cents <= b.lo_cents
    orders = load_table(spark, SF_SMOKE, "orders").count()
    assert total == orders
