"""Brute-force property tests for plans/breadth_r43.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r43 import (
    _RBO_K,
    _RBO_P,
    _RBO_W,
    retrieval_rbo_topk,
    varint_delta_size_estimate,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def test_rbo_matches_python(spark):
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    norms = {i: math.sqrt(_fold_dot(v, v)) for i, v in vecs.items()}
    tvecs = {i: v[:16] for i, v in vecs.items()}
    tnorms = {i: math.sqrt(_fold_dot(v, v)) for i, v in tvecs.items()}
    got = {r.query_id: r for r in retrieval_rbo_topk(spark, SF_SMOKE).collect()}
    queries = [i for i in vecs if i % 100 == 7]
    assert set(got) == set(queries)
    for qid in queries:
        scored = []
        for cid in vecs:
            if cid == qid:
                continue
            fc = _round6(_fold_dot(vecs[qid], vecs[cid]) / (norms[qid] * norms[cid]))
            tc = _round6(_fold_dot(tvecs[qid], tvecs[cid]) / (tnorms[qid] * tnorms[cid]))
            scored.append((cid, fc, tc))
        top_a = [c for c, _, _ in sorted(scored, key=lambda s: (-s[1], s[0]))[:_RBO_K]]
        top_b = [c for c, _, _ in sorted(scored, key=lambda s: (-s[2], s[0]))[:_RBO_K]]
        num = 0
        for d in range(1, _RBO_K + 1):
            overlap = len(set(top_a[:d]) & set(top_b[:d]))
            num += overlap * _RBO_W[d - 1]
        ok = len(set(top_a) & set(top_b))
        r = got[qid]
        assert (r.rbo_micro_num, getattr(r, f"overlap_at_{_RBO_K}")) == (num, ok)
        rbo = num / 1e6 + (_RBO_P**_RBO_K) * ok / _RBO_K
        assert abs(r.rbo_ext - _round6(rbo)) <= 1e-6
        assert 0.0 <= r.rbo_ext <= 1.0 + 1e-9


def _vlen(zz: int) -> int:
    for k in range(1, 9):
        if zz < 1 << (7 * k):
            return k
    return 9


def test_varint_estimate_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.event_type].append((r.ts, r.event_id))
    got = {r.event_type: r for r in varint_delta_size_estimate(spark, SF_SMOKE).collect()}
    assert set(got) == set(per)
    for et, rows in per.items():
        us = [int(t.timestamp() * 1e6) for t, _ in sorted(rows)]
        deltas = [b - a for a, b in zip(us, us[1:])]
        total = sum(_vlen(2 * d if d >= 0 else -2 * d - 1) for d in deltas)
        r = got[et]
        assert r.n_deltas == len(deltas)
        assert r.raw_bytes == 8 * len(deltas)
        assert r.varint_bytes == total
        assert abs(r.savings_ratio - _round6(1.0 - total / (8 * len(deltas)))) <= 1e-6
        assert r.varint_bytes < r.raw_bytes  # sorted deltas always win
