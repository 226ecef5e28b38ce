"""Brute-force property tests for plans/breadth_r57.py."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r57 import (
    _MASK_PCT,
    _OTIF_DAYS,
    ns_span_corruption_plan,
    otif_service_level,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_otif_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    orders = {o.o_orderkey: o for o in load_table(spark, SF_SMOKE, "orders").collect()}
    per_order = defaultdict(lambda: [0, 0])  # worst_days, n_returned
    for r in li:
        o = orders[r.l_orderkey]
        dd = (r.l_shipdate.date() - o.o_orderdate.date()).days
        cell = per_order[r.l_orderkey]
        cell[0] = max(cell[0], dd)
        cell[1] += r.l_returnflag == "R"
    agg = defaultdict(lambda: [0, 0])
    for k, (worst, ret) in per_order.items():
        prio = orders[k].o_orderpriority
        agg[prio][0] += 1
        agg[prio][1] += worst <= _OTIF_DAYS and ret == 0
    got = {r.priority: r for r in otif_service_level(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for prio, (n, otif) in agg.items():
        r = got[prio]
        assert (r.n_orders, r.n_otif) == (n, otif)
        assert r.otif_share_micro == (otif * 1000000) // n
        assert 0.0 <= r.otif_rate <= 1.0


def test_span_corruption_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    got = {r.doc_id: r for r in ns_span_corruption_plan(spark, SF_SMOKE).collect()}
    expected_ids = {
        d.doc_id for d in docs if any(t for t in d.text.split(" ") if t != "")
    }
    assert set(got) == expected_ids
    total_rate = []
    for d in docs:
        n_tok = len([t for t in d.text.split(" ") if t != ""])
        if n_tok == 0:
            continue
        flags = [
            1 if _h64(f"mask{d.doc_id}:{p}") % 100 < _MASK_PCT else 0
            for p in range(1, n_tok + 1)
        ]
        spans = sum(
            1 for i, f in enumerate(flags) if f == 1 and (i == 0 or flags[i - 1] == 0)
        )
        r = got[d.doc_id]
        assert (r.n_tokens, r.n_masked, r.n_spans) == (n_tok, sum(flags), spans)
        assert r.corruption_micro == (sum(flags) * 1000000) // n_tok
        total_rate.append(r.corruption_micro)
    # realized corruption concentrates near the nominal 15%
    mean_rate = sum(total_rate) / len(total_rate) / 1e6
    assert 0.10 < mean_rate < 0.20
