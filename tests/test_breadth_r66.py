"""Brute-force property tests for plans/breadth_r66.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r66 import (
    consolidation_what_if_hhi,
    single_source_parts_risk,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_single_source_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    per = defaultdict(lambda: [set(), 0])
    for r in li:
        cents = int(math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5))
        cell = per[r.l_partkey]
        cell[0].add(r.l_suppkey)
        cell[1] += cents
    total = sum(c for _, c in per.values())
    single = [(pk, c) for pk, (sups, c) in per.items() if len(sups) == 1]
    row = single_source_parts_risk(spark, SF_SMOKE).collect()[0]
    assert row.n_parts == len(per)
    assert row.single_source_parts == len(single)
    at_risk = sum(c for _, c in single)
    assert row.at_risk_cents == at_risk
    assert row.at_risk_share_micro == (at_risk * 1000000) // total
    assert row.max_suppliers_per_part == max(len(s) for s, _ in per.values())


def test_consolidation_what_if_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    sup = {s.s_suppkey: s.s_nationkey for s in load_table(spark, SF_SMOKE, "supplier").collect()}
    flow = defaultdict(int)
    for r in li:
        cents = int(math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5))
        flow[(sup[r.l_suppkey], r.l_partkey, r.l_suppkey)] += cents
    before = defaultdict(lambda: defaultdict(int))
    parts = defaultdict(lambda: defaultdict(dict))
    for (nk, pk, sk), c in flow.items():
        before[nk][sk] += c
        parts[nk][pk][sk] = c
    after = defaultdict(lambda: defaultdict(int))
    for nk, by_part in parts.items():
        for pk, sups in by_part.items():
            top = sorted(sups.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            after[nk][top] += sum(sups.values())

    def hhi(rev, total):
        return sum(((c * 1000000) // total) ** 2 for c in rev.values())

    got = {r.nationkey: r for r in consolidation_what_if_hhi(spark, SF_SMOKE).collect()}
    assert set(got) == set(before)
    for nk in before:
        total = sum(before[nk].values())
        hb = hhi(before[nk], total)
        ha = hhi(after[nk], total)
        r = got[nk]
        assert (r.hhi_before_sq_micro, r.hhi_after_sq_micro) == (hb, ha)
        assert r.hhi_delta_sq_micro == ha - hb
        # consolidation can only concentrate (weakly)
        assert r.hhi_delta_sq_micro >= 0
