"""Brute-force property tests for plans/breadth_r61.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r61 import (
    ratio_to_report_window,
    string_format_surface,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_ratio_to_report_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    sup = {s.s_suppkey: s.s_nationkey for s in load_table(spark, SF_SMOKE, "supplier").collect()}
    rev = defaultdict(int)
    for r in li:
        rev[(sup[r.l_suppkey], r.l_suppkey)] += int(
            math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5)
        )
    by_nation = defaultdict(dict)
    for (nk, sk), c in rev.items():
        by_nation[nk][sk] = c
    expected = {}
    for nk, sups in by_nation.items():
        total = sum(sups.values())
        order = sorted(sups.items(), key=lambda kv: (-kv[1], kv[0]))
        # rank() semantics with the (cents desc, suppkey) total order: no ties
        for rk, (sk, c) in enumerate(order[:5], start=1):
            expected[(nk, sk)] = (c, (c * 1000000) // total, rk)
    got = {
        (r.nationkey, r.suppkey): (r.cents, r.share_micro, r.rk)
        for r in ratio_to_report_window(spark, SF_SMOKE).collect()
    }
    assert got == expected
    for (nk, _), (_, share, _) in got.items():
        assert 0 < share <= 1000000


def test_string_format_matches_python(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    expected = {}
    for o in orders:
        if o.o_orderkey % 997 != 0:
            continue
        expected[f"INV-{o.o_orderkey:08d}"] = (
            f"{o.o_orderpriority}/{o.o_orderstatus}",
            f"{o.o_totalprice:.2f}",
            str(o.o_custkey).rjust(10, "0"),
            len(f"INV-{o.o_orderkey:08d}"),
        )
    got = {
        r.invoice_no: (r.status_key, r.amount_str, r.cust_padded, r.key_len)
        for r in string_format_surface(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert got  # the modulus filter leaves at least one row at smoke SF
