"""Brute-force property tests for plans/breadth_r60.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r60 import (
    data_contract_audit,
    forecast_smape_naive,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_contract_audit_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    import datetime as dt

    enum = {"click", "view", "purchase", "signup", "error"}
    ts_bad = sum(
        1
        for r in ev
        if r.ts < dt.datetime(2020, 1, 1) or r.ts > dt.datetime(2030, 1, 1)
    )
    neg = sum(1 for r in ev if r.value < 0)
    unk = sum(1 for r in ev if r.event_type not in enum)
    nulls = sum(1 for r in ev if r.user_id is None)
    dups = len(ev) - len({r.event_id for r in ev})
    row = data_contract_audit(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == len(ev)
    assert (row.ts_out_of_range, row.negative_value, row.unknown_type) == (
        ts_bad,
        neg,
        unk,
    )
    assert (row.null_user, row.duplicate_ids) == (nulls, dups)
    assert row.contract_passed == (ts_bad + neg + unk + nulls + dups == 0)
    # driver-generated events satisfy the contract
    assert row.contract_passed


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def test_smape_matches_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    m = defaultdict(int)
    for r in li:
        m[r.l_shipdate.strftime("%Y-%m")] += int(math.floor(r.l_extendedprice * 100 + 0.5))
    months = sorted(m)
    terms = []
    for prev, cur in zip(months, months[1:]):
        a, f = m[cur], m[prev]
        terms.append(_tdiv(abs(a - f) * 2000000, a + f))
    row = forecast_smape_naive(spark, SF_SMOKE).collect()[0]
    assert row.n_months == len(terms)
    assert row.smape_micro_sum == sum(terms)
    assert row.worst_smape_micro == max(terms)
    assert abs(row.smape - _round6(sum(terms) / len(terms) / 1e6)) <= 1e-6
    assert 0.0 <= row.smape <= 2.0
