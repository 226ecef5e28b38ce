"""Brute-force property tests for plans/breadth_r75.py."""

from __future__ import annotations

from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r75 import (
    dq_column_profile,
    dq_constraint_checks,
    dq_partition_completeness,
    shuffle_skew_profile,
    trimmed_mean_by_type,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_column_profile_matches_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    cols = {
        "event_id": [r.event_id for r in ev],
        "user_id": [r.user_id for r in ev],
        "event_type": [r.event_type for r in ev],
        "cents": [None if r.value is None else round(r.value * 100) for r in ev],
        "props": [r.props for r in ev],
    }
    got = {r.col_name: r for r in dq_column_profile(spark, SF_SMOKE).collect()}
    assert set(got) == set(cols)
    for name, vals in cols.items():
        nn = [v for v in vals if v is not None]
        assert got[name].n_rows == len(vals)
        assert got[name].n_nulls == len(vals) - len(nn)
        assert got[name].n_distinct == len(set(nn))
        assert got[name].min_str == str(min(nn))
        assert got[name].max_str == str(max(nn))


def test_constraint_checks_clean_tables_pass(spark):
    rows = {r.constraint_name: r for r in dq_constraint_checks(spark, SF_SMOKE).collect()}
    assert set(rows) == {
        "orderkey_unique",
        "custkey_not_null",
        "lineitem_fk_orders",
        "orders_fk_customer",
        "totalprice_positive",
        "status_in_domain",
    }
    orders = load_table(spark, SF_SMOKE, "orders").count()
    li = load_table(spark, SF_SMOKE, "lineitem").count()
    for name, r in rows.items():
        assert r.n_violations == 0, f"{name} must pass on the generated tables"
    assert rows["orderkey_unique"].n_checked == orders
    assert rows["lineitem_fk_orders"].n_checked == li


def test_partition_completeness_grid(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per_day = Counter(r.ts.date() for r in ev)
    rows = {r.day: r for r in dq_partition_completeness(spark, SF_SMOKE).collect()}
    lo, hi = min(per_day), max(per_day)
    assert len(rows) == (hi - lo).days + 1  # full grid, gaps included
    for day, r in rows.items():
        import datetime as dt

        d = dt.date.fromisoformat(day)
        assert r.n_events == per_day.get(d, 0)
        assert r.is_missing == (d not in per_day)


def test_trimmed_mean_matches_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    groups = defaultdict(list)
    for r in ev:
        if r.value is not None:
            groups[r.event_type].append((round(r.value * 100), r.event_id))
    rows = {r.event_type: r for r in trimmed_mean_by_type(spark, SF_SMOKE).collect()}
    for et, vals in groups.items():
        vals.sort()
        k = len(vals) // 10
        kept = [c for c, _ in vals[k: len(vals) - k]]
        assert rows[et].n_total == len(vals)
        assert rows[et].n_kept == len(kept)
        assert rows[et].sum_kept_cents == sum(kept)
        assert k > 0, "smoke SF must actually trim rows"


def test_skew_profile_matches_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    counts = Counter(r.user_id for r in ev)
    ranked = sorted((c, uid) for uid, c in counts.items())
    k, t = len(ranked), sum(c for c, _ in ranked)
    s1 = sum((i + 1) * c for i, (c, _) in enumerate(ranked))
    row = shuffle_skew_profile(spark, SF_SMOKE).collect()[0]
    assert row.n_keys == k
    assert row.total_rows == t
    assert row.max_key_rows == max(counts.values())
    gini = 2 * s1 / (k * t) - (k + 1) / k
    assert abs(row.gini - gini) < 1e-6
    assert 0 <= row.gini < 1