"""Unit tests for the time-series join operators
(operators/temporal.py) beyond the oracle-parity sweep: tolerance
semantics, exact-timestamp ties, and interval-coalesce edges."""

from __future__ import annotations

from matt3r_data_ingestion_serverless_spark.operators.temporal import (
    asof_join,
    coalesce_intervals,
)


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_no_prior(spark):
    left = _ts(spark, [("a", 10, "l1"), ("a", 3, "l2"), ("b", 5, "l3")], "k string, t int, lbl string")
    right = _ts(spark, [("a", 4, 1.0), ("a", 9, 2.0), ("b", 6, 3.0)], "k string, t int, v double")
    out = {
        r["lbl"]: (r["asof_ts"], r["v"])
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="t", right_cols=["v"]
        ).collect()
    }
    assert out["l1"] == (9, 2.0)  # latest at-or-before 10
    assert out["l2"] == (None, None)  # no right row ≤ 3
    assert out["l3"] == (None, None)  # b's only right row is at 6 > 5


def test_asof_equal_ts_counts_as_match(spark):
    left = _ts(spark, [("a", 7, "l")], "k string, t int, lbl string")
    right = _ts(spark, [("a", 7, 42.0)], "k string, t int, v double")
    row = asof_join(
        left, right, key="k", left_ts="t", right_ts="t", right_cols=["v"]
    ).collect()[0]
    assert (row["asof_ts"], row["v"]) == (7, 42.0)


def test_asof_tolerance_voids_stale_match(spark):
    left = _ts(spark, [("a", 100, "fresh"), ("a", 500, "stale")], "k string, t int, lbl string")
    right = _ts(spark, [("a", 95, 1.0)], "k string, t int, v double")
    out = {
        r["lbl"]: r["v"]
        for r in asof_join(
            left,
            right,
            key="k",
            left_ts="t",
            right_ts="t",
            right_cols=["v"],
            tolerance_s=10,
        ).collect()
    }
    assert out["fresh"] == 1.0  # 5 ≤ tolerance
    assert out["stale"] is None  # 405 > tolerance → voided


def test_coalesce_intervals_merge_and_gap(spark):
    iv = _ts(
        spark,
        [("a", 0, 10), ("a", 5, 20), ("a", 30, 40), ("b", 0, 1)],
        "k string, s int, e int",
    )
    out = {
        (r["k"], r["s"], r["e"]): r["n_merged"]
        for r in coalesce_intervals(iv, key="k", start="s", end="e").collect()
    }
    assert out == {("a", 0, 20): 2, ("a", 30, 40): 1, ("b", 0, 1): 1}


def test_coalesce_touching_intervals_merge(spark):
    # end == next start: running-max comparison uses strict >, so
    # touching intervals fuse (closed-interval semantics)
    iv = _ts(spark, [("a", 0, 10), ("a", 10, 20)], "k string, s int, e int")
    out = coalesce_intervals(iv, key="k", start="s", end="e").collect()
    assert len(out) == 1 and out[0]["n_merged"] == 2
