"""streamed_ohlc_bars: streamed state must equal the batch aggregate,
and the partial-bar merge must be order-insensitive."""

from __future__ import annotations

from matt3r_data_ingestion_serverless_spark.plans.breadth_r78 import ohlc_daily_bars
from matt3r_data_ingestion_serverless_spark.plans.breadth_r79 import (
    _bar_agg,
    streamed_ohlc_bars,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_equals_batch(spark):
    assert _rows(streamed_ohlc_bars(spark, SF_SMOKE)) == _rows(
        ohlc_daily_bars(spark, SF_SMOKE)
    )


def test_partial_bar_merge_is_order_insensitive(spark):
    # two partial states built from disjoint slices merge to the same
    # bar regardless of merge order — the algebraic-state property the
    # streamed sink relies on
    rows = [
        # (day, n, open, okey, high, low, close, ckey, vol)
        ("2024-01-01", 1, 10, "b", 10, 10, 10, "b", 10),
        ("2024-01-01", 1, 5, "c", 5, 5, 5, "c", 5),
        ("2024-01-01", 1, 7, "a", 7, 7, 7, "a", 7),  # earliest tick, later batch
    ]
    schema = (
        "day string, n_ticks long, open_cents long, open_key string, "
        "high_cents long, low_cents long, close_cents long, close_key string, "
        "volume_cents long"
    )
    full = spark.createDataFrame(rows, schema)
    fwd = _bar_agg(_bar_agg(full.limit(0).union(full)))
    ab_then_c = _bar_agg(
        _bar_agg(spark.createDataFrame(rows[:2], schema)).unionByName(
            spark.createDataFrame(rows[2:], schema)
        )
    )
    want = [("2024-01-01", 3, 7, "a", 10, 5, 5, "c", 22)]
    assert _rows(fwd) == want
    assert _rows(ab_then_c) == want
