"""The r05 scale fix (VERDICT r04 finding #1): the batch W1/W2 session
windows must partition by (device, DAY), not device alone, with
boundary-spanning runs stitched back together.

Three layers of proof:
  1. hypothesis differential: on random zero/moving sequences spanning
     several days (including runs that straddle midnight, all-zero
     days, and absent days), the bucketed plan == the legacy
     device-window plan row-for-row. Same for transition carry rows.
  2. plan pins: the heavy window exchange's hashpartitioning key
     includes the date_trunc bucket for both operators.
  3. planted skew: one device holding 80 % of rows across 30 days
     still yields a bucketed exchange (one task sees one device-day,
     not the device's whole history) and identical results.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.operators.autopilot import ap_transitions
from matt3r_data_ingestion_serverless_spark.operators.stationary import (
    stationary_intervals,
)

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_EPOCH = datetime.datetime(2024, 3, 1)

# A day-plan: list of (hour_offsets_present, zero_flags). Encoded as a
# list of days, each day a list of (second_of_day, is_zero) samples.
# Gaps between samples and whole missing days are the interesting part.
_day = st.lists(
    st.tuples(st.integers(0, 86_399), st.booleans()),
    min_size=0,
    max_size=14,
).map(lambda xs: sorted(set(xs)))
_schedule = st.lists(_day, min_size=1, max_size=5)


def _rows(schedule):
    rows = []
    for d, day in enumerate(schedule):
        seen = set()
        for sec, z in day:
            if sec in seen:  # dedupe second-of-day collisions
                continue
            seen.add(sec)
            ts = _EPOCH + datetime.timedelta(days=d, seconds=sec)
            rows.append(("dev", ts, 0.0 if z else 10.0))
    return rows


@given(_schedule)
@_settings
def test_bucketed_stationary_equals_unbucketed(spark, schedule):
    rows = _rows(schedule)
    if not rows:
        return
    df = spark.createDataFrame(rows, "device_id string, ts timestamp, speed double")
    kw = dict(zero_threshold=0.0, min_duration_s=13.0, trim_s=3.0)
    got = sorted(
        stationary_intervals(df, bucket="day", **kw).collect(),
        key=lambda r: r.start_us,
    )
    want = sorted(
        stationary_intervals(df, bucket=None, **kw).collect(),
        key=lambda r: r.start_us,
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


_codes = st.lists(
    st.tuples(st.integers(0, 86_399), st.integers(0, 4)),
    min_size=0,
    max_size=14,
).map(lambda xs: sorted(set(xs)))
_code_schedule = st.lists(_codes, min_size=1, max_size=5)


@given(_code_schedule)
@_settings
def test_bucketed_transitions_equal_unbucketed(spark, schedule):
    rows = []
    for d, day in enumerate(schedule):
        seen = set()
        for sec, code in day:
            if sec in seen:
                continue
            seen.add(sec)
            ts = _EPOCH + datetime.timedelta(days=d, seconds=sec)
            rows.append(("dev", ts, code if code != 4 else None))  # None = unmapped
    if not rows:
        return
    df = spark.createDataFrame(rows, "device_id string, ts timestamp, code int")
    got = sorted(
        ap_transitions(df, bucket="day").collect(), key=lambda r: r.ts_us
    )
    want = sorted(
        ap_transitions(df, bucket=None).collect(), key=lambda r: r.ts_us
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def _executed_plan(df) -> str:
    df.count()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def _skew_df(spark):
    """One device holds 80 % of rows, spread over 30 days; 4 small
    devices hold the rest. Runs deliberately straddle midnights."""
    hot = spark.range(24_000).select(
        F.lit("hot").alias("device_id"),
        (
            F.timestamp_seconds(
                F.lit(1_709_251_200) + (F.col("id") * 100) % (30 * 86_400)
            )
        ).alias("ts"),
        F.when((F.col("id") % 7) < 3, 0.0).otherwise(9.0).alias("speed"),
    )
    cold = spark.range(6_000).select(
        F.concat(F.lit("c"), (F.col("id") % 4).cast("string")).alias("device_id"),
        F.timestamp_seconds(F.lit(1_709_251_200) + F.col("id") * 37).alias("ts"),
        F.when((F.col("id") % 5) < 2, 0.0).otherwise(9.0).alias("speed"),
    )
    return hot.unionByName(cold).dropDuplicates(["device_id", "ts"])


def test_stationary_window_keyed_by_device_day(spark):
    df = _skew_df(spark)
    out = stationary_intervals(df, min_duration_s=150.0, trim_s=3.0)
    plan = _executed_plan(out)
    # the sample-level window exchange must hash on (device, bucket)
    assert "hashpartitioning(device_id" in plan, plan
    import re

    window_keys = re.findall(
        r"hashpartitioning\(device_id#\d+,\s*_bkt#\d+", plan
    )
    assert window_keys, f"no (device_id, _bkt) exchange in plan:\n{plan}"


def test_transitions_window_keyed_by_device_day(spark):
    df = _skew_df(spark).withColumn("code", (F.col("speed") / 3).cast("int"))
    out = ap_transitions(df)
    plan = _executed_plan(out)
    import re

    assert re.search(r"hashpartitioning\(device_id#\d+,\s*_bkt#\d+", plan), plan


def test_planted_skew_results_match_legacy(spark):
    df = _skew_df(spark)
    kw = dict(min_duration_s=150.0, trim_s=3.0)
    got = sorted(
        map(tuple, stationary_intervals(df, **kw).collect()),
    )
    want = sorted(
        map(tuple, stationary_intervals(df, bucket=None, **kw).collect()),
    )
    assert got == want and len(got) > 0
