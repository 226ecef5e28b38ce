"""Zero-run sessionization → stationary intervals (SURVEY.md §2.5 W2).

Reference semantics (infer_stationary_states.py:81-106): scan the speed
series in time order; find maximal runs where speed == 0; a run whose
duration (last_ts - first_ts) is >= 13 s emits the interval
[first_ts + 3 s, last_ts - 3 s]. The reference leaves durations in
(12, 13) s untested (`<= 12` continues, `>= 13` emits); we pin the
intended semantics: emit iff duration >= min_duration.

Spark-first shape: the reference's imperative `speed_list.index(0)`
loop becomes a gaps-and-islands plan —

    lag window (per device)  →  run-id running sum  →  groupBy(run)
    →  min/max ts            →  duration filter     →  trim projection

which is one shuffle (the window / groupBy share the device_id hash
partitioning) and scales linearly: at 100 TB the per-device window
state is bounded by device cardinality, and AQE handles skewed devices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stationary_intervals(
    df: DataFrame,
    key: str = "device_id",
    ts: str = "ts",
    speed: str = "speed",
    *,
    zero_threshold: float = 0.0,
    min_duration_s: float = 13.0,
    trim_s: float = 3.0,
) -> DataFrame:
    """Emit one row per qualifying stationary interval.

    Input:  key, ts (timestamp), speed (double).
    Output: key, start_us, end_us, duration_s — interval boundaries as
    epoch microseconds (integer, hash-stable) already trimmed by
    ``trim_s`` on each side.

    ``zero_threshold`` generalizes the reference's ``speed == 0``: a
    sample is "stationary" when speed <= zero_threshold (0.0 reproduces
    the reference; the synthetic events table has no exact zeros).
    """
    w = Window.partitionBy(key).orderBy(ts)
    is_zero: Column = (F.col(speed) <= F.lit(zero_threshold)).cast("int")

    runs = (
        df.select(key, ts, speed)
        .withColumn("_z", is_zero)
        # new run whenever the zero-flag differs from the previous row's
        .withColumn("_chg", (F.lag("_z", 1, -1).over(w) != F.col("_z")).cast("int"))
        .withColumn("_run", F.sum("_chg").over(w))
        .filter(F.col("_z") == 1)
        .groupBy(key, "_run")
        .agg(
            F.min(F.unix_micros(F.col(ts))).alias("_start_us"),
            F.max(F.unix_micros(F.col(ts))).alias("_end_us"),
        )
    )
    trim_us = int(trim_s * 1_000_000)
    min_dur_us = int(min_duration_s * 1_000_000)
    return (
        runs.filter(F.col("_end_us") - F.col("_start_us") >= min_dur_us)
        .select(
            F.col(key),
            (F.col("_start_us") + trim_us).alias("start_us"),
            (F.col("_end_us") - trim_us).alias("end_us"),
            F.round((F.col("_end_us") - F.col("_start_us")) / 1e6, 6).alias("duration_s"),
        )
    )
