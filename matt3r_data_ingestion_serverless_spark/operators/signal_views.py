"""Views over the long-format silver signal table reproducing the
reference's two output shapes (SURVEY.md §1.1-2/3).

- ``signals_to_wide``: the 14-column wide row table
  (parse_canserver_filtered_log.py:141-142) — long→wide pivot (A1) as a
  single conditional aggregation; real NULLs replace the 'NA' sentinel.
- ``channel_documents``: the per-hour channel-series JSON documents
  (parse_canserver_filtered_log.py:313-325,350) — collect + sort +
  to_json at the sink boundary only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _first_values(channel: str):
    return F.first(F.when(F.col("channel") == channel, F.col("values")), ignorenulls=True)


def signals_to_wide(signals: DataFrame) -> DataFrame:
    """Long signals → wide rows keyed by (device_id, ts). One hash
    aggregate (map-side partials); no Window, no sort. Unit columns are
    constants by construction (acc 'm/s^2', gyro 'rad/s', speed 'KPH',
    parse_canserver_filtered_log.py:154,165,169)."""
    return (
        signals.groupBy("device_id", "ts")
        .agg(
            _first_values("accel").alias("_accel"),
            _first_values("gyro").alias("_gyro"),
            _first_values("location").alias("_loc"),
            _first_values("speed").alias("_speed"),
            F.first(F.when(F.col("channel") == "ap_status", F.col("state")), ignorenulls=True).alias(
                "AP_status"
            ),
        )
        .select(
            "device_id",
            "ts",
            F.col("_accel")[0].alias("long_acc"),
            F.col("_accel")[1].alias("lat_acc"),
            F.col("_accel")[2].alias("vert_acc"),
            F.when(F.col("_accel").isNotNull(), F.lit("m/s^2")).alias("acc_unit"),
            F.col("_gyro")[0].alias("yaw_rate"),
            F.col("_gyro")[1].alias("pitch_rate"),
            F.col("_gyro")[2].alias("roll_rate"),
            F.when(F.col("_gyro").isNotNull(), F.lit("rad/s")).alias("gyro_unit"),
            F.col("_loc")[0].alias("lat"),
            F.col("_loc")[1].alias("long"),
            F.col("_speed")[0].alias("speed"),
            F.when(F.col("_speed").isNotNull(), F.lit("KPH")).alias("speed_unit"),
            "AP_status",
        )
    )


def channel_documents(signals: DataFrame) -> DataFrame:
    """Per (device, hour) channel-document rows: each channel becomes a
    time-sorted array of {timestamp, value} structs; ``to_json`` only at
    this sink boundary (the engine's internal format stays columnar).

    ``sort_array`` on struct(ts_s, ...) replaces the reference's
    implicit scan order (O1) with an explicit, shuffle-local sort.
    """

    def collected(channel: str):
        struct = F.struct(
            (F.unix_micros(F.col("ts")) / 1e6).alias("timestamp"),
            F.col("values").alias("value"),
        )
        return F.sort_array(
            F.collect_list(F.when(F.col("channel") == channel, struct))
        ).alias(channel)

    ap_struct = F.struct(
        (F.unix_micros(F.col("ts")) / 1e6).alias("timestamp"),
        F.col("state").alias("value"),
    )
    docs = signals.groupBy(
        "device_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        collected("accel"),
        collected("gyro"),
        collected("location"),
        collected("speed"),
        F.sort_array(
            F.collect_list(F.when(F.col("channel") == "ap_status", ap_struct))
        ).alias("ap_status"),
    )
    return docs.select(
        "device_id",
        "hour",
        F.to_json(
            F.struct("accel", "gyro", "location", "speed", "ap_status")
        ).alias("document"),
    )


def stationary_documents(intervals: DataFrame) -> DataFrame:
    """Gold stationary-interval documents in the reference's exact
    shape (infer_stationary_states.py:108-114):
    ``{"IMU-telematics": {"stationary-state": [{"start": s, "end": e},…]}}``
    one row per (device, day). Epoch-seconds floats match the
    reference's float timestamps."""
    iv = F.struct(
        (F.col("start_us") / 1e6).alias("start"),
        (F.col("end_us") / 1e6).alias("end"),
    )
    day = F.to_date(F.timestamp_micros(F.col("start_us"))).alias("day")
    grouped = intervals.groupBy("device_id", day).agg(
        F.sort_array(F.collect_list(iv)).alias("_ivs")
    )
    return grouped.select(
        "device_id",
        "day",
        F.to_json(
            F.struct(
                F.struct(F.col("_ivs").alias("stationary-state")).alias("IMU-telematics")
            )
        ).alias("document"),
    )


def autopilot_documents(events: DataFrame) -> DataFrame:
    """Gold autopilot-event documents in the reference's shape
    (infer_autopilot_states.py:91-95):
    ``{"auditory": {"engagement": [{"timestamp": t, "canbus_state": c}],
    "disengagement": […]}}`` per (device, day) — keeping ALL events (the
    reference's dict-update drops all but the last per status, a
    documented serialization bug; its merge logic shows all were
    intended, SURVEY §3.3)."""

    def by_status(status: str):
        ev = F.struct(
            (F.col("ts_us") / 1e6).alias("timestamp"),
            F.col("canbus_state").alias("canbus_state"),
        )
        return F.sort_array(
            F.collect_list(F.when(F.col("status") == status, ev))
        ).alias(status)

    day = F.to_date(F.timestamp_micros(F.col("ts_us"))).alias("day")
    grouped = events.groupBy("device_id", day).agg(
        by_status("engagement"), by_status("disengagement")
    )
    return grouped.select(
        "device_id",
        "day",
        F.to_json(
            F.struct(F.struct("engagement", "disengagement").alias("auditory"))
        ).alias("document"),
    )
