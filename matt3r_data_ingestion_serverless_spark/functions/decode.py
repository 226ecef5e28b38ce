"""Scalar decode expressions (SURVEY.md §2.3 D1–D7) as pure Catalyst
columns — the JVM-side twins of the numpy decode in sources/canserver.py.

These operate on integer raw-field columns (payload bytes already
widened to ints) so the whole projection stays inside whole-stage
codegen: no Python in the hot path. Used by the oracle-checked decode
queries and by anything that stores raw fields columnar.

Constants from parse_canserver_filtered_log.py:111-117; bit layouts
from :146-184 (verified by golden byte fixtures in
tests/test_canserver.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ACC_SCALE = 0.00125
YAW_SCALE = 0.0001
PITCH_ROLL_SCALE = 0.00025
SPEED_SCALE = 0.08
SPEED_OFFSET = -40.0
GNSS_FACTOR = 1e-6


def sign_extend(col: Column, bits: int) -> Column:
    """Two's-complement sign extension of an unsigned ``bits``-wide raw
    value (bin_to_dec, parse_canserver_filtered_log.py:92-103) as
    branch-free integer arithmetic: (x ^ s) - s with s = 1<<(bits-1)."""
    sign = F.lit(1 << (bits - 1)).cast("long")
    return col.cast("long").bitwiseXOR(sign) - sign


def decode_accel(raw16: Column) -> Column:
    """D1: int16 raw accel count → m/s² (parse_canserver_filtered_log.py:150-154)."""
    return sign_extend(raw16, 16) * F.lit(ACC_SCALE)


def decode_yaw(raw16: Column) -> Column:
    """D2: int16 raw yaw count → rad/s (:158)."""
    return sign_extend(raw16, 16) * F.lit(YAW_SCALE)


def decode_pitch_roll(raw15: Column) -> Column:
    """D2: 15-bit two's-complement pitch/roll count → rad/s (:159-164)."""
    return sign_extend(raw15, 15) * F.lit(PITCH_ROLL_SCALE)


def decode_speed(raw12: Column) -> Column:
    """D3: 12-bit unsigned speed count → KPH (:167-169); raw 4095 → 287.6."""
    return raw12.cast("long") * F.lit(SPEED_SCALE) + F.lit(SPEED_OFFSET)


def decode_gnss(raw28: Column) -> Column:
    """D4: 28-bit two's-complement coordinate count → degrees (:171-180)."""
    return sign_extend(raw28, 28) * F.lit(GNSS_FACTOR)


def ap_state_name(code: Column) -> Column:
    """D5: 4-bit autopilot code → enum name (:109-110,182-184); codes
    6,7,10–13 (KeyError in the reference) → NULL."""
    from matt3r_data_ingestion_serverless_spark.operators.autopilot import AP_STATE_NAMES

    mapping = F.create_map(*[F.lit(x) for kv in AP_STATE_NAMES.items() for x in kv])
    return F.element_at(mapping, code.cast("int"))
