"""Lag-based state-transition detection (SURVEY.md §2.5 W1).

Reference semantics (infer_autopilot_states.py:78-88): order the
autopilot-state code series by time; emit ``engagement`` when the
current code == 3 (ACTIVE_NOMINAL) and the previous code <= 2, and
``disengagement`` when current <= 2 and previous == 3. Transitions
through 4/5/8/9 are deliberately ignored. The reference then keeps only
the LAST event per status (dict .update, infer_autopilot_states.py:95)
— a lossy serialization artifact; we keep all events (the merge logic
at :108-114 shows keep-all was intended).

Spark-first: a single lag window per device — one shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# parse_canserver_filtered_log.py:109-110 — 4-bit autopilot enum.
AP_STATE_NAMES = {
    0: "DISABLED",
    1: "UNAVAILABLE",
    2: "AVAILABLE",
    3: "ACTIVE_NOMINAL",
    4: "ACTIVE_RESTRICTED",
    5: "ACTIVE_NAV",
    8: "ABORTING",
    9: "ABORTED",
    14: "FAULT",
    15: "SNA",
}
# infer_autopilot_states.py:22-23 — the reverse map used by the infer
# stage omits FAULT/SNA (KeyError in the reference); we map them to NULL.
AP_CODE_BY_NAME = {v: k for k, v in AP_STATE_NAMES.items() if k < 14}


def ap_state_code(state: Column) -> Column:
    """String enum → int code (SURVEY §2.3 D6) as a CASE expression."""
    expr = F.lit(None).cast("int")
    for name, code in AP_CODE_BY_NAME.items():
        expr = F.when(state == name, F.lit(code)).otherwise(expr)
    return expr


def ap_transitions(
    df: DataFrame,
    key: str = "device_id",
    ts: str = "ts",
    code: str = "code",
    *,
    active_code: int = 3,
    inactive_max: int = 2,
) -> DataFrame:
    """Emit (key, ts_us, status, canbus_state) transition events.

    ``status`` is 'engagement' | 'disengagement'. Generalized over the
    code column so the same operator runs on any ordered enum series.
    """
    w = Window.partitionBy(key).orderBy(ts)
    cur = F.col(code)
    prev = F.lag(code, 1).over(w)
    return (
        df.select(key, ts, code)
        .withColumn("_prev", prev)
        .withColumn(
            "status",
            F.when((cur == active_code) & (F.col("_prev") <= inactive_max), "engagement").when(
                (cur <= inactive_max) & (F.col("_prev") == active_code), "disengagement"
            ),
        )
        .filter(F.col("status").isNotNull())
        .select(
            F.col(key),
            F.unix_micros(F.col(ts)).alias("ts_us"),
            F.col("status"),
            F.col(code).cast("double").alias("canbus_state"),
        )
    )
