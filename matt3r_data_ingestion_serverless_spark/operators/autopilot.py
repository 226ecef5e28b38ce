"""Lag-based state-transition detection (SURVEY.md §2.5 W1).

Reference semantics (infer_autopilot_states.py:78-88): order the
autopilot-state code series by time; emit ``engagement`` when the
current code == 3 (ACTIVE_NOMINAL) and the previous code <= 2, and
``disengagement`` when current <= 2 and previous == 3. Transitions
through 4/5/8/9 are deliberately ignored. The reference then keeps only
the LAST event per status (dict .update, infer_autopilot_states.py:95)
— a lossy serialization artifact; we keep all events (the merge logic
at :108-114 shows keep-all was intended).

Spark-first, and the 100×-scale fix (VERDICT r04 finding #1): a lag
window keyed by device alone single-tasks a device's entire history on
backfill. Instead the lag window is keyed by (device, DAY); the one
row each bucket cannot see — its predecessor across the bucket edge —
is materialized as a CARRY row: each (device, day)'s last sample is
shifted into the device's next data-bearing day (a per-day aggregate +
a tiny device-ordered window over day summaries), unioned in flagged
``_carry=1``, ordered first inside the target bucket (its timestamp
precedes every real sample there by construction), consumed as lag
context only, and dropped from the output. Max task input is one
device-day; the carry plumbing is bounded by days of history.
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
    bucket: str | None = "day",
) -> DataFrame:
    """Emit (key, ts_us, status, canbus_state) transition events.

    ``status`` is 'engagement' | 'disengagement'. Generalized over the
    code column so the same operator runs on any ordered enum series.
    ``bucket`` is the date_trunc granularity of the scale-out lag
    window; None falls back to the single-window-per-device plan (kept
    as the differential twin for property tests).
    """
    if bucket is None:
        w = Window.partitionBy(key).orderBy(ts)
        base = df.select(key, ts, code)
    else:
        bkt = F.date_trunc(bucket, F.col(ts))
        real = df.select(key, ts, code).withColumn("_bkt", bkt).withColumn(
            "_carry", F.lit(0)
        )
        # Each (device, day)'s final sample, shifted into the device's
        # NEXT data-bearing day as that bucket's lag seed. Carried
        # regardless of code value (a NULL-code final sample must
        # suppress the next bucket's first transition exactly like it
        # would in a single scan).
        wk = Window.partitionBy(key).orderBy("_bkt")
        carry = (
            real.groupBy(key, "_bkt")
            .agg(F.max_by(F.struct(ts, code), ts).alias("_l"))
            .withColumn("_tgt", F.lead("_bkt", 1).over(wk))
            .filter(F.col("_tgt").isNotNull())
            .select(
                F.col(key),
                F.col(f"_l.{ts}").alias(ts),
                F.col(f"_l.{code}").alias(code),
                F.col("_tgt").alias("_bkt"),
                F.lit(1).alias("_carry"),
            )
        )
        base = real.unionByName(carry)
        w = Window.partitionBy(key, "_bkt").orderBy(ts)

    cur = F.col(code)
    prev = F.lag(code, 1).over(w)
    out = (
        base
        .withColumn("_prev", prev)
        .withColumn(
            "status",
            F.when((cur == active_code) & (F.col("_prev") <= inactive_max), "engagement").when(
                (cur <= inactive_max) & (F.col("_prev") == active_code), "disengagement"
            ),
        )
        .filter(F.col("status").isNotNull())
    )
    if bucket is not None:
        out = out.filter(F.col("_carry") == 0)
    return out.select(
        F.col(key),
        F.unix_micros(F.col(ts)).alias("ts_us"),
        F.col("status"),
        F.col(code).cast("double").alias("canbus_state"),
    )
