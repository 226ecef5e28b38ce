"""Oracle-checked queries for the scalar decode layer (SURVEY.md §2.3
D1–D5). The binary scanner itself is covered by golden byte fixtures
(tests/test_canserver.py); here the decode *math* — sign extension,
scaling, enum mapping — runs as pure Catalyst expressions over raw
integer fields synthesized deterministically from the events table, so
DuckDB can evaluate the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import decode as D
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table


def _sext_sql(expr: str, bits: int) -> str:
    half = 1 << (bits - 1)
    return f"(CASE WHEN {expr} >= {half} THEN {expr} - {1 << bits} ELSE {expr} END)"


@register(
    "d15_decode_math",
    sql=f"""
WITH raw AS (
  SELECT event_id,
         (event_id * 7919) % 65536   AS raw16,
         (event_id * 104729) % 32768 AS raw15,
         event_id % 4096             AS raw12,
         (event_id * 2654435761) % 268435456 AS raw28,
         event_id % 16               AS ap_code
  FROM events
)
SELECT event_id,
       round({_sext_sql('raw16', 16)} * 0.00125, 6)  AS accel,
       round({_sext_sql('raw16', 16)} * 0.0001, 6)   AS yaw,
       round({_sext_sql('raw15', 15)} * 0.00025, 6)  AS pitch,
       round(raw12 * 0.08 - 40.0, 6)                 AS speed,
       round({_sext_sql('raw28', 28)} * 0.000001, 6) AS coord,
       CASE ap_code
         WHEN 0 THEN 'DISABLED' WHEN 1 THEN 'UNAVAILABLE' WHEN 2 THEN 'AVAILABLE'
         WHEN 3 THEN 'ACTIVE_NOMINAL' WHEN 4 THEN 'ACTIVE_RESTRICTED' WHEN 5 THEN 'ACTIVE_NAV'
         WHEN 8 THEN 'ABORTING' WHEN 9 THEN 'ABORTED' WHEN 14 THEN 'FAULT' WHEN 15 THEN 'SNA'
       END AS ap_name
FROM raw
""",
)
def d15_decode_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1–D5 decode expressions, JVM-side (functions/decode.py)."""
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    raw16 = (eid * 7919) % 65536
    raw15 = (eid * 104729) % 32768
    raw12 = eid % 4096
    raw28 = (eid * 2654435761) % 268435456
    return events.select(
        "event_id",
        F.round(D.decode_accel(raw16), 6).alias("accel"),
        F.round(D.decode_yaw(raw16), 6).alias("yaw"),
        F.round(D.decode_pitch_roll(raw15), 6).alias("pitch"),
        F.round(D.decode_speed(raw12), 6).alias("speed"),
        F.round(D.decode_gnss(raw28), 6).alias("coord"),
        D.ap_state_name(eid % 16).alias("ap_name"),
    )
