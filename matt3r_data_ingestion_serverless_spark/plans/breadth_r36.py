"""Round-2 batch 11 (this run): freshness-lag auditing, JSON key
profiling, and SUM/AVG(DISTINCT) semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# per-stream freshness / staleness audit
# ---------------------------------------------------------------------------

_FRESH_SQL = """
WITH per AS (
  SELECT event_type, count(*) AS n,
         epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us
  FROM events GROUP BY event_type
),
g AS (SELECT max(last_us) AS watermark_us FROM per)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(last_us AS BIGINT) AS last_us,
       CAST(g.watermark_us - last_us AS BIGINT) AS lag_us,
       CAST(g.watermark_us - last_us > 86400000000 AS BOOLEAN) AS stale_24h,
       CAST((last_us - first_us) // greatest(n - 1, 1) AS BIGINT)
         AS mean_interarrival_us
FROM per CROSS JOIN g
"""


@register("freshness_lag_audit", _FRESH_SQL)
def freshness_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit — each event type's last-seen
    timestamp, its lag behind the global high-watermark, a 24-hour
    staleness flag, and the mean inter-arrival gap (span // (n−1),
    true integer division) — the data-SLA dashboard every ingestion
    platform runs beside volume checks (profile_columns) and
    reconciliation (table_checksum_reconciliation). One
    partial-aggregated scan; the watermark is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.unix_micros(F.max("ts")).alias("last_us"),
    )
    g = per.agg(F.max("last_us").alias("watermark_us"))
    j = per.crossJoin(F.broadcast(g))
    lag = F.col("watermark_us") - F.col("last_us")
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("last_us").cast("long").alias("last_us"),
        lag.cast("long").alias("lag_us"),
        (lag > 86_400_000_000).alias("stale_24h"),
        F.expr("(last_us - first_us) div greatest(n - 1, 1)")
        .cast("long")
        .alias("mean_interarrival_us"),
    )


# ---------------------------------------------------------------------------
# JSON key profiling over the semi-structured props column
# ---------------------------------------------------------------------------

_JSONKEY_SQL = """
WITH k AS (
  SELECT event_type, unnest(json_keys(props)) AS key
  FROM events WHERE props IS NOT NULL
)
SELECT event_type, key,
       CAST(count(*) AS BIGINT) AS n_rows
FROM k GROUP BY event_type, key
"""


@register("json_key_profile", _JSONKEY_SQL)
def json_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema profiling: which JSON keys appear in the
    props payload, per event type, with occurrence counts — the
    discovery step before committing a parsed schema (d11_json_extract
    reads known paths; d12_variant_props parses to VARIANT; this one
    inventories the keyspace). json_object_keys / json_keys explode in
    the scan stage; one hash agg. At 100 TB this is the profile that
    decides which keys get their own parquet column."""
    ev = load_table(spark, sf_dir, "events")
    k = ev.filter(F.col("props").isNotNull()).select(
        "event_type", F.explode(F.json_object_keys("props")).alias("key")
    )
    return k.groupBy("event_type", "key").agg(F.count("*").cast("long").alias("n_rows"))


# ---------------------------------------------------------------------------
# SUM(DISTINCT) / AVG(DISTINCT) semantics
# ---------------------------------------------------------------------------

_SUMDIST_SQL = f"""
WITH v AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT qty) AS BIGINT) AS n_distinct,
       CAST(sum(qty) AS BIGINT) AS sum_all,
       CAST(sum(DISTINCT qty) AS BIGINT) AS sum_distinct,
       {round6_sql(
           "CAST(sum(DISTINCT qty) AS DOUBLE) / count(DISTINCT qty)"
       )} AS avg_distinct
FROM v GROUP BY l_returnflag
"""


@register("sum_distinct_semantics", _SUMDIST_SQL)
def sum_distinct_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(DISTINCT) / AVG(DISTINCT) beside their plain forms — the
    aggregate-modifier semantics corner (each distinct value counted
    once regardless of multiplicity) that trips up hand-rolled
    rewrites; completes the distinct-aggregate surface next to
    distinct_aggregation's COUNT(DISTINCT). Spark plans this as an
    Expand + two-phase agg — the dedup happens in the shuffle, not on
    the driver. avg_distinct divides the two exact integers once so no
    engine's native AVG(DISTINCT) float path is trusted."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select("l_returnflag", F.col("l_quantity").cast("long").alias("qty"))
    agg = v.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.count_distinct("qty").alias("n_distinct"),
        F.sum("qty").alias("sum_all"),
        F.sum_distinct(F.col("qty")).alias("sum_distinct"),
    )
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("sum_all").cast("long").alias("sum_all"),
        F.col("sum_distinct").cast("long").alias("sum_distinct"),
        round6(
            F.col("sum_distinct").cast("double") / F.col("n_distinct")
        ).alias("avg_distinct"),
    )
