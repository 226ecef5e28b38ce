"""Round-2 batch 23 (this run): per-hour exact percentiles and
skewness/kurtosis from exact high-order moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# exact p50/p95/p99 of value per hour-of-day
# ---------------------------------------------------------------------------

_HOURLY_PCT_SQL = """
WITH v AS (
  SELECT CAST(hour(ts) AS BIGINT) AS hr,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
h AS (SELECT hr, cents, count(*) AS c FROM v GROUP BY hr, cents),
e AS (
  SELECT hr, cents, c,
         sum(c) OVER (PARTITION BY hr ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY hr) AS n
  FROM h
)
SELECT hr,
       CAST(max(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum * 100 >= n * 50 THEN cents END) AS BIGINT) AS p50_cents,
       CAST(min(CASE WHEN cum * 100 >= n * 95 THEN cents END) AS BIGINT) AS p95_cents,
       CAST(min(CASE WHEN cum * 100 >= n * 99 THEN cents END) AS BIGINT) AS p99_cents
FROM e GROUP BY hr
"""


@register("hourly_latency_percentiles", _HOURLY_PCT_SQL)
def hourly_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ops-dashboard staple: exact p50/p95/p99 of the value
    distribution for every hour of day — percentile-by-dimension via
    the value-histogram pattern (distinct-cents shrink → cumulative
    count → cross-multiplied threshold cum·100 ≥ n·q, no float
    percentile and no row sort). Each hour's quantiles come from the
    same single cumulative window; the discrete definition is the
    smallest value with cume ≥ q — identical in both dialects. This is
    the per-group generalization of exact_global_quantiles and the
    DISC twin of exact_interpolated_quantiles."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        F.hour("ts").cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    ).groupBy("hr", "cents").agg(F.count("*").alias("c"))
    e = h.select(
        "hr",
        "cents",
        F.sum("c")
        .over(
            Window.partitionBy("hr")
            .orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
        F.sum("c").over(Window.partitionBy("hr")).alias("n"),
    )
    def pct(q: int) -> F.Column:
        return F.min(
            F.when(F.col("cum") * 100 >= F.col("n") * q, F.col("cents"))
        ).cast("long")

    return e.groupBy("hr").agg(
        F.max("n").cast("long").alias("n"),
        pct(50).alias("p50_cents"),
        pct(95).alias("p95_cents"),
        pct(99).alias("p99_cents"),
    )


# ---------------------------------------------------------------------------
# skewness and excess kurtosis from exact moments
# ---------------------------------------------------------------------------

_MOMENTS_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x FROM events
),
m AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS s1,
         sum(CAST(x AS DECIMAL(38,0)) * x) AS s2,
         sum(CAST(x AS DECIMAL(38,0)) * x * x) AS s3,
         sum(CAST(x AS DECIMAL(38,0)) * x * x * x) AS s4
  FROM v GROUP BY event_type
),
c AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
           AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) AS m3,
         CAST(s4 AS DOUBLE) / n
           - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
           + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s2 AS DOUBLE) / n)
           - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM m
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       {round6_sql("mu / 100.0")} AS mean_value,
       {round6_sql("m3 / (m2 * sqrt(m2))")} AS skewness,
       {round6_sql("m4 / (m2 * m2) - 3.0")} AS excess_kurtosis
FROM c
"""


@register("moments_skew_kurtosis", _MOMENTS_SQL)
def moments_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per event type — the 3rd/4th-order
    shape statistics beyond stats_pack's variance family, from raw
    power sums Σx..Σx⁴ accumulated EXACTLY (DECIMAL(38,0): cents⁴
    reaches 10¹⁸ per row, far past int64 in aggregate) and combined in
    the standard central-moment identities with ONE identical
    expression tree per dialect. Order-proof by exactness of the sums;
    one partial-aggregated scan."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("x")
    v = ev.select(
        "event_type", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("x")
    )
    xd = x.cast("decimal(38,0)")
    m = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(xd * x).alias("s2"),
        F.sum(xd * x * x).alias("s3"),
        F.sum(xd * x * x * x).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    e2 = F.col("s2").cast("double") / n
    e3 = F.col("s3").cast("double") / n
    e4 = F.col("s4").cast("double") / n
    m2 = e2 - mu * mu
    m3 = e3 - 3 * mu * e2 + 2 * mu * mu * mu
    m4 = e4 - 4 * mu * e3 + 6 * mu * mu * e2 - 3 * mu * mu * mu * mu
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        round6(mu / 100.0).alias("mean_value"),
        round6(m3 / (m2 * F.sqrt(m2))).alias("skewness"),
        round6(m4 / (m2 * m2) - 3.0).alias("excess_kurtosis"),
    )
