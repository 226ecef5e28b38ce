"""Round-2 batch 4 (this run): 2×2 odds ratio with Wald CI, a paired
t-test on per-user AM/PM means, and Poisson arrival-rate intervals.

Counts stay exact int64; per-user means quantize to milli-cents by
TRUE integer division before any moment sum; each statistic is one
final double expression over exact integers (SCALE.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# 2×2 odds ratio: weekend exposure vs high-value outcome, per event type
# ---------------------------------------------------------------------------

_OR_SQL = f"""
WITH cells AS (
  SELECT event_type,
         sum(CASE WHEN dayofweek(ts) IN (0, 6) AND value > 100 THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN dayofweek(ts) IN (0, 6) AND value <= 100 THEN 1 ELSE 0 END) AS b,
         sum(CASE WHEN dayofweek(ts) NOT IN (0, 6) AND value > 100 THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN dayofweek(ts) NOT IN (0, 6) AND value <= 100 THEN 1 ELSE 0 END) AS d
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       {round6_sql(
           "CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"
       )} AS odds_ratio,
       {round6_sql(
           "ln(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))"
           " - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)"
       )} AS log_or_lo,
       {round6_sql(
           "ln(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))"
           " + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)"
       )} AS log_or_hi
FROM cells
"""


@register("odds_ratio_weekend_highvalue", _OR_SQL)
def odds_ratio_weekend_highvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 odds ratio per event type — does the weekend change the odds
    of a high-value (>100) event? — with the Wald 95% CI on log-OR,
    the epidemiology/experimentation workhorse beside the z-test and
    chi-squared. All four cells are exact int64 from ONE
    partial-aggregated scan (conditional sums, no pivot); OR and its
    CI are single double expressions over those integers. Note the
    weekday convention split: Spark dayofweek is 1=Sunday..7 while
    DuckDB is 0=Sunday..6 — each dialect states the weekend in its own
    convention and the CELLS are compared, so the convention cannot
    silently skew."""
    ev = load_table(spark, sf_dir, "events")
    weekend = F.dayofweek("ts").isin(1, 7)
    hi = F.col("value") > 100
    cells = ev.groupBy("event_type").agg(
        F.sum((weekend & hi).cast("int")).alias("a"),
        F.sum((weekend & ~hi).cast("int")).alias("b"),
        F.sum((~weekend & hi).cast("int")).alias("c"),
        F.sum((~weekend & ~hi).cast("int")).alias("d"),
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    c, d = F.col("c").cast("double"), F.col("d").cast("double")
    logor = F.log(a * d / (b * c))
    half = 1.96 * F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    return cells.select(
        "event_type",
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        round6(a * d / (b * c)).alias("odds_ratio"),
        round6(logor - half).alias("log_or_lo"),
        round6(logor + half).alias("log_or_hi"),
    )


# ---------------------------------------------------------------------------
# paired t-test: per-user AM mean vs PM mean
# ---------------------------------------------------------------------------

_PAIRED_SQL = f"""
WITH halves AS (
  SELECT user_id,
         sum(CASE WHEN hour(ts) < 12
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS s_am,
         sum(CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END) AS n_am,
         sum(CASE WHEN hour(ts) >= 12
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS s_pm,
         sum(CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END) AS n_pm
  FROM events GROUP BY user_id
),
diffs AS (
  SELECT (s_am * 1000) // n_am - (s_pm * 1000) // n_pm AS dm
  FROM halves WHERE n_am > 0 AND n_pm > 0
),
m AS (
  SELECT count(*) AS n, sum(dm) AS s1, sum(dm * dm) AS s2 FROM diffs
)
SELECT CAST(n AS BIGINT) AS n_users,
       {round6_sql("CAST(s1 AS DOUBLE) / n / 1e3")} AS mean_diff_cents,
       {round6_sql(
           "CAST(s1 AS DOUBLE) / n"
           " / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)"
           " / (n - 1) / n)"
       )} AS t_stat
FROM m
"""


@register("paired_ttest_am_pm", _PAIRED_SQL)
def paired_ttest_am_pm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test of per-user morning vs afternoon mean event value
    — the within-subject design that welch_ttest_events (independent
    samples) cannot express; pairing removes between-user variance.
    Each user's AM−PM mean difference is quantized to MILLI-cents by
    TRUE integer division (sum·10³ // n — engine-exact, no float mean;
    10⁶ would overflow: means ≤ 5·10¹⁰ micro-cents squared is ~10²¹ >
    2⁶³, while milli-cent d² ≤ 2.5·10¹⁵ leaves int64 headroom for ~10³
    users per sum), then n, Σd, Σd² accumulate as int64 and the t
    statistic is one closed form. Two hash aggs, the second over ONE
    group."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    am = F.hour("ts") < 12
    halves = ev.groupBy("user_id").agg(
        F.sum(F.when(am, cents).otherwise(0)).alias("s_am"),
        F.sum(am.cast("int")).alias("n_am"),
        F.sum(F.when(~am, cents).otherwise(0)).alias("s_pm"),
        F.sum((~am).cast("int")).alias("n_pm"),
    )
    diffs = halves.filter((F.col("n_am") > 0) & (F.col("n_pm") > 0)).select(
        F.expr("(s_am * 1000) div n_am - (s_pm * 1000) div n_pm").alias("dm")
    )
    m = diffs.agg(
        F.count("*").alias("n"),
        F.sum("dm").alias("s1"),
        F.sum(F.col("dm") * F.col("dm")).alias("s2"),
    )
    n = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    se = F.sqrt((s2 - s1 * s1 / n) / (n - 1) / n)
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        round6(s1 / n / 1e3).alias("mean_diff_cents"),
        round6(s1 / n / se).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# Poisson arrival-rate estimates with normal-approximation CIs
# ---------------------------------------------------------------------------

_POISSON_SQL = f"""
WITH span AS (
  SELECT event_type, count(*) AS n,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(span_us AS BIGINT) AS span_us,
       {round6_sql("CAST(n AS DOUBLE) * 3600e6 / CAST(span_us AS DOUBLE)")}
         AS rate_per_hour,
       {round6_sql(
           "(CAST(n AS DOUBLE) - 1.96 * sqrt(CAST(n AS DOUBLE))) * 3600e6"
           " / CAST(span_us AS DOUBLE)"
       )} AS rate_lo,
       {round6_sql(
           "(CAST(n AS DOUBLE) + 1.96 * sqrt(CAST(n AS DOUBLE))) * 3600e6"
           " / CAST(span_us AS DOUBLE)"
       )} AS rate_hi
FROM span
"""


@register("poisson_rate_ci", _POISSON_SQL)
def poisson_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Poisson arrival-rate estimate (events/hour over the
    observed span) with the normal-approximation 95% interval
    (n ± 1.96√n scaled by the span) — the capacity-planning companion
    to interarrival_stats and ts_fano_factor. Count and span (exact
    epoch-µs extrema) are integers from one partial-aggregated scan;
    the three rates are single double expressions, so the interval is
    engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span_us"),
    )
    n = F.col("n").cast("double")
    span_us = F.col("span_us").cast("double")
    return span.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("span_us").cast("long").alias("span_us"),
        round6(n * 3600e6 / span_us).alias("rate_per_hour"),
        round6((n - 1.96 * F.sqrt(n)) * 3600e6 / span_us).alias("rate_lo"),
        round6((n + 1.96 * F.sqrt(n)) * 3600e6 / span_us).alias("rate_hi"),
    )
