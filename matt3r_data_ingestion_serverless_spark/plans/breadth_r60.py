"""Round-2 batch 35 (this run): a data-contract audit and naive-
forecast sMAPE evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# dbt-style data-contract audit over events
# ---------------------------------------------------------------------------

_CONTRACT_SQL = """
WITH checks AS (
  SELECT count(*) AS n_rows,
         sum(CASE WHEN ts < TIMESTAMP '2020-01-01 00:00:00'
                    OR ts > TIMESTAMP '2030-01-01 00:00:00' THEN 1 ELSE 0 END)
           AS ts_out_of_range,
         sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS negative_value,
         sum(CASE WHEN event_type NOT IN
                  ('click', 'view', 'purchase', 'signup', 'error')
                  THEN 1 ELSE 0 END) AS unknown_type,
         sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_user,
         count(*) - count(DISTINCT event_id) AS duplicate_ids
  FROM events
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST(ts_out_of_range AS BIGINT) AS ts_out_of_range,
       CAST(negative_value AS BIGINT) AS negative_value,
       CAST(unknown_type AS BIGINT) AS unknown_type,
       CAST(null_user AS BIGINT) AS null_user,
       CAST(duplicate_ids AS BIGINT) AS duplicate_ids,
       CAST(ts_out_of_range + negative_value + unknown_type + null_user
            + duplicate_ids = 0 AS BOOLEAN) AS contract_passed
FROM checks
"""


@register("data_contract_audit", _CONTRACT_SQL)
def data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-style data-contract audit in ONE pass: timestamp range,
    non-negativity, enum membership, not-null, and primary-key
    uniqueness (count − count distinct), each reported as an exact
    violation count with the overall pass flag — the ingestion gate
    that profile_columns (stats) and ri_orphan_audit (referential
    integrity) bracket. All conditional sums share a single scan; the
    uniqueness check is the only aggregate needing a distinct (one
    Expand, combined into the same agg)."""
    ev = load_table(spark, sf_dir, "events")
    checks = ev.agg(
        F.count("*").alias("n_rows"),
        F.sum(
            (
                (F.col("ts") < F.lit("2020-01-01").cast("timestamp"))
                | (F.col("ts") > F.lit("2030-01-01").cast("timestamp"))
            ).cast("int")
        ).alias("ts_out_of_range"),
        F.sum((F.col("value") < 0).cast("int")).alias("negative_value"),
        F.sum(
            (~F.col("event_type").isin("click", "view", "purchase", "signup", "error")).cast(
                "int"
            )
        ).alias("unknown_type"),
        F.sum(F.col("user_id").isNull().cast("int")).alias("null_user"),
        (F.count("*") - F.count_distinct("event_id")).alias("duplicate_ids"),
    )
    total = (
        F.col("ts_out_of_range")
        + F.col("negative_value")
        + F.col("unknown_type")
        + F.col("null_user")
        + F.col("duplicate_ids")
    )
    return checks.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("ts_out_of_range").cast("long").alias("ts_out_of_range"),
        F.col("negative_value").cast("long").alias("negative_value"),
        F.col("unknown_type").cast("long").alias("unknown_type"),
        F.col("null_user").cast("long").alias("null_user"),
        F.col("duplicate_ids").cast("long").alias("duplicate_ids"),
        (total == 0).alias("contract_passed"),
    )


# ---------------------------------------------------------------------------
# naive-forecast sMAPE over monthly revenue
# ---------------------------------------------------------------------------

_SMAPE_SQL = f"""
WITH m AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM lineitem GROUP BY month
),
p AS (
  SELECT month, cents,
         lag(cents) OVER (ORDER BY month) AS forecast
  FROM m
),
t AS (
  SELECT month, cents, forecast,
         (abs(cents - forecast) * 2000000) // (cents + forecast) AS smape_micro
  FROM p WHERE forecast IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_months,
       CAST(sum(smape_micro) AS BIGINT) AS smape_micro_sum,
       CAST(max(smape_micro) AS BIGINT) AS worst_smape_micro,
       {round6_sql("CAST(sum(smape_micro) AS DOUBLE) / count(*) / 1e6")} AS smape
FROM t
"""


@register("forecast_smape_naive", _SMAPE_SQL)
def forecast_smape_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sMAPE of the naive (previous-month) forecast for monthly
    revenue — the baseline every forecasting system must beat, and
    the point-metric companion to forecast_pinball_eval's quantile
    loss. Each month's symmetric error 2|a−f|/(a+f) is ONE integer
    division in micro-units (numerator and denominator exact cents),
    so the per-month terms and their sum are int64; the mean divides
    once. Aggregate-first: the lag and error run on the ~80-month
    rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")).alias("cents")
    )
    p = m.select(
        "month", "cents", F.lag("cents").over(Window.orderBy("month")).alias("forecast")
    ).filter(F.col("forecast").isNotNull())
    t = p.select(
        F.expr("(abs(cents - forecast) * 2000000) div (cents + forecast)").alias(
            "smape_micro"
        )
    )
    return t.agg(
        F.count("*").cast("long").alias("n_months"),
        F.sum("smape_micro").cast("long").alias("smape_micro_sum"),
        F.max("smape_micro").cast("long").alias("worst_smape_micro"),
        round6(F.sum("smape_micro").cast("double") / F.count("*") / 1e6).alias("smape"),
    )
