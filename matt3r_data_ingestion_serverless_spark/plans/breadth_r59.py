"""Round-2 batch 34 (this run): SPC p-chart for return rates and a
composite bot-likelihood score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# p-chart: monthly return-rate control limits
# ---------------------------------------------------------------------------

_PCHART_SQL = f"""
WITH l AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem
),
m AS (SELECT month, count(*) AS n, sum(ret) AS r FROM l GROUP BY month),
g AS (SELECT sum(n) AS n_tot, sum(r) AS r_tot FROM m)
SELECT m.month,
       CAST(m.n AS BIGINT) AS n_lines,
       CAST(m.r AS BIGINT) AS n_returned,
       CAST((m.r * 1000000) // m.n AS BIGINT) AS p_micro,
       {round6_sql(
           "CAST(g.r_tot AS DOUBLE) / g.n_tot"
           " + 3.0 * sqrt(CAST(g.r_tot AS DOUBLE) / g.n_tot"
           " * (1.0 - CAST(g.r_tot AS DOUBLE) / g.n_tot) / m.n)"
       )} AS ucl,
       {round6_sql(
           "CAST(g.r_tot AS DOUBLE) / g.n_tot"
           " - 3.0 * sqrt(CAST(g.r_tot AS DOUBLE) / g.n_tot"
           " * (1.0 - CAST(g.r_tot AS DOUBLE) / g.n_tot) / m.n)"
       )} AS lcl,
       CAST(CAST(m.r AS DOUBLE) / m.n >
            CAST(g.r_tot AS DOUBLE) / g.n_tot
            + 3.0 * sqrt(CAST(g.r_tot AS DOUBLE) / g.n_tot
              * (1.0 - CAST(g.r_tot AS DOUBLE) / g.n_tot) / m.n)
            OR
            CAST(m.r AS DOUBLE) / m.n <
            CAST(g.r_tot AS DOUBLE) / g.n_tot
            - 3.0 * sqrt(CAST(g.r_tot AS DOUBLE) / g.n_tot
              * (1.0 - CAST(g.r_tot AS DOUBLE) / g.n_tot) / m.n)
            AS BOOLEAN) AS out_of_control
FROM m CROSS JOIN g
"""


@register("spc_p_chart_returns", _PCHART_SQL)
def spc_p_chart_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC p-chart for the monthly return-line proportion — the
    attribute control chart (binomial 3σ limits p̄ ± 3√(p̄(1−p̄)/n),
    variable-width per month) that completes the SPC pair with
    ts_spc_control_chart's XmR for continuous measures. The monthly
    proportion is reported as an exact integer micro-share; limits and
    the out-of-control flag are single double expressions over exact
    counts — the flag's comparison uses IDENTICAL expressions in both
    dialects so the verdict cannot straddle an ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    l = li.select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    m = l.groupBy("month").agg(F.count("*").alias("n"), F.sum("ret").alias("r"))
    g = m.agg(F.sum("n").alias("n_tot"), F.sum("r").alias("r_tot"))
    j = m.crossJoin(F.broadcast(g))
    pbar = F.col("r_tot").cast("double") / F.col("n_tot")
    halfw = 3.0 * F.sqrt(pbar * (1.0 - pbar) / F.col("n"))
    p = F.col("r").cast("double") / F.col("n")
    return j.select(
        "month",
        F.col("n").cast("long").alias("n_lines"),
        F.col("r").cast("long").alias("n_returned"),
        F.expr("(r * 1000000) div n").cast("long").alias("p_micro"),
        round6(pbar + halfw).alias("ucl"),
        round6(pbar - halfw).alias("lcl"),
        ((p > pbar + halfw) | (p < pbar - halfw)).alias("out_of_control"),
    )


# ---------------------------------------------------------------------------
# composite bot-likelihood score per user
# ---------------------------------------------------------------------------

_BOT_SQL = """
WITH per AS (
  SELECT user_id, count(*) AS n,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us,
         count(DISTINCT event_type) AS n_types,
         sum(CASE WHEN hour(ts) >= 2 AND hour(ts) < 5 THEN 1 ELSE 0 END) AS night
  FROM events GROUP BY user_id
),
f AS (
  SELECT user_id, n, n_types,
         CASE WHEN span_us > 0 THEN (n * 3600000000) // span_us ELSE n END
           AS rate_per_hour,
         (night * 1000000) // n AS night_micro
  FROM per WHERE n >= 5
),
s AS (
  SELECT user_id, n, rate_per_hour, n_types, night_micro,
         CASE WHEN rate_per_hour >= 2 THEN 400 ELSE 0 END
         + CASE WHEN n_types <= 2 THEN 300 ELSE 0 END
         + CASE WHEN night_micro >= 250000 THEN 300 ELSE 0 END AS score_milli
  FROM f
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(rate_per_hour AS BIGINT) AS rate_per_hour,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(night_micro AS BIGINT) AS night_micro,
       CAST(score_milli AS BIGINT) AS bot_score_milli,
       CAST(score_milli >= 600 AS BOOLEAN) AS flagged
FROM s
"""


@register("ns_bot_score_composite", _BOT_SQL)
def ns_bot_score_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite bot-likelihood score — the rules-based fraud screen
    combining three integer features per user (sustained event rate,
    low behavioral diversity, night-hours share) into a weighted
    permille score with a flag threshold; the deployable sibling of
    ns_rules_engine_filter (generic rules) and user_transition_entropy
    (the statistical signal). Every feature is integer-derived (true
    integer division for rate and night share), so scores and flags
    are engine-exact; one hash agg + one projection."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span_us"),
        F.count_distinct("event_type").alias("n_types"),
        F.sum(
            F.when((F.hour("ts") >= 2) & (F.hour("ts") < 5), 1).otherwise(0)
        ).alias("night"),
    )
    f = per.filter(F.col("n") >= 5).select(
        "user_id",
        "n",
        "n_types",
        F.when(
            F.col("span_us") > 0, F.expr("(n * 3600000000) div span_us")
        )
        .otherwise(F.col("n"))
        .alias("rate_per_hour"),
        F.expr("(night * 1000000) div n").alias("night_micro"),
    )
    score = (
        F.when(F.col("rate_per_hour") >= 2, 400).otherwise(0)
        + F.when(F.col("n_types") <= 2, 300).otherwise(0)
        + F.when(F.col("night_micro") >= 250000, 300).otherwise(0)
    )
    s = f.select(
        "user_id", "n", "rate_per_hour", "n_types", "night_micro", score.alias("score_milli")
    )
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.col("rate_per_hour").cast("long").alias("rate_per_hour"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("night_micro").cast("long").alias("night_micro"),
        F.col("score_milli").cast("long").alias("bot_score_milli"),
        (F.col("score_milli") >= 600).alias("flagged"),
    )
