"""Round-2 batch 28 (this run): difference-in-differences and the
price-ending distribution audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# difference-in-differences: treatment = odd users, cutover = mid-month
# ---------------------------------------------------------------------------

_DID_CUTOVER = "2024-01-16"

_DID_SQL = f"""
WITH g AS (
  SELECT user_id % 2 AS treated,
         CASE WHEN ts >= TIMESTAMP '{_DID_CUTOVER} 00:00:00' THEN 1 ELSE 0 END AS post,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
cells AS (
  SELECT treated, post, count(*) AS n, sum(cents) AS s,
         (sum(cents) * 1000) // count(*) AS mean_milli
  FROM g GROUP BY treated, post
),
w AS (
  SELECT max(CASE WHEN treated = 1 AND post = 0 THEN mean_milli END) AS t_pre,
         max(CASE WHEN treated = 1 AND post = 1 THEN mean_milli END) AS t_post,
         max(CASE WHEN treated = 0 AND post = 0 THEN mean_milli END) AS c_pre,
         max(CASE WHEN treated = 0 AND post = 1 THEN mean_milli END) AS c_post,
         sum(n) AS n_total
  FROM cells
)
SELECT CAST(n_total AS BIGINT) AS n_total,
       CAST(t_post - t_pre AS BIGINT) AS treated_delta_milli,
       CAST(c_post - c_pre AS BIGINT) AS control_delta_milli,
       CAST((t_post - t_pre) - (c_post - c_pre) AS BIGINT) AS did_milli,
       {round6_sql("CAST((t_post - t_pre) - (c_post - c_pre) AS DOUBLE) / 1000.0")}
         AS did_cents
FROM w
"""


@register("diff_in_diff_estimate", _DID_SQL)
def diff_in_diff_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the quasi-experimental estimator
    ((T_post − T_pre) − (C_post − C_pre)) for a mid-month cutover with
    user-parity treatment assignment, completing the causal toolbox
    beside ab_proportion_ztest (randomized) and ratio_metric_delta_ci
    (ratio KPIs). The four cell means quantize to milli-cents by TRUE
    integer division before any subtraction, so the DiD point estimate
    is engine-exact; one conditional-sum scan, a 4-row pivot."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        (F.col("user_id") % 2).alias("treated"),
        (F.col("ts") >= F.lit(_DID_CUTOVER).cast("timestamp")).cast("int").alias("post"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    cells = g.groupBy("treated", "post").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.expr("(sum(cents) * 1000) div count(*)").alias("mean_milli"),
    )
    w = cells.agg(
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("mean_milli"))).alias(
            "t_pre"
        ),
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("mean_milli"))).alias(
            "t_post"
        ),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 0), F.col("mean_milli"))).alias(
            "c_pre"
        ),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 1), F.col("mean_milli"))).alias(
            "c_post"
        ),
        F.sum("n").alias("n_total"),
    )
    did = (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))
    return w.select(
        F.col("n_total").cast("long").alias("n_total"),
        (F.col("t_post") - F.col("t_pre")).cast("long").alias("treated_delta_milli"),
        (F.col("c_post") - F.col("c_pre")).cast("long").alias("control_delta_milli"),
        did.cast("long").alias("did_milli"),
        round6(did.cast("double") / 1000.0).alias("did_cents"),
    )


# ---------------------------------------------------------------------------
# price-ending (psychological pricing) distribution
# ---------------------------------------------------------------------------

_ENDING_SQL = f"""
WITH p AS (
  SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) % 100 AS ending,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part
),
t AS (SELECT count(*) AS n FROM p)
SELECT p.ending,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST((count(*) * 1000000) // max(t.n) AS BIGINT) AS share_micro,
       CAST(sum(cents) AS BIGINT) AS revenue_weight_cents
FROM p CROSS JOIN t
GROUP BY p.ending
ORDER BY n_parts DESC, ending
LIMIT 20
"""


@register("price_ending_distribution", _ENDING_SQL)
def price_ending_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-ending audit: the distribution of the cents digits of
    retail prices (top-20 endings) — the psychological-pricing /
    data-provenance screen (a real catalog clusters on .99/.95/.00;
    uniform endings betray synthetic or converted prices — the pricing
    cousin of benford_digit_audit's leading-digit test). Ending =
    cents % 100, shares by true integer division; one hash agg and a
    deterministic top-k."""
    part = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long")
    p = part.select((cents % 100).alias("ending"), cents.alias("cents"))
    t = p.agg(F.count("*").alias("n"))
    g = p.crossJoin(F.broadcast(t)).groupBy("ending").agg(
        F.count("*").alias("n_parts"),
        F.expr("(count(*) * 1000000) div max(n)").alias("share_micro"),
        F.sum("cents").alias("revenue_weight_cents"),
    )
    return (
        g.select(
            "ending",
            F.col("n_parts").cast("long").alias("n_parts"),
            F.col("share_micro").cast("long").alias("share_micro"),
            F.col("revenue_weight_cents").cast("long").alias("revenue_weight_cents"),
        )
        .orderBy(F.desc("n_parts"), F.asc("ending"))
        .limit(20)
    )
