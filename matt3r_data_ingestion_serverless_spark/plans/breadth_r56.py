"""Round-2 batch 31 (this run): day-N retention curve and order
lead-time percentiles by priority.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# day-N retention curve (N = 1, 3, 7, 14)
# ---------------------------------------------------------------------------

_RET_DAYS = (1, 3, 7, 14)


def _ret_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN dd = {n} THEN 1 ELSE 0 END) AS BIGINT) AS d{n}_retained"
        for n in _RET_DAYS
    )
    shares = ",\n       ".join(
        f"CAST((sum(CASE WHEN dd = {n} THEN 1 ELSE 0 END) * 1000000)"
        f" // max(cohort.n) AS BIGINT) AS d{n}_share_micro"
        for n in _RET_DAYS
    )
    return f"""
WITH act AS (
  SELECT DISTINCT user_id, CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS day FROM events
),
first AS (SELECT user_id, min(day) AS d0 FROM act GROUP BY user_id),
cohort AS (SELECT count(*) AS n FROM first),
rel AS (
  SELECT a.user_id, datediff('day', f.d0, a.day) AS dd
  FROM act a JOIN first f USING (user_id)
)
SELECT CAST(max(cohort.n) AS BIGINT) AS cohort_size,
       {cols},
       {shares}
FROM rel CROSS JOIN cohort
"""


@register("day_n_retention_curve", _ret_sql())
def day_n_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N retention (N = 1, 3, 7, 14): how many users are active
    exactly N days after their FIRST active day — the product-health
    curve at day grain that cohort_retention expresses weekly and
    growth_accounting_monthly monthly. Distinct (user, day) shrink →
    one min-day per user → day-offset flags in a single conditional
    agg; retention shares are integer micro-divisions of the cohort
    size. One row out."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date(F.date_format("ts", "yyyy-MM-dd")).alias("day")).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("d0"))
    cohort = first.agg(F.count("*").alias("n"))
    rel = act.join(first, "user_id").select(
        "user_id", F.datediff(F.col("day"), F.col("d0")).alias("dd")
    )
    j = rel.crossJoin(F.broadcast(cohort))
    aggs = [F.max("n").cast("long").alias("cohort_size")]
    for n in _RET_DAYS:
        aggs.append(
            F.sum(F.when(F.col("dd") == n, 1).otherwise(0))
            .cast("long")
            .alias(f"d{n}_retained")
        )
    for n in _RET_DAYS:
        aggs.append(
            F.expr(
                f"(sum(CASE WHEN dd = {n} THEN 1 ELSE 0 END) * 1000000) div max(n)"
            )
            .cast("long")
            .alias(f"d{n}_share_micro")
        )
    return j.agg(*aggs)


# ---------------------------------------------------------------------------
# order-to-first-ship lead time percentiles by priority
# ---------------------------------------------------------------------------

_LEAD_SQL = """
WITH first_ship AS (
  SELECT l_orderkey, min(l_shipdate) AS ship0 FROM lineitem GROUP BY l_orderkey
),
lead AS (
  SELECT o.o_orderpriority AS priority,
         datediff('day', CAST(strftime(o.o_orderdate, '%Y-%m-%d') AS DATE),
                  CAST(strftime(s.ship0, '%Y-%m-%d') AS DATE)) AS days
  FROM orders o JOIN first_ship s ON o.o_orderkey = s.l_orderkey
),
h AS (SELECT priority, days, count(*) AS c FROM lead GROUP BY priority, days),
e AS (
  SELECT priority, days, c,
         sum(c) OVER (PARTITION BY priority ORDER BY days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY priority) AS n
  FROM h
)
SELECT priority,
       CAST(max(n) AS BIGINT) AS n_orders,
       CAST(min(CASE WHEN cum * 100 >= n * 50 THEN days END) AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN cum * 100 >= n * 90 THEN days END) AS BIGINT) AS p90_days,
       CAST(max(days) AS BIGINT) AS max_days
FROM e GROUP BY priority
"""


@register("leadtime_percentiles_by_priority", _LEAD_SQL)
def leadtime_percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-ship lead time p50/p90/max per order priority —
    does URGENT actually ship faster? The fulfillment-SLA readout via
    the value-histogram exact-percentile pattern (day-grain shrink,
    one cumulative window, cross-multiplied thresholds). The
    first-ship date is one min per order BEFORE the join — the
    aggregate-then-join shape that keeps the fact table from being
    joined at line grain."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship0"))
    lead = orders.join(first_ship, orders.o_orderkey == first_ship.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.to_date(F.date_format("ship0", "yyyy-MM-dd")),
            F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd")),
        ).alias("days"),
    )
    h = lead.groupBy("priority", "days").agg(F.count("*").alias("c"))
    e = h.select(
        "priority",
        "days",
        F.sum("c")
        .over(
            Window.partitionBy("priority")
            .orderBy("days")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
        F.sum("c").over(Window.partitionBy("priority")).alias("n"),
    )
    return e.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * 50, F.col("days")))
        .cast("long")
        .alias("p50_days"),
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * 90, F.col("days")))
        .cast("long")
        .alias("p90_days"),
        F.max("days").cast("long").alias("max_days"),
    )
