"""Round-4 batch 20: exact weighted quantiles and the Fano burstiness
factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# exact weighted median (quantity-weighted price per flag)
# ---------------------------------------------------------------------------

_WMED_SQL = f"""
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
),
vc AS (SELECT flag, cents, sum(w) AS w FROM v GROUP BY 1, 2),
cum AS (
  SELECT flag, cents, w,
         sum(w) OVER (PARTITION BY flag ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(w) OVER (PARTITION BY flag) AS tw
  FROM vc
)
SELECT flag,
       CAST(max(tw) AS BIGINT) AS total_weight,
       CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT)
         AS weighted_median_cents,
       CAST(min(CASE WHEN 10 * cw >= 9 * tw THEN cents END) AS BIGINT)
         AS weighted_p90_cents
FROM cum GROUP BY flag
"""


@register("weighted_median_price", _WMED_SQL)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted quantiles: the price at which half (p50) / 90%
    (p90) of the shipped QUANTITY sits at or below — "the median unit
    moved at this price", which is what pricing/mix analysis means by
    median, not the median line item. Thresholds are integer
    cross-multiplied (2·cw ≥ tw, 10·cw ≥ 9·tw) so no float share can
    flip the cutoff.

    Same value-histogram discipline as exact_global_quantiles, with the
    cumulative window running over WEIGHT mass instead of row counts —
    the weighted generalization neither engine has as a built-in
    (DuckDB's quantile ignores weights; Spark has no weighted
    percentile at all)."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    vc = v.groupBy("flag", "cents").agg(F.sum("w").alias("w"))
    cum = vc.select(
        "flag",
        "cents",
        F.sum("w")
        .over(
            Window.partitionBy("flag")
            .orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cw"),
        F.sum("w").over(Window.partitionBy("flag")).alias("tw"),
    )
    return cum.groupBy("flag").agg(
        F.max("tw").cast("long").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents")))
        .cast("long")
        .alias("weighted_median_cents"),
        F.min(F.when(10 * F.col("cw") >= 9 * F.col("tw"), F.col("cents")))
        .cast("long")
        .alias("weighted_p90_cents"),
    )


# ---------------------------------------------------------------------------
# Fano factor (burstiness of the event arrival process)
# ---------------------------------------------------------------------------

_FANO_SQL = f"""
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       count(*) AS n_hours,
       CAST(sum(c) AS BIGINT) AS n_events,
       {round6_sql(
           "(CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS DOUBLE)"
           " / count(*) / (count(*) - 1))"
           " / (CAST(sum(c) AS DOUBLE) / count(*))"
       )} AS fano_factor
FROM h GROUP BY event_type
"""


@register("ts_fano_factor", _FANO_SQL)
def ts_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion) of hourly event counts per
    channel: sample-variance / mean. A Poisson arrival process has
    F = 1; F ≫ 1 = bursty (batched uploads, thundering herds — the
    reference's per-file Lambda fan-out produces exactly such bursts),
    F < 1 = regularized (rate-limited, heartbeat-like). The one-number
    arrival-process characterization read next to interarrival_stats.

    Hourly counts are exact ints; variance comes from the
    (n·Σc² − (Σc)²)/(n(n−1)) moment identity and the final ratio is
    one fixed double formula — the welch_ttest_events discipline. NOTE
    the missing-hour caveat: absent cells are not zero-filled here (the
    grid join in ts_gap_fill_locf adds them when that matters)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count("*").alias("c")
    )
    agg = h.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    n, s, s2 = F.col("n"), F.col("s"), F.col("s2")
    var = (n * s2 - s * s).cast("double") / n / (n - 1)
    mean = s.cast("double") / n
    return agg.select(
        "event_type",
        n.cast("long").alias("n_hours"),
        s.cast("long").alias("n_events"),
        round6(var / mean).alias("fano_factor"),
    )
