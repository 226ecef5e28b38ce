"""Round-2 batch 33 (this run): KS goodness-of-fit of inter-arrival
gaps against the fitted exponential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

_KSE_SQL = f"""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
  FROM events
),
v AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL AND gap_us > 0),
m AS (SELECT event_type, count(*) AS n, sum(gap_us) AS s FROM v GROUP BY event_type),
pts AS (
  SELECT event_type, gap_us, count(*) AS c FROM v GROUP BY event_type, gap_us
),
e AS (
  SELECT p.event_type, p.gap_us, p.c, m.n, m.s,
         sum(p.c) OVER (PARTITION BY p.event_type ORDER BY p.gap_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(floor((1.0 - exp(-(CAST(p.gap_us AS DOUBLE) * m.n / m.s))) * 1e6 + 0.5)
              AS BIGINT) AS cdf_micro
  FROM pts p JOIN m ON p.event_type = m.event_type
),
d AS (
  SELECT event_type, n,
         greatest(abs(cum * 1000000 - n * cdf_micro),
                  abs((cum - c) * 1000000 - n * cdf_micro)) AS num
  FROM e
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(max(num) AS BIGINT) AS d_num,
       {round6_sql("CAST(max(num) AS DOUBLE) / (CAST(max(n) AS DOUBLE) * 1e6)")}
         AS d_stat
FROM d GROUP BY event_type
"""


@register("ks_exponential_fit", _KSE_SQL)
def ks_exponential_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS goodness-of-fit of each stream's inter-arrival gaps against
    its own FITTED exponential (rate λ = n/Σgaps) — the is-this-a-
    Poisson-process test that closes the KS family (uniform null →
    ks_uniform_test, two-sample → ks_two_sample_types, fitted
    parametric → here; burstiness says Fano/interarrival, this says
    HOW far from memoryless). The fitted CDF 1−e^(−λx) quantizes to
    micro-units per distinct gap (λ enters as the SAME double ratio in
    both dialects), so the sup gap compares cross-multiplied int64 on
    both ECDF sides. Distinct-gap shrink before the cumulative
    window."""
    ev = load_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wlag)).alias("gap_us"),
    )
    v = g.filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    m = v.groupBy("event_type").agg(F.count("*").alias("n"), F.sum("gap_us").alias("s"))
    pts = v.groupBy("event_type", "gap_us").agg(F.count("*").alias("c"))
    e = pts.join(F.broadcast(m), "event_type").select(
        "event_type",
        "gap_us",
        "c",
        "n",
        F.sum("c")
        .over(
            Window.partitionBy("event_type")
            .orderBy("gap_us")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
        F.floor(
            (1.0 - F.exp(-(F.col("gap_us").cast("double") * F.col("n") / F.col("s"))))
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("cdf_micro"),
    )
    num = F.greatest(
        F.abs(F.col("cum") * 1000000 - F.col("n") * F.col("cdf_micro")),
        F.abs((F.col("cum") - F.col("c")) * 1000000 - F.col("n") * F.col("cdf_micro")),
    )
    d = e.select("event_type", "n", num.alias("num"))
    return d.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.max("num").cast("long").alias("d_num"),
        round6(
            F.max("num").cast("double") / (F.max("n").cast("double") * 1e6)
        ).alias("d_stat"),
    )
