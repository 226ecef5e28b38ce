"""Round-2 batch 7 (this run): exact PERCENTILE_CONT-style
interpolated quantiles in pure integer arithmetic, a delta-method CI
for a ratio metric, and the harmonic mean via quantized reciprocals.

The interpolation trick: pos = (n−1)·p/10 splits into integer rank k
and remainder r (mod 10), so the interpolated value is
((10−r)·a + r·b)/10 — cross-multiplied int64 until one final division.
No engine's native percentile_cont/quantile_cont is trusted to agree
bit-for-bit; both dialects compute THIS formula (SCALE.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# exact interpolated (CONT) p50/p90 per event type
# ---------------------------------------------------------------------------

_CONT_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
k AS (
  SELECT event_type, cents, rn, n,
         ((n - 1) * 5) // 10 + 1 AS k50, ((n - 1) * 5) % 10 AS r50,
         ((n - 1) * 9) // 10 + 1 AS k90, ((n - 1) * 9) % 10 AS r90
  FROM r
),
s AS (
  SELECT event_type, max(n) AS n,
         max(CASE WHEN rn = k50 THEN cents END) AS a50,
         max(CASE WHEN rn = k50 + 1 THEN cents END) AS b50,
         max(r50) AS r50,
         max(CASE WHEN rn = k90 THEN cents END) AS a90,
         max(CASE WHEN rn = k90 + 1 THEN cents END) AS b90,
         max(r90) AS r90
  FROM k GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       {round6_sql(
           "CAST((10 - r50) * a50 + r50 * coalesce(b50, a50) AS DOUBLE) / 1000.0"
       )} AS p50_cont,
       {round6_sql(
           "CAST((10 - r90) * a90 + r90 * coalesce(b90, a90) AS DOUBLE) / 1000.0"
       )} AS p90_cont
FROM s
"""


@register("exact_interpolated_quantiles", _CONT_SQL)
def exact_interpolated_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT semantics ((n−1)·p positional interpolation)
    computed EXACTLY: for p ∈ {.5, .9} the position (n−1)·p/10 splits
    into integer rank k and tenth-remainder r, and the interpolated
    value is ((10−r)·a + r·b)/10 over integer cents — so the result is
    engine-exact where native percentile_cont/quantile_cont implement
    the same definition with different float op orders. Complements
    exact_global_quantiles (DISC). One rank window per type feeds both
    quantiles; the bracketing rows are picked by conditional MAX in a
    single agg — no second scan, no self-join. The /1000 converts
    tenth-of-cent units to currency."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    r = v.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    k = (
        r.withColumn("k50", F.expr("((n - 1) * 5) div 10 + 1"))
        .withColumn("r50", F.expr("((n - 1) * 5) % 10"))
        .withColumn("k90", F.expr("((n - 1) * 9) div 10 + 1"))
        .withColumn("r90", F.expr("((n - 1) * 9) % 10"))
    )
    s = k.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("rn") == F.col("k50"), F.col("cents"))).alias("a50"),
        F.max(F.when(F.col("rn") == F.col("k50") + 1, F.col("cents"))).alias("b50"),
        F.max("r50").alias("r50"),
        F.max(F.when(F.col("rn") == F.col("k90"), F.col("cents"))).alias("a90"),
        F.max(F.when(F.col("rn") == F.col("k90") + 1, F.col("cents"))).alias("b90"),
        F.max("r90").alias("r90"),
    )
    p50 = (
        (10 - F.col("r50")) * F.col("a50")
        + F.col("r50") * F.coalesce(F.col("b50"), F.col("a50"))
    ).cast("double") / 1000.0
    p90 = (
        (10 - F.col("r90")) * F.col("a90")
        + F.col("r90") * F.coalesce(F.col("b90"), F.col("a90"))
    ).cast("double") / 1000.0
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        round6(p50).alias("p50_cont"),
        round6(p90).alias("p90_cont"),
    )


# ---------------------------------------------------------------------------
# delta-method CI for a ratio metric (revenue per order, monthly)
# ---------------------------------------------------------------------------

_DELTA_SQL = f"""
WITH per_order AS (
  SELECT o.o_orderkey,
         strftime(o.o_orderdate, '%Y') AS year,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(1 AS BIGINT) AS one
  FROM orders o
),
m AS (
  SELECT year, count(*) AS n,
         sum(cents) AS sx, sum(one) AS sy,
         sum(CAST(cents AS DECIMAL(38,0)) * cents) AS sxx, sum(cents * one) AS sxy, sum(one * one) AS syy
  FROM per_order GROUP BY year
)
SELECT year,
       CAST(n AS BIGINT) AS n_orders,
       {round6_sql("CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) / 100.0")} AS revenue_per_order,
       {round6_sql(
           "sqrt(greatest("
           " (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))"
           " / n, 0.0)) / 100.0"
       )} AS se_delta,
       {round6_sql(
           "CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) / 100.0"
           " - 1.96 * sqrt(greatest("
           " (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))"
           " / n, 0.0)) / 100.0"
       )} AS ci_lo,
       {round6_sql(
           "CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) / 100.0"
           " + 1.96 * sqrt(greatest("
           " (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))"
           " / n, 0.0)) / 100.0"
       )} AS ci_hi
FROM m
"""


@register("ratio_metric_delta_ci", _DELTA_SQL)
def ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error and 95% CI for the yearly
    revenue-per-order ratio metric — the estimator every
    experimentation platform uses for ratio KPIs (here the denominator
    is the per-unit count, so the delta SE reduces to SE of the mean;
    the moment-sum shape sxx/sxy/syy is the general ratio machinery).
    The moment sums accumulate exactly (the second moment in
    DECIMAL(38,0) — cents2 x 150k orders/year overflows int64) in one
    partial-aggregated scan; SE and bounds are closed-form doubles over
    those integers, with identical expressions in both dialects."""
    orders = load_table(spark, sf_dir, "orders")
    per = orders.select(
        F.date_format("o_orderdate", "yyyy").alias("year"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("one"),
    )
    m = per.groupBy("year").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum("one").alias("sy"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sxx"),
        F.sum(F.col("cents") * F.col("one")).alias("sxy"),
        F.sum(F.col("one") * F.col("one")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    ratio = sx / sy / 100.0
    se = F.sqrt(F.greatest((sxx / n - (sx / n) * (sx / n)) / n, F.lit(0.0))) / 100.0
    return m.select(
        "year",
        F.col("n").cast("long").alias("n_orders"),
        round6(ratio).alias("revenue_per_order"),
        round6(se).alias("se_delta"),
        round6(ratio - 1.96 * se).alias("ci_lo"),
        round6(ratio + 1.96 * se).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# harmonic mean via quantized reciprocals
# ---------------------------------------------------------------------------

_HARMONIC_SQL = f"""
WITH q AS (
  SELECT event_type,
         CAST(floor(1e9 / value + 0.5) AS BIGINT) AS inv_nano
  FROM events WHERE value > 0
),
s AS (SELECT event_type, count(*) AS n, sum(inv_nano) AS s1 FROM q GROUP BY event_type)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(s1 AS BIGINT) AS sum_inv_nano,
       {round6_sql("CAST(n AS DOUBLE) * 1e9 / CAST(s1 AS DOUBLE)")} AS harmonic_mean
FROM s
"""


@register("harmonic_mean_by_type", _HARMONIC_SQL)
def harmonic_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic mean of event values per type — the correct average
    for rates (throughput, speed, price-per-unit), completing the
    Pythagorean-means trio with geometric_mean_by_type and the plain
    arithmetic aggregates. Each reciprocal quantizes to integer
    nano-units per row (⌊10⁹/x⌉ ≤ 10¹¹ for x ≥ 0.01, summing ~10⁵ rows
    ≪ 2⁶³), so the cross-row sum is order-free int64 and the final
    n·10⁹/Σ is one double expression. One partial-aggregated scan."""
    ev = load_table(spark, sf_dir, "events")
    inv = F.floor(1e9 / F.col("value") + 0.5).cast("long")
    q = ev.filter(F.col("value") > 0).select("event_type", inv.alias("inv_nano"))
    s = q.groupBy("event_type").agg(F.count("*").alias("n"), F.sum("inv_nano").alias("s1"))
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("s1").cast("long").alias("sum_inv_nano"),
        round6(F.col("n").cast("double") * 1e9 / F.col("s1").cast("double")).alias(
            "harmonic_mean"
        ),
    )
