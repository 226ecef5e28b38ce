"""Round-2 batch 16 (this run): diagonal-Mahalanobis outlier ranking
and the width_bucket histogram surface.

The Mahalanobis distance is assembled from exact int64 moment sums with
per-feature micro-quantization, so the outlier ranking is engine-exact
(SCALE.md §13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# top-k outliers by diagonal Mahalanobis distance (value, hour-of-day)
# ---------------------------------------------------------------------------

_MAHA_K = 20

# per-feature squared z in micro-units, from exact integer moments:
# z² = (x·n − sx)² / ((n·sxx − sx²)·n)  (integers until ONE divide)
def _z2_sql(x: str, f: str) -> str:
    return (
        f"CAST(floor(CAST({x} * n - s{f} AS DOUBLE) * ({x} * n - s{f})"
        f" / (CAST(n AS DOUBLE) * q{f} - CAST(s{f} AS DOUBLE) * s{f}) / n * 1e6 + 0.5)"
        " AS BIGINT)"
    )


_MAHA_SQL = f"""
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         CAST(hour(ts) AS BIGINT) AS h
  FROM events
),
m AS (
  SELECT event_type, count(*) AS n,
         sum(c) AS sc, sum(CAST(c AS DECIMAL(38,0)) * c) AS qc,
         sum(h) AS sh, sum(h * h) AS qh
  FROM v GROUP BY event_type
),
d AS (
  SELECT v.event_id, v.event_type,
         {_z2_sql('v.c', 'c')} + {_z2_sql('v.h', 'h')} AS d2_micro
  FROM v JOIN m USING (event_type)
),
r AS (
  SELECT event_id, event_type, d2_micro,
         row_number() OVER (ORDER BY d2_micro DESC, event_id) AS rk
  FROM d
)
SELECT event_id, event_type, CAST(d2_micro AS BIGINT) AS d2_micro,
       CAST(rk AS BIGINT) AS rk,
       {round6_sql("CAST(d2_micro AS DOUBLE) / 1e6")} AS d2
FROM r WHERE rk <= {_MAHA_K}
"""


@register("mahalanobis_outliers_diag", _MAHA_SQL)
def mahalanobis_outliers_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 multivariate outliers by diagonal Mahalanobis distance
    over (value, hour-of-day) against each event type's own profile —
    the 2-feature generalization of ts_anomaly_zscore that catches
    points unusual in COMBINATION. Each feature's squared z is built
    from exact int64/decimal moment sums in cross-multiplied form
    ((x·n − sx)²/(n·q − sx²)/n) and quantized to micro-units, so the
    distance sum and the global outlier ranking are engine-exact. One
    moment agg (5-row broadcast) + one scan; the global top-k rank is
    the only ordered step."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        F.hour("ts").cast("long").alias("h"),
    )
    m = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("qc"),
        F.sum("h").alias("sh"),
        F.sum(F.col("h") * F.col("h")).alias("qh"),
    )

    def z2(x: str, f: str) -> F.Column:
        num = (F.col(x) * F.col("n") - F.col(f"s{f}")).cast("double")
        den = F.col("n").cast("double") * F.col(f"q{f}").cast("double") - F.col(
            f"s{f}"
        ).cast("double") * F.col(f"s{f}")
        return F.floor(num * (F.col(x) * F.col("n") - F.col(f"s{f}")) / den / F.col("n") * 1e6 + 0.5).cast(
            "long"
        )

    d = v.join(F.broadcast(m), "event_type").select(
        "event_id", "event_type", (z2("c", "c") + z2("h", "h")).alias("d2_micro")
    )
    r = d.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("d2_micro"), F.asc("event_id")))
    )
    return r.filter(F.col("rk") <= _MAHA_K).select(
        "event_id",
        "event_type",
        F.col("d2_micro").cast("long").alias("d2_micro"),
        F.col("rk").cast("long").alias("rk"),
        round6(F.col("d2_micro").cast("double") / 1e6).alias("d2"),
    )


# ---------------------------------------------------------------------------
# width_bucket histogram surface
# ---------------------------------------------------------------------------

_WB_SQL = """
WITH b AS (
  SELECT CASE WHEN value < 0.0 THEN 0
              WHEN value >= 500.0 THEN 21
              ELSE CAST(floor((value - 0.0) / 25.0) AS BIGINT) + 1 END AS bucket,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY bucket
"""


@register("width_bucket_histogram", _WB_SQL)
def width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via the SQL-standard width_bucket function
    (20 buckets over [0, 500), plus the under/overflow buckets 0 and
    21) — the declarative twin of value_histogram's hand-rolled
    floor-division binning. DuckDB has no width_bucket, so the oracle
    states the definition explicitly (left-closed buckets, overflow →
    count+1) with the same 25.0 interval; values sit ≥ 0.01 from every
    edge so the parity is formula-shape-proof. One partial-aggregated
    scan."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.width_bucket(F.col("value"), F.lit(0.0), F.lit(500.0), F.lit(20)).alias("bucket"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    return b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
