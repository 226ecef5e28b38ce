"""Round-2 batch 38 (this run): per-device bounding-box extents and
inter-order gap percentiles by market segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# per-device bounding box + diagonal (same synthetic geometry as
# geo_haversine_path; micro-degree integers keep extrema exact)
# ---------------------------------------------------------------------------

_BBOX_SQL = f"""
WITH pts AS (
  SELECT user_id,
         CAST(floor((49.0 + (event_id % 1000) / 1000.0) * 1e6 + 0.5) AS BIGINT)
           AS lat_micro,
         CAST(floor((-123.0 + (user_id % 1000) / 500.0 + (event_id % 97) / 970.0)
                    * 1e6 - 0.5) AS BIGINT) AS lon_micro
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(min(lat_micro) AS BIGINT) AS lat_min_micro,
       CAST(max(lat_micro) AS BIGINT) AS lat_max_micro,
       CAST(min(lon_micro) AS BIGINT) AS lon_min_micro,
       CAST(max(lon_micro) AS BIGINT) AS lon_max_micro,
       CAST((max(lat_micro) - min(lat_micro))
            + (max(lon_micro) - min(lon_micro)) AS BIGINT) AS l1_extent_micro
FROM pts GROUP BY user_id
"""


@register("geo_bbox_extent", _BBOX_SQL)
def geo_bbox_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-device bounding box over the synthetic GPS geometry (the
    same lat/lon derivation as geo_haversine_path) — the spatial
    extent summary that seeds geofence design (geo_geofence_transitions)
    and grid sizing (geo_grid_density). Coordinates quantize to
    micro-degrees at the row level (lon is negative, so its floor uses
    −0.5 — the shared sign-aware rule), making every extremum and the
    L1 extent exact int64. One partial-aggregated scan — min/max
    combine map-side."""
    ev = load_table(spark, sf_dir, "events")
    lat = 49.0 + (F.col("event_id") % 1000) / 1000.0
    lon = -123.0 + (F.col("user_id") % 1000) / 500.0 + (F.col("event_id") % 97) / 970.0
    pts = ev.select(
        "user_id",
        F.floor(lat * 1e6 + 0.5).cast("long").alias("lat_micro"),
        F.floor(lon * 1e6 - 0.5).cast("long").alias("lon_micro"),
    )
    return pts.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_points"),
        F.min("lat_micro").cast("long").alias("lat_min_micro"),
        F.max("lat_micro").cast("long").alias("lat_max_micro"),
        F.min("lon_micro").cast("long").alias("lon_min_micro"),
        F.max("lon_micro").cast("long").alias("lon_max_micro"),
        (
            (F.max("lat_micro") - F.min("lat_micro"))
            + (F.max("lon_micro") - F.min("lon_micro"))
        )
        .cast("long")
        .alias("l1_extent_micro"),
    )


# ---------------------------------------------------------------------------
# inter-order gap percentiles by market segment
# ---------------------------------------------------------------------------

_GAP_SQL = """
WITH o AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey, o.o_orderdate, o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT segment,
         datediff('day',
                  CAST(strftime(lag(o_orderdate) OVER w, '%Y-%m-%d') AS DATE),
                  CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE)) AS gap_days
  FROM o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
h AS (SELECT segment, gap_days, count(*) AS c FROM g
      WHERE gap_days IS NOT NULL GROUP BY segment, gap_days),
e AS (
  SELECT segment, gap_days, c,
         sum(c) OVER (PARTITION BY segment ORDER BY gap_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY segment) AS n
  FROM h
)
SELECT segment,
       CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(min(CASE WHEN cum * 100 >= n * 50 THEN gap_days END) AS BIGINT)
         AS p50_gap_days,
       CAST(min(CASE WHEN cum * 100 >= n * 90 THEN gap_days END) AS BIGINT)
         AS p90_gap_days
FROM e GROUP BY segment
"""


@register("interorder_gap_by_segment", _GAP_SQL)
def interorder_gap_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence percentiles: median and p90 days between a
    customer's consecutive orders, rolled up by market segment — the
    replenishment-cycle number behind reorder reminders and churn
    windows (interarrival_stats at the ORDER grain with a dimension
    rollup). The segment arrives by broadcast customer join BEFORE the
    per-customer lag window; gaps then shrink to a day-grain histogram
    and the exact-percentile pattern finishes per segment."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "segment",
        F.datediff(
            F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd")),
            F.to_date(F.date_format(F.lag("o_orderdate").over(w), "yyyy-MM-dd")),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    h = g.groupBy("segment", "gap_days").agg(F.count("*").alias("c"))
    e = h.select(
        "segment",
        "gap_days",
        F.sum("c")
        .over(
            Window.partitionBy("segment")
            .orderBy("gap_days")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
        F.sum("c").over(Window.partitionBy("segment")).alias("n"),
    )
    return e.groupBy("segment").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * 50, F.col("gap_days")))
        .cast("long")
        .alias("p50_gap_days"),
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * 90, F.col("gap_days")))
        .cast("long")
        .alias("p90_gap_days"),
    )
