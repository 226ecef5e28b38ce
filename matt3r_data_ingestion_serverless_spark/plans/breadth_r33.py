"""Round-2 batch 8 (this run): nth_value/lead-default window surface,
array set algebra, and offset tumbling windows.

All outputs are scalar columns (the driver canonicalizer cannot hash
array cells); set results are reported as sizes + membership counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# nth_value / lead-with-default window surface
# ---------------------------------------------------------------------------

_NTH_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
w AS (
  SELECT o_custkey,
         row_number() OVER win AS rn,
         count(*) OVER (PARTITION BY o_custkey) AS n_orders,
         nth_value(cents, 2) OVER win AS second_cents,
         lead(cents, 1, -1) OVER win AS next_cents,
         lag(cents, 2, 0) OVER win AS lag2_cents
  FROM o
  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT o_custkey,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(max(CASE WHEN rn = n_orders THEN second_cents END) AS BIGINT)
         AS second_order_cents,
       CAST(sum(CASE WHEN next_cents = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
       CAST(sum(lag2_cents) AS BIGINT) AS sum_lag2_cents
FROM w GROUP BY o_custkey, n_orders
"""


@register("window_nth_value_surface", _NTH_SQL)
def window_nth_value_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value and offset functions WITH DEFAULTS over one named
    frame: each customer's second-ever order value (nth_value(2) in a
    running frame — NULL until two rows exist, so it is read at the
    final row), a lead(…, default=−1) sentinel proving exactly one
    last-row per key, and a lag-2 sum with default 0. Rounds out the
    window-function matrix (window_rank_breadth covers ranks;
    sql_named_window covers WINDOW-clause parity) — one shuffle on the
    customer key serves all four functions."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    ordered = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    framed = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w = o.select(
        "o_custkey",
        F.row_number().over(ordered).alias("rn"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("n_orders"),
        F.nth_value("cents", 2).over(framed).alias("second_cents"),
        F.lead("cents", 1, -1).over(ordered).alias("next_cents"),
        F.lag("cents", 2, 0).over(ordered).alias("lag2_cents"),
    )
    return w.groupBy("o_custkey", "n_orders").agg(
        F.max(F.when(F.col("rn") == F.col("n_orders"), F.col("second_cents")))
        .cast("long")
        .alias("second_order_cents"),
        F.sum(F.when(F.col("next_cents") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_last"),
        F.sum("lag2_cents").cast("long").alias("sum_lag2_cents"),
    ).select(
        "o_custkey",
        F.col("n_orders").cast("long").alias("n_orders"),
        "second_order_cents",
        "n_last",
        "sum_lag2_cents",
    )


# ---------------------------------------------------------------------------
# array set algebra over first-half vs second-half event types
# ---------------------------------------------------------------------------

_SETOPS_SQL = """
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
  FROM events GROUP BY user_id
),
halves AS (
  SELECT user_id,
         list_sort(list_distinct(list_slice(types, 1, len(types) // 2))) AS h1,
         list_sort(list_distinct(list_slice(types, len(types) // 2 + 1, len(types)))) AS h2
  FROM seq WHERE len(types) >= 2
)
SELECT user_id,
       CAST(len(h1) AS BIGINT) AS n_first,
       CAST(len(h2) AS BIGINT) AS n_second,
       CAST(len(list_distinct(list_concat(h1, h2))) AS BIGINT) AS n_union,
       CAST(len(list_filter(h1, t -> list_contains(h2, t))) AS BIGINT) AS n_intersect,
       CAST(len(list_filter(h1, t -> NOT list_contains(h2, t))) AS BIGINT) AS n_only_first
FROM halves
"""


@register("array_set_ops_surface", _SETOPS_SQL)
def array_set_ops_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — array_union / array_intersect / array_except
    over each user's first-half vs second-half behavior vocabularies
    (did the repertoire shift?). The halves come from ONE ordered list
    agg + slices (no second shuffle); results are reported as sizes
    (|A∪B| = |A|+|B|−|A∩B| holds by construction and is asserted in
    tests; scalar columns keep the driver canonicalizer happy). The
    DuckDB twin spells the same ops with list_* higher-order
    functions."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ).alias("types")
    )
    halves = seq.filter(F.size("types") >= 2).select(
        "user_id",
        F.array_sort(
            F.array_distinct(F.slice(F.col("types"), 1, F.expr("size(types) div 2")))
        ).alias("h1"),
        F.array_sort(
            F.array_distinct(
                F.expr("slice(types, size(types) div 2 + 1, size(types) - size(types) div 2)")
            )
        ).alias("h2"),
    )
    return halves.select(
        "user_id",
        F.size("h1").cast("long").alias("n_first"),
        F.size("h2").cast("long").alias("n_second"),
        F.size(F.array_union("h1", "h2")).cast("long").alias("n_union"),
        F.size(F.array_intersect("h1", "h2")).cast("long").alias("n_intersect"),
        F.size(F.array_except("h1", "h2")).cast("long").alias("n_only_first"),
    )


# ---------------------------------------------------------------------------
# offset tumbling windows (1h windows anchored at :30)
# ---------------------------------------------------------------------------

_OFFSET_SQL = """
WITH b AS (
  SELECT ((epoch_us(ts) - 1800000000) // 3600000000) * 3600000000 + 1800000000
           AS bucket_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT bucket_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY bucket_us
"""


@register("window_offset_buckets", _OFFSET_SQL)
def window_offset_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows anchored at :30 — Spark's
    F.window(ts, '1 hour', startTime='30 minutes'), the business-day /
    timezone-alignment knob of the streaming window operator, graded
    against pure epoch arithmetic (floor((t−30min)/1h)·1h+30min). The
    window struct's start is projected to epoch-µs so the output is
    scalar. Same partial-agg shape as w5_hourly_buckets; the offset
    changes bucket identity, not plan shape."""
    ev = load_table(spark, sf_dir, "events")
    w = ev.select(
        F.window("ts", "1 hour", startTime="30 minutes").alias("win"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    return (
        w.groupBy(F.unix_micros(F.col("win.start")).alias("bucket_us"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
