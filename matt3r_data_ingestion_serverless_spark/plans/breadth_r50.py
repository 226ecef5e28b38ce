"""Round-2 batch 25 (this run): a weekday seasonal index and the
open-triad (dedup chaining risk) audit.

Index shares use cross-multiplied true integer division; triad counts
come from the degree identity — both engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# weekday seasonal index of order revenue
# ---------------------------------------------------------------------------

_WSI_SQL = f"""
WITH d AS (
  SELECT dayofweek(o_orderdate) AS dow,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
w AS (SELECT dow, count(*) AS n_w, sum(cents) AS s_w FROM d GROUP BY dow),
t AS (SELECT sum(n_w) AS n_tot, sum(s_w) AS s_tot FROM w)
SELECT w.dow,
       CAST(w.n_w AS BIGINT) AS n_orders,
       CAST(w.s_w AS BIGINT) AS revenue_cents,
       CAST((((w.s_w * 1000) // w.n_w) * 1000000)
            // ((t.s_tot * 1000) // t.n_tot) AS BIGINT) AS index_micro,
       {round6_sql(
           "(CAST(w.s_w AS DOUBLE) / w.n_w) / (CAST(t.s_tot AS DOUBLE) / t.n_tot)"
       )} AS seasonal_index
FROM w CROSS JOIN t
"""


@register("weekday_seasonal_index", _WSI_SQL)
def weekday_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal index of average order value — each weekday's
    mean vs the overall mean, the ratio-of-ratios that drives staffing
    and promotion calendars (the weekly twin of ts_seasonal_baseline's
    diurnal profile). The index is computed TWICE: as a two-stage
    BIGINT division over milli-cent means (the single-rational DECIMAL
    form is NOT portable — DuckDB routes DECIMAL // through DOUBLE and
    loses exactness past 2⁵³; quantize the means first, then divide)
    and as the conventional double ratio (round6) — the pair
    demonstrates the repo's exactness discipline. One 7-row agg + a 1-row
    broadcast. Spark's dayofweek (1=Sunday) is shifted by −1 so both
    dialects key the row on the same 0=Sunday..6 convention."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = d.groupBy("dow").agg(F.count("*").alias("n_w"), F.sum("cents").alias("s_w"))
    t = w.agg(F.sum("n_w").alias("n_tot"), F.sum("s_w").alias("s_tot"))
    j = w.crossJoin(F.broadcast(t))
    idx_int = F.expr(
        "cast((((s_w * 1000) div n_w) * 1000000)"
        " div ((s_tot * 1000) div n_tot) as bigint)"
    )
    idx_dbl = (F.col("s_w").cast("double") / F.col("n_w")) / (
        F.col("s_tot").cast("double") / F.col("n_tot")
    )
    return j.select(
        "dow",
        F.col("n_w").cast("long").alias("n_orders"),
        F.col("s_w").cast("long").alias("revenue_cents"),
        idx_int.alias("index_micro"),
        round6(idx_dbl).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# open triads: near-dup transitivity violations
# ---------------------------------------------------------------------------


def _triads_sql() -> str:
    from matt3r_data_ingestion_serverless_spark.plans.northstar import _minhash_lsh_sql

    pairs = _minhash_lsh_sql().strip()
    return f"""
WITH pairs AS ({pairs}),
und AS (
  SELECT doc_a AS s, doc_b AS t FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
deg AS (SELECT s, count(*) AS d FROM und GROUP BY s),
paths AS (SELECT CAST(sum(d * (d - 1)) AS BIGINT) // 2 AS n_paths2 FROM deg),
tri AS (
  SELECT count(*) AS n_triangles
  FROM pairs e1
  JOIN pairs e2 ON e1.doc_b = e2.doc_a
  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
)
SELECT CAST(p.n_paths2 AS BIGINT) AS n_paths2,
       CAST(t.n_triangles AS BIGINT) AS n_triangles,
       CAST(p.n_paths2 - 3 * t.n_triangles AS BIGINT) AS n_open_triads,
       {round6_sql(
           "CASE WHEN p.n_paths2 = 0 THEN 0.0"
           " ELSE 3.0 * t.n_triangles / p.n_paths2 END"
       )} AS global_clustering
FROM paths p CROSS JOIN tri t
"""


@register("graph_open_triads", _triads_sql())
def graph_open_triads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-triad audit of the near-dup graph: a~b and b~c with a≁c —
    exactly where greedy dedup-by-chaining (connected components)
    merges documents that are NOT mutually similar, so the open-triad
    count is the transitivity-violation exposure of ns_dup_clusters
    and the global clustering coefficient (3T / paths₂) its quality
    score. Paths-of-length-2 come from the degree identity Σd(d−1)/2 —
    one agg, no path enumeration; only the (already canonical a<b<c)
    triangle count joins. All exact int64."""
    from matt3r_data_ingestion_serverless_spark.plans.northstar import (
        ns_dedup_minhash_lsh,
    )

    pairs = (
        ns_dedup_minhash_lsh(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    und = pairs.union(pairs.select("doc_b", "doc_a")).toDF("s", "t")
    deg = und.groupBy("s").agg(F.count("*").alias("d"))
    paths = deg.agg(
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_paths2")
    )
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).agg(F.count("*").alias("n_triangles"))
    j = paths.crossJoin(F.broadcast(tri))
    cc = F.when(F.col("n_paths2") == 0, F.lit(0.0)).otherwise(
        3.0 * F.col("n_triangles") / F.col("n_paths2")
    )
    return j.select(
        F.col("n_paths2").cast("long").alias("n_paths2"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
        (F.col("n_paths2") - 3 * F.col("n_triangles")).cast("long").alias("n_open_triads"),
        round6(cc).alias("global_clustering"),
    )
