"""Engine-surface breadth: deterministic sampling for training-data
pipelines, unpivot/melt, GROUPING SETS, ranking-function breadth, and
higher-order array functions (SURVEY.md §2.4/§2.5 extension rows; the
sampling ops extend the north-star curation toolkit).

Scale notes (100 TB stance):
- Hash-bucket sampling is a pure map-side filter — no shuffle, no RNG
  state, and the SAME rows are selected on every engine/run/cluster
  (md5-derived bucket), which is what an incremental corpus pipeline
  needs (re-runs must not churn the sample). `df.sample()` is
  partition-order-dependent; this is the reproducible alternative.
- stack()/unpivot multiplies rows map-side BEFORE the aggregate's
  partial combine — no wide shuffle of the unpivoted form.
- GROUPING SETS computes all three granularities in one pass over the
  scan (Catalyst expands then shares the Exchange).
- Higher-order array ops run inside codegen over the array values —
  zero per-element Python, zero explode-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.hashing import (
    md5_hash64,
    md5_hash64_sql,
)
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table


def _dec(col, scale: int = 4):
    return col.cast(f"decimal(18,{scale})")


_DOC_HASH_SQL = md5_hash64_sql("cast(doc_id AS VARCHAR)")


@register(
    "ns_sample_hash_bucket",
    sql=f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE ({_DOC_HASH_SQL} % 100) < 10
""",
)
def ns_sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% corpus sample: bucket = md5(doc_id) mod 100.
    Unlike df.sample() (partition-order-dependent RNG), the selection
    is a pure function of the row key — identical across engines,
    re-runs, and cluster layouts, so downstream incremental jobs see a
    stable subset."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_hash64(F.col("doc_id").cast("string")) % 100
    return docs.filter(bucket < 10).select("doc_id", "lang", "source", "n_chars")


@register(
    "ns_sample_stratified",
    sql=f"""
SELECT lang, count(*) AS n_sampled, round(avg(n_chars), 6) AS avg_chars
FROM documents
WHERE ({_DOC_HASH_SQL} % 1000) < (CASE WHEN lang = 'en' THEN 50 ELSE 200 END)
GROUP BY lang
""",
)
def ns_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling — per-stratum rates (downsample
    the dominant language, keep more of the tail), the standard corpus
    rebalancing move. Same hash-bucket mechanism, rate chosen per row by
    the stratum column; still a map-side filter."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_hash64(F.col("doc_id").cast("string")) % 1000
    rate = F.when(F.col("lang") == "en", 50).otherwise(200)
    return (
        docs.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


@register(
    "unpivot_measures",
    sql="""
SELECT measure, CAST(sum(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total,
       round(avg(val), 6) AS avg_val
FROM (
  SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'discount', l_discount FROM lineitem
  UNION ALL SELECT 'tax', l_tax FROM lineitem
) GROUP BY measure
""",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via stack() (the inverse of A1's pivot), then a
    per-measure aggregate. stack expands rows inside the scan stage;
    the partial agg combines before the single narrow shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
        " 'discount', l_discount, 'tax', l_tax) AS (measure, val)"
    )
    return long.groupBy("measure").agg(
        F.sum(_dec(F.col("val"))).cast("double").alias("total"),
        F.round(F.avg("val"), 6).alias("avg_val"),
    )


@register(
    "grouping_sets_revenue",
    sql="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube,
    which `rollup_returns`/`cube_orders` already exercise) through the
    spark.sql surface — all three granularities share one scan and one
    expanded aggregate."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "window_rank_breadth",
    sql="""
SELECT o_custkey, o_orderkey,
       ntile(4) OVER w AS nt,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd,
       dense_rank() OVER w AS dr,
       first_value(o_totalprice) OVER w AS fv
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def window_rank_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function breadth — ntile / percent_rank / cume_dist /
    dense_rank / first_value over one window spec (one exchange on
    o_custkey, one sort, all five functions evaluated in a single
    Window operator). Order key includes o_orderkey so ranks are
    deterministic under ties."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("nt"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.dense_rank().over(w).alias("dr"),
        F.first("o_totalprice").over(w).alias("fv"),
    )


@register(
    "higher_order_array_ops",
    sql="""
SELECT vec_id,
       len(embedding) AS dim,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
       round(list_sum(list_transform(list_slice(embedding, 1, 8),
             x -> CAST(x AS DOUBLE))), 6) AS head8_sum
FROM embeddings
""",
)
def higher_order_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform / filter / aggregate /
    slice composed over the embedding column, entirely inside codegen
    (no explode, no Python). The same primitives the ANN/dedup queries
    build on, exercised as a first-class surface."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)), 6
        ).alias("l2_norm"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("head8_sum"),
    )
