"""Round-2 batch 17 (this run): search-result snippet extraction and
ABC/XYZ demand-variability classification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# search snippet extraction around the first hit
# ---------------------------------------------------------------------------

_SNIP_TERM = "data"
_SNIP_RADIUS = 30

_SNIP_SQL = f"""
WITH hits AS (
  SELECT doc_id, strpos(lower(text), '{_SNIP_TERM}') AS pos, text
  FROM documents WHERE strpos(lower(text), '{_SNIP_TERM}') > 0
)
SELECT doc_id,
       CAST(pos AS BIGINT) AS hit_pos,
       substr(text, CASE WHEN pos - {_SNIP_RADIUS} > 1 THEN pos - {_SNIP_RADIUS} ELSE 1 END,
              {2 * _SNIP_RADIUS} + len('{_SNIP_TERM}')) AS snippet,
       CAST(len(text) AS BIGINT) AS doc_len
FROM hits
"""


@register("search_snippet_extract", _SNIP_SQL)
def search_snippet_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-result snippet extraction: for every document containing
    the query term, the 1-based position of the FIRST occurrence
    (case-folded) and a ±30-character window around it — the
    result-page rendering step downstream of keyword_search_* (those
    rank; this displays). Pure string expressions (instr/substr) in
    the scan stage, no shuffle; at 100 TB snippets materialize only
    for the paginated top-k, same expressions."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pos = F.instr(F.lower("text"), _SNIP_TERM)
    hits = docs.select("doc_id", pos.alias("pos"), "text").filter(F.col("pos") > 0)
    start = F.when(F.col("pos") - _SNIP_RADIUS > 1, F.col("pos") - _SNIP_RADIUS).otherwise(
        F.lit(1)
    )
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("hit_pos"),
        F.substring(F.col("text"), start, 2 * _SNIP_RADIUS + len(_SNIP_TERM)).alias(
            "snippet"
        ),
        F.length("text").cast("long").alias("doc_len"),
    )


# ---------------------------------------------------------------------------
# ABC/XYZ classification: value share × demand variability
# ---------------------------------------------------------------------------

_XYZ_SQL = f"""
WITH monthly AS (
  SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
         sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem GROUP BY l_partkey, strftime(l_shipdate, '%Y-%m')
),
m AS (
  SELECT l_partkey, count(*) AS n, sum(qty) AS s, sum(qty * qty) AS q
  FROM monthly GROUP BY l_partkey
),
cv AS (
  SELECT l_partkey, n, s,
         CASE WHEN n < 2 OR s = 0 THEN NULL
              ELSE sqrt((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s) / (n - 1))
                   * n / (CAST(s AS DOUBLE) * sqrt(CAST(n AS DOUBLE)))
         END AS cv
  FROM m
),
cls AS (
  SELECT CASE WHEN cv IS NULL THEN 'Z'
              WHEN cv < 0.5 THEN 'X'
              WHEN cv < 1.0 THEN 'Y'
              ELSE 'Z' END AS xyz,
         s, cv
  FROM cv
)
SELECT xyz,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(s) AS BIGINT) AS total_qty,
       {round6_sql("avg(CASE WHEN cv IS NOT NULL THEN "
                   "sign(cv) * floor(abs(cv) * 1e6 + 0.5) / 1e6 END)")} AS mean_cv
FROM cls GROUP BY xyz
"""


@register("xyz_variability_classes", _XYZ_SQL)
def xyz_variability_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification — each part's monthly
    demand coefficient of variation (sample σ/μ from exact int64
    moments) buckets it X (<0.5, steady), Y (<1.0), or Z (volatile /
    insufficient history), the planning-policy dimension that crosses
    abc_pareto_classification's value dimension. The CV threshold
    comparison happens on the raw double (same expression both
    engines); per-part CVs are round6-quantized BEFORE the class mean
    so the only order-sensitive reduction averages 6-dp grid values
    whose sum is stable at this scale. Aggregate-first: months per
    part, then one 4-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey", F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    m = monthly.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum("qty").alias("s"),
        F.sum(F.col("qty") * F.col("qty")).alias("q"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    cv_expr = (
        F.sqrt((nd * F.col("q") - sd * F.col("s")) / (F.col("n") - 1))
        * F.col("n")
        / (sd * F.sqrt(nd))
    )
    cv = m.select(
        "n",
        "s",
        F.when((F.col("n") < 2) | (F.col("s") == 0), F.lit(None)).otherwise(cv_expr).alias(
            "cv"
        ),
    )
    cls = cv.select(
        F.when(F.col("cv").isNull(), "Z")
        .when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
        "s",
        "cv",
    )
    return cls.groupBy("xyz").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("s").cast("long").alias("total_qty"),
        round6(F.avg(round6(F.col("cv")))).alias("mean_cv"),
    )
