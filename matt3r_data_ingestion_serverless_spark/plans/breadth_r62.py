"""Round-2 batch 37 (this run): discount-band revenue curve and a
lognormal fit of document token lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# discount-band revenue/quantity curve
# ---------------------------------------------------------------------------

_BAND_SQL = f"""
WITH b AS (
  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS discount_pct,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS gross,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS net
  FROM lineitem
)
SELECT discount_pct,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(qty) AS BIGINT) AS total_qty,
       CAST(sum(gross) AS BIGINT) AS gross_cents,
       CAST(sum(net) AS BIGINT) AS net_cents,
       CAST((sum(qty) * 1000) // count(*) AS BIGINT) AS qty_per_line_milli,
       {round6_sql("CAST(sum(net) AS DOUBLE) / sum(gross)")} AS realization_rate
FROM b GROUP BY discount_pct
"""


@register("discount_band_curve", _BAND_SQL)
def discount_band_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The discount-response curve: per discount percentage band, line
    count, quantity, gross vs net revenue, quantity-per-line (the
    crude demand signal a pricing team reads for elasticity), and the
    realization rate — q19_disjunctive_revenue's predicate turned into
    the full band-by-band profile. Discount percentages land on exact
    integer points (2-dp discounts × 100); all masses are integer
    cents with one double ratio at the end. One partial-aggregated
    scan over ~12 groups."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("discount_pct"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("gross"),
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
        .cast("long")
        .alias("net"),
    )
    return b.groupBy("discount_pct").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.sum("gross").cast("long").alias("gross_cents"),
        F.sum("net").cast("long").alias("net_cents"),
        F.expr("(sum(qty) * 1000) div count(*)").cast("long").alias("qty_per_line_milli"),
        round6(F.sum("net").cast("double") / F.sum("gross")).alias("realization_rate"),
    )


# ---------------------------------------------------------------------------
# lognormal fit of document token lengths
# ---------------------------------------------------------------------------

_LOGNORM_SQL = f"""
WITH d AS (
  SELECT len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
  FROM documents
),
q AS (
  SELECT CAST(floor(ln(CAST(n_tok AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS ln_micro
  FROM d WHERE n_tok > 0
),
m AS (SELECT count(*) AS n, sum(ln_micro) AS s1, sum(ln_micro * ln_micro) AS s2 FROM q)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(s1 AS BIGINT) AS sum_ln_micro,
       {round6_sql("CAST(s1 AS DOUBLE) / n / 1e6")} AS mu,
       {round6_sql(
           "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)"
           " / (n - 1)) / 1e6"
       )} AS sigma,
       {round6_sql("exp(CAST(s1 AS DOUBLE) / n / 1e6)")} AS geometric_mean_tokens
FROM m
"""


@register("ns_doc_length_lognormal_fit", _LOGNORM_SQL)
def ns_doc_length_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal MLE fit of the document token-length distribution —
    (μ, σ) of ln(length), the two numbers a corpus datasheet reports
    (web text lengths are canonically lognormal; a bad σ flags
    truncation or concatenation artifacts — the parametric companion
    to ns_vocab_stats and the chunk planners). Per-document logs
    quantize to micro-units, so n, Σln, Σln² are exact int64 and μ, σ,
    and the geometric mean are closed forms over those integers. One
    scan-stage tokenize + a 1-row agg."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    q = docs.select(n_tok.alias("n_tok")).filter(F.col("n_tok") > 0).select(
        F.floor(F.log(F.col("n_tok").cast("double")) * 1e6 + 0.5).cast("long").alias(
            "ln_micro"
        )
    )
    m = q.agg(
        F.count("*").alias("n"),
        F.sum("ln_micro").alias("s1"),
        F.sum(F.col("ln_micro") * F.col("ln_micro")).alias("s2"),
    )
    n = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("s1").cast("long").alias("sum_ln_micro"),
        round6(s1 / n / 1e6).alias("mu"),
        round6(F.sqrt((s2 - s1 * s1 / n) / (n - 1)) / 1e6).alias("sigma"),
        round6(F.exp(s1 / n / 1e6)).alias("geometric_mean_tokens"),
    )
