"""Round-2 batch 24 (this run): Cohen's kappa inter-rater agreement
and Lorenz-curve deciles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Cohen's kappa between two deterministic raters
# ---------------------------------------------------------------------------

_KAPPA_SQL = f"""
WITH r AS (
  SELECT CASE WHEN value > 100 THEN 1 ELSE 0 END AS r1,
         CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS r2
  FROM events
),
cells AS (
  SELECT count(*) AS n,
         sum(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END) AS b,
         sum(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END) AS d
  FROM r
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(a AS BIGINT) AS both_pos, CAST(d AS BIGINT) AS both_neg,
       CAST(b + c AS BIGINT) AS disagreements,
       {round6_sql("CAST(a + d AS DOUBLE) / n")} AS p_observed,
       {round6_sql(
           "(CAST(a + b AS DOUBLE) * (a + c) + CAST(c + d AS DOUBLE) * (b + d))"
           " / (CAST(n AS DOUBLE) * n)"
       )} AS p_expected,
       {round6_sql(
           "(CAST(a + d AS DOUBLE) / n"
           " - (CAST(a + b AS DOUBLE) * (a + c) + CAST(c + d AS DOUBLE) * (b + d))"
           "   / (CAST(n AS DOUBLE) * n))"
           " / (1.0 - (CAST(a + b AS DOUBLE) * (a + c) + CAST(c + d AS DOUBLE) * (b + d))"
           "   / (CAST(n AS DOUBLE) * n))"
       )} AS kappa
FROM cells
"""


@register("cohens_kappa_raters", _KAPPA_SQL)
def cohens_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two binary
    raters (here two deterministic labeling rules: high-value and
    conversion-type), the inter-annotator reliability statistic that
    complements ns_crowd_label_majority's vote aggregation and
    ns_langid_confusion's accuracy matrix. The 2×2 table is exact
    int64 from one conditional-sum scan; p_o, p_e, and κ = (p_o −
    p_e)/(1 − p_e) are single double expressions over those
    integers."""
    ev = load_table(spark, sf_dir, "events")
    r1 = (F.col("value") > 100).cast("int")
    r2 = F.col("event_type").isin("purchase", "signup").cast("int")
    cells = ev.select(r1.alias("r1"), r2.alias("r2")).agg(
        F.count("*").alias("n"),
        F.sum(((F.col("r1") == 1) & (F.col("r2") == 1)).cast("int")).alias("a"),
        F.sum(((F.col("r1") == 1) & (F.col("r2") == 0)).cast("int")).alias("b"),
        F.sum(((F.col("r1") == 0) & (F.col("r2") == 1)).cast("int")).alias("c"),
        F.sum(((F.col("r1") == 0) & (F.col("r2") == 0)).cast("int")).alias("d"),
    )
    n = F.col("n").cast("double")
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    c, d = F.col("c").cast("double"), F.col("d").cast("double")
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    return cells.select(
        F.col("n").cast("long").alias("n"),
        F.col("a").cast("long").alias("both_pos"),
        F.col("d").cast("long").alias("both_neg"),
        (F.col("b") + F.col("c")).cast("long").alias("disagreements"),
        round6(po).alias("p_observed"),
        round6(pe).alias("p_expected"),
        round6((po - pe) / (1.0 - pe)).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve deciles of supplier revenue
# ---------------------------------------------------------------------------

_LORENZ_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
           AS cents
  FROM lineitem GROUP BY l_suppkey
),
r AS (
  SELECT cents,
         ntile(10) OVER (ORDER BY cents, l_suppkey) AS decile,
         sum(cents) OVER () AS total
  FROM rev
),
d AS (
  SELECT decile, count(*) AS n_suppliers, sum(cents) AS decile_cents, max(total) AS total
  FROM r GROUP BY decile
)
SELECT decile,
       CAST(n_suppliers AS BIGINT) AS n_suppliers,
       CAST(decile_cents AS BIGINT) AS decile_cents,
       CAST((sum(decile_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000) // total
            AS BIGINT) AS cum_share_micro
FROM d
"""


@register("lorenz_curve_deciles", _LORENZ_SQL)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve data points: suppliers sorted by revenue into
    deciles, with each decile's revenue mass and the cumulative share
    in integer micro-units by TRUE integer division — the plot behind
    udaf_gini_by_type's scalar and hhi_concentration's index (a
    perfectly equal market has cum share = decile/10). ntile edges are
    total-ordered on (cents, suppkey); the 10-row cumulative pass is
    the only ordered step after the per-supplier rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast(
                "long"
            )
        ).alias("cents")
    )
    r = rev.select(
        "cents",
        F.ntile(10).over(Window.orderBy("cents", "l_suppkey")).alias("decile"),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
    )
    d = r.groupBy("decile").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("cents").alias("decile_cents"),
        F.max("total").alias("total"),
    )
    cum = F.sum("decile_cents").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # cum x 1e6 overflows int64 at sf1 (total ~3e13 cents -> 3e19 —
    # caught by the r08 sf1 sweep as ARITHMETIC_OVERFLOW); accumulate
    # the share numerator in decimal(38,0) and take the exact floor
    # quotient via the pmod identity (same discipline as
    # zorder._scale_exact / spearman's HUGEINT moments)
    return d.select(
        "decile",
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        F.col("decile_cents").cast("long").alias("decile_cents"),
        (cum.cast("decimal(38,0)") * 1000000).alias("_num"),
        F.col("total").cast("decimal(38,0)").alias("_tot"),
    ).select(
        "decile",
        "n_suppliers",
        "decile_cents",
        ((F.col("_num") - F.pmod("_num", F.col("_tot"))) / F.col("_tot"))
        .cast("long")
        .alias("cum_share_micro"),
    )
