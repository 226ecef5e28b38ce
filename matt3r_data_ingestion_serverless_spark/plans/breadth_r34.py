"""Round-2 batch 9 (this run): Cramér's V effect size, monetary-unit
audit sampling, and the two-sample Kolmogorov–Smirnov test.

Chi-squared cell contributions and KS gaps are quantized/cross-
multiplied to integers before any cross-row reduction (SCALE.md §13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Cramér's V for event_type × day-of-week
# ---------------------------------------------------------------------------

_CRAMER_SQL = f"""
WITH cell AS (
  SELECT event_type, dayofweek(ts) AS dow, count(*) AS o
  FROM events GROUP BY event_type, dayofweek(ts)
),
mx AS (SELECT event_type, sum(o) AS rx FROM cell GROUP BY event_type),
my AS (SELECT dow, sum(o) AS cy FROM cell GROUP BY dow),
tot AS (SELECT sum(o) AS n, count(DISTINCT event_type) AS r,
               count(DISTINCT dow) AS c
        FROM cell),
q AS (
  SELECT CAST(floor(
           (CAST(cell.o AS DOUBLE) * tot.n - CAST(mx.rx AS DOUBLE) * my.cy)
           * (CAST(cell.o AS DOUBLE) * tot.n - CAST(mx.rx AS DOUBLE) * my.cy)
           / (CAST(mx.rx AS DOUBLE) * my.cy * tot.n) * 1e6 + 0.5) AS BIGINT)
           AS chi_micro
  FROM cell JOIN mx USING (event_type) JOIN my USING (dow) CROSS JOIN tot
)
SELECT CAST(max(tot.n) AS BIGINT) AS n,
       CAST(max(tot.r) AS BIGINT) AS n_rows,
       CAST(max(tot.c) AS BIGINT) AS n_cols,
       CAST(sum(chi_micro) AS BIGINT) AS chi2_micro,
       {round6_sql(
           "sqrt(CAST(sum(chi_micro) AS DOUBLE) / 1e6"
           " / (max(tot.n) * (least(max(tot.r), max(tot.c)) - 1)))"
       )} AS cramers_v
FROM q CROSS JOIN tot
GROUP BY tot.n, tot.r, tot.c
"""


@register("cramers_v_type_dow", _CRAMER_SQL)
def cramers_v_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the normalized effect size for the event-type ×
    day-of-week association that chisq_type_by_dow tests: V =
    √(χ²/(n·(min(r,c)−1))) ∈ [0,1], the number analysts actually
    compare across tables. Each cell's χ² contribution (O−E)²/E is
    evaluated in the cross-multiplied form ((O·n − rx·cy)²/(rx·cy·n))
    and quantized to micro-units per cell, so the only cross-row sum
    is int64 and V is one closed form. Margins derive from the cell
    grid (7×5 rows) — no second data pass."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy("event_type", F.dayofweek("ts").alias("dow")).agg(
        F.count("*").alias("o")
    )
    cell.cache()
    mx = cell.groupBy("event_type").agg(F.sum("o").alias("rx"))
    my = cell.groupBy("dow").agg(F.sum("o").alias("cy"))
    tot = cell.agg(
        F.sum("o").alias("n"),
        F.count_distinct("event_type").alias("r"),
        F.count_distinct("dow").alias("c"),
    )
    g = (
        cell.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "dow")
        .crossJoin(F.broadcast(tot))
    )
    num = F.col("o").cast("double") * F.col("n") - F.col("rx").cast("double") * F.col("cy")
    chi_micro = F.floor(
        num * num / (F.col("rx").cast("double") * F.col("cy") * F.col("n")) * 1e6 + 0.5
    ).cast("long")
    q = g.select(chi_micro.alias("chi_micro"), "n", "r", "c")
    agg = q.groupBy("n", "r", "c").agg(F.sum("chi_micro").alias("chi2_micro"))
    v = F.sqrt(
        F.col("chi2_micro").cast("double")
        / 1e6
        / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("n_rows"),
        F.col("c").cast("long").alias("n_cols"),
        F.col("chi2_micro").cast("long").alias("chi2_micro"),
        round6(v).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# monetary-unit (dollar-unit) audit sampling
# ---------------------------------------------------------------------------

_MUS_INTERVAL = 50_000_000  # every 500,000.00 of cumulative value

_MUS_SQL = f"""
WITH o AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
c AS (
  SELECT o_orderkey, cents,
         sum(cents) OVER (ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM o
)
SELECT o_orderkey, CAST(cents AS BIGINT) AS cents,
       CAST(cum AS BIGINT) AS cum_cents,
       CAST(cum // {_MUS_INTERVAL} - (cum - cents) // {_MUS_INTERVAL} AS BIGINT)
         AS n_hits
FROM c
WHERE cum // {_MUS_INTERVAL} > (cum - cents) // {_MUS_INTERVAL}
"""


@register("monetary_unit_sampling", _MUS_SQL)
def monetary_unit_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-unit sampling (MUS / dollar-unit sampling) — the audit
    standard where selection probability is proportional to value: a
    record is sampled iff the cumulative total crosses a multiple of
    the sampling interval inside it (large items can absorb several
    hits — n_hits reports how many). Pure integer arithmetic on the
    running cents total: the selection predicate is two integer
    divisions, so the sample is identical everywhere. The cumulative
    window orders on the (already unique) order key; at 100 TB the
    same plan runs per-stratum (hash prefix) with per-stratum
    intervals, keeping the prefix sum distributed."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents")
    )
    cum = F.sum("cents").over(
        Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = o.select("o_orderkey", "cents", cum.alias("cum"))
    hits = F.expr(f"cum div {_MUS_INTERVAL} - (cum - cents) div {_MUS_INTERVAL}")
    return c.filter(
        F.expr(f"cum div {_MUS_INTERVAL} > (cum - cents) div {_MUS_INTERVAL}")
    ).select(
        "o_orderkey",
        F.col("cents").cast("long").alias("cents"),
        F.col("cum").cast("long").alias("cum_cents"),
        hits.cast("long").alias("n_hits"),
    )


# ---------------------------------------------------------------------------
# two-sample Kolmogorov–Smirnov: purchase vs click value distributions
# ---------------------------------------------------------------------------

_KS2_SQL = """
WITH v AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'click')
),
pts AS (
  SELECT cents,
         sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c2
  FROM v GROUP BY cents
),
e AS (
  SELECT cents,
         sum(c1) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
         sum(c2) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2,
         sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
  FROM pts
),
d AS (SELECT cents, n1, n2, abs(f1 * n2 - f2 * n1) AS num FROM e),
mx AS (SELECT max(num) AS mnum, max(n1) AS n1, max(n2) AS n2 FROM d)
SELECT CAST(m.n1 AS BIGINT) AS n_purchase,
       CAST(m.n2 AS BIGINT) AS n_click,
       CAST(max(d.cents) AS BIGINT) AS d_at_cents,
       CAST(sign(m.mnum) * floor(abs(CAST(m.mnum AS DOUBLE)
            / (CAST(m.n1 AS DOUBLE) * m.n2)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS d_stat
FROM mx m JOIN d ON d.num = m.mnum
GROUP BY m.n1, m.n2, m.mnum
"""


@register("ks_two_sample_types", _KS2_SQL)
def ks_two_sample_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the purchase and
    click value distributions — the distribution-free are-these-the-
    same-population test (the A/B twin of ks_uniform_test). Both ECDFs
    ride ONE cumulative window over the merged distinct-cents grid
    (per-value counts for each side in the same row), and the sup gap
    |F1−F2| is cross-multiplied to |f1·n2 − f2·n1| — an exact int64 —
    so the argmax, its tie-broken location, and the final single
    division are engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        (F.col("event_type") == "purchase").cast("int").alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    pts = v.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c2"),
    )
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    e = pts.select(
        "cents",
        F.sum("c1").over(wcum).alias("f1"),
        F.sum("c2").over(wcum).alias("f2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    d = e.select(
        "cents",
        "n1",
        "n2",
        F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")).alias("num"),
    )
    mx = d.groupBy().agg(F.max("num").alias("mnum"), F.max("n1").alias("m1"), F.max("n2").alias("m2"))
    joined = d.join(F.broadcast(mx), d.num == mx.mnum)
    dstat = round6(
        F.col("mnum").cast("double") / (F.col("m1").cast("double") * F.col("m2"))
    )
    return joined.groupBy("m1", "m2", "mnum").agg(
        F.max("cents").alias("d_at_cents")
    ).select(
        F.col("m1").cast("long").alias("n_purchase"),
        F.col("m2").cast("long").alias("n_click"),
        F.col("d_at_cents").cast("long").alias("d_at_cents"),
        dstat.alias("d_stat"),
    )
