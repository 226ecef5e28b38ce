"""Round-2 batch 29 (this run): NPS-style score buckets and two-way
ANOVA with interaction.

ANOVA sums of squares quantize each squared-deviation term to micro
units per CELL (exact integer means via milli-quantization first), so
all cross-cell reductions are int64 (SCALE.md §13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# NPS-style promoter/passive/detractor split
# ---------------------------------------------------------------------------

_NPS_SQL = f"""
WITH s AS (
  SELECT event_type,
         CASE WHEN value >= 200 THEN 1 ELSE 0 END AS promoter,
         CASE WHEN value < 50 THEN 1 ELSE 0 END AS detractor
  FROM events
),
g AS (
  SELECT event_type, count(*) AS n,
         sum(promoter) AS p, sum(detractor) AS d
  FROM s GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(p AS BIGINT) AS promoters,
       CAST(n - p - d AS BIGINT) AS passives,
       CAST(d AS BIGINT) AS detractors,
       CAST(((p - d) * 1000000) // n AS BIGINT) AS nps_micro,
       {round6_sql("CAST(p - d AS DOUBLE) / n * 100.0")} AS nps_score
FROM g
"""


@register("nps_score_by_type", _NPS_SQL)
def nps_score_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NPS-style net score per event type — promoters (value ≥ 200)
    minus detractors (< 50) over total, the BI scorecard pattern whose
    net share is computed BOTH as an exact integer micro-share
    ((p−d)·10⁶ // n) and the conventional −100..100 double. One
    conditional-sum scan; the class boundaries are integer-cent
    comparisons (values have 2 dp, so the 200.00/50.00 edges are
    exact)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        (F.col("value") >= 200).cast("int").alias("promoter"),
        (F.col("value") < 50).cast("int").alias("detractor"),
    )
    g = s.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("promoter").alias("p"),
        F.sum("detractor").alias("d"),
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("p").cast("long").alias("promoters"),
        (F.col("n") - F.col("p") - F.col("d")).cast("long").alias("passives"),
        F.col("d").cast("long").alias("detractors"),
        F.expr("((p - d) * 1000000) div n").cast("long").alias("nps_micro"),
        round6((F.col("p") - F.col("d")).cast("double") / F.col("n") * 100.0).alias(
            "nps_score"
        ),
    )


# ---------------------------------------------------------------------------
# two-way ANOVA with interaction: weekend × daypart on value
# ---------------------------------------------------------------------------

_ANOVA2_SQL = f"""
WITH v AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS a,
         CASE WHEN hour(ts) < 12 THEN 0 ELSE 1 END AS b,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
cell AS (
  SELECT a, b, count(*) AS n, sum(x) AS s,
         (sum(x) * 1000) // count(*) AS m_milli
  FROM v GROUP BY a, b
),
ma AS (SELECT a, (sum(s) * 1000) // sum(n) AS m_milli, sum(n) AS n FROM cell GROUP BY a),
mb AS (SELECT b, (sum(s) * 1000) // sum(n) AS m_milli, sum(n) AS n FROM cell GROUP BY b),
g AS (SELECT (sum(s) * 1000) // sum(n) AS m_milli, sum(n) AS n FROM cell),
ssa AS (
  SELECT sum(ma.n * ((ma.m_milli - g.m_milli) * (ma.m_milli - g.m_milli)) // 1000000)
           AS ss
  FROM ma CROSS JOIN g
),
ssb AS (
  SELECT sum(mb.n * ((mb.m_milli - g.m_milli) * (mb.m_milli - g.m_milli)) // 1000000)
           AS ss
  FROM mb CROSS JOIN g
),
ssab AS (
  SELECT sum(c.n * ((c.m_milli - ma.m_milli - mb.m_milli + g.m_milli)
                    * (c.m_milli - ma.m_milli - mb.m_milli + g.m_milli)) // 1000000)
           AS ss
  FROM cell c JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN g
)
SELECT CAST(g.n AS BIGINT) AS n,
       CAST(ssa.ss AS BIGINT) AS ss_weekend_cents2,
       CAST(ssb.ss AS BIGINT) AS ss_daypart_cents2,
       CAST(ssab.ss AS BIGINT) AS ss_interaction_cents2,
       {round6_sql("CAST(ssab.ss AS DOUBLE) / (ssa.ss + ssb.ss + ssab.ss)")}
         AS interaction_share
FROM g CROSS JOIN ssa CROSS JOIN ssb CROSS JOIN ssab
"""


@register("anova_twoway_interaction", _ANOVA2_SQL)
def anova_twoway_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA decomposition — weekend × daypart effects on
    event value with the INTERACTION term (does the weekend effect
    differ by time of day?), extending anova_oneway_hours to factorial
    designs. All means quantize to milli-cents by true integer
    division FIRST; each sum-of-squares term is then an integer
    product scaled back by //10⁶, so SS_A, SS_B, and SS_AB are exact
    int64 and only the final interaction share divides as a double
    (n·dev² ≈ 5·10¹⁶ at sf0.1; ANSI mode faults loudly rather than
    wrapping if a larger deployment needs the DECIMAL widening). One
    cell agg (4 cells) feeds margins and the grand mean — no second
    data pass."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.dayofweek("ts").isin(1, 7).cast("int").alias("a"),
        (F.hour("ts") >= 12).cast("int").alias("b"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("x"),
    )
    cell = v.groupBy("a", "b").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.expr("(sum(x) * 1000) div count(*)").alias("m_milli"),
    )
    cell = cell.localCheckpoint(eager=True)
    ma = cell.groupBy("a").agg(
        F.expr("(sum(s) * 1000) div sum(n)").alias("ma_milli"), F.sum("n").alias("na")
    )
    mb = cell.groupBy("b").agg(
        F.expr("(sum(s) * 1000) div sum(n)").alias("mb_milli"), F.sum("n").alias("nb")
    )
    g = cell.agg(
        F.expr("(sum(s) * 1000) div sum(n)").alias("g_milli"), F.sum("n").alias("n_tot")
    )
    ssa = (
        ma.crossJoin(F.broadcast(g))
        .select(F.expr("na * ((ma_milli - g_milli) * (ma_milli - g_milli)) div 1000000").alias("t"))
        .agg(F.sum("t").alias("ssa"))
    )
    ssb = (
        mb.crossJoin(F.broadcast(g))
        .select(F.expr("nb * ((mb_milli - g_milli) * (mb_milli - g_milli)) div 1000000").alias("t"))
        .agg(F.sum("t").alias("ssb"))
    )
    ssab = (
        cell.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(g))
        .select(
            F.expr(
                "n * ((m_milli - ma_milli - mb_milli + g_milli)"
                " * (m_milli - ma_milli - mb_milli + g_milli)) div 1000000"
            ).alias("t")
        )
        .agg(F.sum("t").alias("ssab"))
    )
    out = (
        g.crossJoin(F.broadcast(ssa)).crossJoin(F.broadcast(ssb)).crossJoin(F.broadcast(ssab))
    )
    return out.select(
        F.col("n_tot").cast("long").alias("n"),
        F.col("ssa").cast("long").alias("ss_weekend_cents2"),
        F.col("ssb").cast("long").alias("ss_daypart_cents2"),
        F.col("ssab").cast("long").alias("ss_interaction_cents2"),
        round6(
            F.col("ssab").cast("double")
            / (F.col("ssa") + F.col("ssb") + F.col("ssab"))
        ).alias("interaction_share"),
    )
