"""Round-2 batch 30 (this run): average precision (PR-AUC) and the
lift/gains decile table — both in pure integer rank arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# shared deterministic scorer: logistic of value, quantized to micro
_SCORE_SQL = (
    "CAST(floor(1.0 / (1.0 + exp(-(value - 50.0) / 25.0)) * 1e6 + 0.5) AS BIGINT)"
)

# ---------------------------------------------------------------------------
# average precision (area under the precision-recall curve)
# ---------------------------------------------------------------------------

_AP_SQL = f"""
WITH s AS (
  SELECT event_id, {_SCORE_SQL} AS score_micro,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
),
r AS (
  SELECT pos,
         row_number() OVER (ORDER BY score_micro DESC, event_id) AS k,
         sum(pos) OVER (ORDER BY score_micro DESC, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
  FROM s
),
t AS (SELECT sum(pos) AS n_pos, count(*) AS n FROM r)
SELECT CAST(t.n AS BIGINT) AS n,
       CAST(t.n_pos AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN r.pos = 1 THEN (r.tp * 1000000) // r.k ELSE 0 END) AS BIGINT)
         AS ap_micro_sum,
       {round6_sql(
           "CAST(sum(CASE WHEN r.pos = 1 THEN (r.tp * 1000000) // r.k ELSE 0 END)"
           " AS DOUBLE) / t.n_pos / 1e6"
       )} AS average_precision
FROM r CROSS JOIN t
GROUP BY t.n, t.n_pos
"""


@register("ml_average_precision", _AP_SQL)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the area under the precision–recall curve)
    of the deterministic logistic scorer predicting purchases — the
    imbalance-robust companion to binary_auc_rank's ROC-AUC: AP =
    (1/P)·Σ_{hits k} precision@k. Precision at each hit quantizes by
    TRUE integer division (tp·10⁶ // k), so the sum is int64 and one
    final division yields AP — no float precision curve. The ranking
    is one global window over the micro-quantized scores with id
    tie-breaks (ties carry the same score but distinct ranks — the
    standard list-wise AP definition)."""
    ev = load_table(spark, sf_dir, "events")
    score = F.floor(1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 25.0)) * 1e6 + 0.5).cast(
        "long"
    )
    s = ev.select(
        "event_id",
        score.alias("score_micro"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    w = Window.orderBy(F.desc("score_micro"), F.asc("event_id"))
    r = s.select(
        "pos",
        F.row_number().over(w).alias("k"),
        F.sum("pos")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("tp"),
    )
    t = r.agg(F.sum("pos").alias("n_pos"), F.count("*").alias("n"))
    j = r.crossJoin(F.broadcast(t))
    term = F.when(F.col("pos") == 1, F.expr("(tp * 1000000) div k")).otherwise(0)
    agg = j.groupBy("n", "n_pos").agg(F.sum(term).alias("ap_sum"))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("ap_sum").cast("long").alias("ap_micro_sum"),
        round6(F.col("ap_sum").cast("double") / F.col("n_pos") / 1e6).alias(
            "average_precision"
        ),
    )


# ---------------------------------------------------------------------------
# lift and cumulative gains by score decile
# ---------------------------------------------------------------------------

_LIFT_SQL = f"""
WITH s AS (
  SELECT event_id, {_SCORE_SQL} AS score_micro,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
),
d AS (
  SELECT pos, ntile(10) OVER (ORDER BY score_micro DESC, event_id) AS decile
  FROM s
),
g AS (SELECT decile, count(*) AS n, sum(pos) AS p FROM d GROUP BY decile),
t AS (SELECT sum(n) AS n_tot, sum(p) AS p_tot FROM g)
SELECT g.decile,
       CAST(g.n AS BIGINT) AS n,
       CAST(g.p AS BIGINT) AS n_pos,
       CAST((g.p * t.n_tot * 1000) // (g.n * t.p_tot) AS BIGINT) AS lift_milli,
       CAST((sum(g.p) OVER (ORDER BY g.decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000) // t.p_tot
            AS BIGINT) AS cum_gain_micro
FROM g CROSS JOIN t
"""


@register("ml_lift_gains_table", _LIFT_SQL)
def ml_lift_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift and cumulative-gains table by score decile — the campaign-
    targeting readout (top decile's lift over base rate; what share of
    all positives the top-k deciles capture), completing the model-
    eval suite beside AUC, AP, calibration, and ECE. Decile edges are
    ntile over the micro-quantized score with id tie-breaks; lift is
    the cross-multiplied integer rational (p·N·10³)//(n·P) and gains
    the integer cumulative share — no float rates anywhere. One
    ranking window + a 10-row rollup."""
    ev = load_table(spark, sf_dir, "events")
    score = F.floor(1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 25.0)) * 1e6 + 0.5).cast(
        "long"
    )
    s = ev.select(
        "event_id",
        score.alias("score_micro"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    d = s.select(
        "pos",
        F.ntile(10).over(Window.orderBy(F.desc("score_micro"), F.asc("event_id"))).alias(
            "decile"
        ),
    )
    g = d.groupBy("decile").agg(F.count("*").alias("n"), F.sum("pos").alias("p"))
    t = g.agg(F.sum("n").alias("n_tot"), F.sum("p").alias("p_tot"))
    j = g.crossJoin(F.broadcast(t))
    cum = F.sum("p").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "decile",
        F.col("n").cast("long").alias("n"),
        F.col("p").cast("long").alias("n_pos"),
        F.expr("(p * n_tot * 1000) div (n * p_tot)").cast("long").alias("lift_milli"),
        (cum * 1000000).alias("_cnum"),
        "p_tot",
    ).select(
        "decile",
        "n",
        "n_pos",
        "lift_milli",
        F.expr("_cnum div p_tot").cast("long").alias("cum_gain_micro"),
    )
