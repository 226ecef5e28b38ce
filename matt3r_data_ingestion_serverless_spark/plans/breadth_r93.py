"""Round-4 batch 21: CART root split, exact 1-D kNN regression, and a
sample-ratio-mismatch guardrail.

Three operator families: the variance-reduction split search that
grows a regression tree's root (decision-tree induction as one sorted
prefix-sum pass), k-nearest-neighbour regression made EXACT without a
pairwise stage via the 1-D sorted-window trick, and the chi-square
sample-ratio-mismatch check every experimentation platform runs before
trusting an A/B readout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
_SPLIT = "2024-01-16 00:00:00"

_PER_USER_SQL = f"""
per_user AS (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '{_SPLIT}' THEN {_CENTS} ELSE 0 END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '{_SPLIT}' THEN {_CENTS} ELSE 0 END) AS y
  FROM events GROUP BY 1
)"""


def _per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    split = F.lit(_SPLIT).cast("timestamp")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0)).alias("y"),
    )


# ---------------------------------------------------------------------------
# CART root split
# ---------------------------------------------------------------------------

_CART_SQL = f"""
WITH {_PER_USER_SQL},
ord AS (
  SELECT x, y,
         sum(y) OVER w AS cy, sum(y * y) OVER w AS cyy,
         row_number() OVER w AS i,
         count(*) OVER () AS n,
         sum(y) OVER () AS ty, sum(y * y) OVER () AS tyy,
         lead(x) OVER w AS next_x
  FROM per_user
  WINDOW w AS (ORDER BY x, user_id ROWS UNBOUNDED PRECEDING)
),
cand AS (
  -- candidate split between distinct consecutive x: SSE(left)+SSE(right)
  -- from prefix sums; SSE = Σy² − (Σy)²/m, all exact integers until
  -- the single division
  SELECT x, next_x, i, n,
         (cyy - CAST(cy AS DOUBLE) * cy / i)
           + ((tyy - cyy) - CAST(ty - cy AS DOUBLE) * (ty - cy) / (n - i)) AS sse,
         tyy - CAST(ty AS DOUBLE) * ty / n AS sse0
  FROM ord WHERE next_x IS NOT NULL AND next_x > x
),
best AS (
  -- argmin key rounds sse to 1e-2 (= the reported sse/10000 at 1e-6):
  -- the old * 1e6 key overflowed Spark's floor-to-LONG at sf1 (sse ~
  -- 2.5e13 -> 2.5e19 > 2^63), collapsing every key to Long.MAX and
  -- letting the x tiebreak pick the first candidate. * 1e2 keeps the
  -- key exact to ~9e16 of raw SSE (~4000x sf1).
  SELECT * FROM cand
  ORDER BY floor(sse * 1e2 + 0.5) ASC, x ASC LIMIT 1
)
SELECT {round6_sql('(x + next_x) / 2.0 / 100')} AS threshold_r,
       i AS n_left, n - i AS n_right,
       {round6_sql('sse / 10000')} AS sse_split_r,
       {round6_sql('(sse0 - sse) / sse0')} AS var_reduction_r
FROM best
"""


@register("ml_cart_root_split", sql=_CART_SQL)
def ml_cart_root_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The root split of a regression tree (CART): scan candidate
    thresholds between consecutive distinct pre-period spends and pick
    the one minimizing SSE(left)+SSE(right) for post-period spend —
    decision-tree induction's inner loop as ONE sorted prefix-sum pass
    (no per-candidate rescans: both sides' SSEs come from running
    Σy, Σy² and the totals). The argmin compares SSEs rounded to 1e-2
    with the threshold as tiebreak — the r08 sf1 sweep caught the old
    1e-6 key overflowing Spark's floor-to-LONG at 10x rows (every key
    collapsed to Long.MAX and the tiebreak picked the first
    candidate).

    Scale: one groupBy(user), one global sort with running sums (at
    scale: range-partitioned sort + per-partition offsets, the §2
    two-pass prefix trick), one TakeOrdered top-1. All sums are exact
    integers; the division happens once per candidate."""
    pu = _per_user(spark, sf_dir)
    w = Window.orderBy("x", "user_id").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    ordd = pu.select(
        "x",
        "y",
        F.sum("y").over(w).alias("cy"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("cyy"),
        F.row_number().over(Window.orderBy("x", "user_id")).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("y").over(wall).alias("ty"),
        F.sum(F.col("y") * F.col("y")).over(wall).alias("tyy"),
        F.lead("x").over(Window.orderBy("x", "user_id")).alias("next_x"),
    )
    cand = ordd.filter(
        F.col("next_x").isNotNull() & (F.col("next_x") > F.col("x"))
    ).select(
        "x",
        "next_x",
        "i",
        "n",
        (
            (F.col("cyy") - F.col("cy").cast("double") * F.col("cy") / F.col("i"))
            + (
                (F.col("tyy") - F.col("cyy"))
                - (F.col("ty") - F.col("cy")).cast("double")
                * (F.col("ty") - F.col("cy"))
                / (F.col("n") - F.col("i"))
            )
        ).alias("sse"),
        (
            F.col("tyy") - F.col("ty").cast("double") * F.col("ty") / F.col("n")
        ).alias("sse0"),
    )
    best = cand.orderBy(
        F.asc(F.floor(F.col("sse") * 1e2 + 0.5)), F.asc("x")
    ).limit(1)
    return best.select(
        round6((F.col("x") + F.col("next_x")) / 2.0 / 100).alias("threshold_r"),
        F.col("i").alias("n_left"),
        (F.col("n") - F.col("i")).alias("n_right"),
        round6(F.col("sse") / 10000).alias("sse_split_r"),
        round6((F.col("sse0") - F.col("sse")) / F.col("sse0")).alias(
            "var_reduction_r"
        ),
    )


# ---------------------------------------------------------------------------
# exact 1-D kNN regression
# ---------------------------------------------------------------------------

_KNN_REG_K = 3
_KNN_CAND = 2 * _KNN_REG_K  # k neighbours on each side cover the true kNN


def _knn_reg_sql() -> str:
    lags = ", ".join(
        f"lag(x, {j}) OVER w AS xl{j}, lag(y, {j}) OVER w AS yl{j}, "
        f"lag(user_id, {j}) OVER w AS ul{j}, "
        f"lead(x, {j}) OVER w AS xr{j}, lead(y, {j}) OVER w AS yr{j}, "
        f"lead(user_id, {j}) OVER w AS ur{j}"
        for j in range(1, _KNN_REG_K + 1)
    )
    cands = []
    for j in range(1, _KNN_REG_K + 1):
        cands.append(f"{{'d': abs(x - xl{j}), 'u': ul{j}, 'y': yl{j}}}")
        cands.append(f"{{'d': abs(x - xr{j}), 'u': ur{j}, 'y': yr{j}}}")
    return f"""
WITH {_PER_USER_SQL},
nb AS (
  SELECT user_id, x, y, {lags}
  FROM per_user
  WINDOW w AS (ORDER BY x, user_id)
),
cand AS (
  SELECT user_id, x, y,
         unnest(list_filter([{", ".join(cands)}], c -> c.u IS NOT NULL)) AS c
  FROM nb
),
ranked AS (
  SELECT user_id, x, y, c.y AS ny,
         row_number() OVER (PARTITION BY user_id ORDER BY c.d, c.u) AS rk
  FROM cand
),
pred AS (
  SELECT user_id, y,
         sum(CASE WHEN rk <= {_KNN_REG_K} THEN ny END) AS sy,
         sum(CASE WHEN rk <= {_KNN_REG_K} THEN 1 ELSE 0 END) AS m
  FROM ranked GROUP BY user_id, y
)
SELECT count(*) AS n_scored,
       {round6_sql(
           'sqrt(sum(pow(y - CAST(sy AS DOUBLE) / m, 2)) / count(*)) / 100'
       )} AS rmse_r
FROM pred WHERE m = {_KNN_REG_K}
"""


@register("ml_knn_regression_1d", sql=_knn_reg_sql())
def ml_knn_regression_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN regression (k=3) on a 1-D feature made EXACT without any
    pairwise stage: after sorting by pre-period spend, a point's true
    k nearest neighbours live among its k predecessors and k successors
    (1-D metric ⇒ the kNN set is contiguous around the query), so 2k
    lag/lead columns are a guaranteed superset; rank them by
    (|Δx|, user_id) and average the top k's outcomes. Reported as
    leave-one-out RMSE over users with a full candidate set. Tie
    semantics: when several points share the query's x, the candidate
    set is the POSITIONAL ±k block under (x, user_id) order (both
    engines, by construction); a global (|Δx|, id) tie rule could pick
    different equal-distance neighbours — it changes the prediction
    only when tied distances straddle the k boundary with different
    outcomes, and never changes which distances are used.

    Scale: ONE global sort (range-partitioned at scale) + constant-width
    window columns replaces the n² distance matrix — the same
    sorted-neighbour exactness argument as ns_prefix_cache_lcp, for a
    metric instead of prefixes. Distances and ranks are exact integers;
    only the final RMSE divides."""
    pu = _per_user(spark, sf_dir)
    wo = Window.orderBy("x", "user_id")
    cols = [F.col("user_id"), F.col("x"), F.col("y")]
    cands = []
    for j in range(1, _KNN_REG_K + 1):
        for side, fn in (("l", F.lag), ("r", F.lead)):
            cands.append(
                F.struct(
                    F.abs(F.col("x") - fn("x", j).over(wo)).alias("d"),
                    fn("user_id", j).over(wo).alias("u"),
                    fn("y", j).over(wo).alias("y"),
                )
            )
    nb = pu.select(*cols, F.array(*cands).alias("cs"))
    cand = nb.select(
        "user_id",
        "x",
        "y",
        F.explode(F.filter("cs", lambda c: c["u"].isNotNull())).alias("c"),
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("c.d"), F.col("c.u"))
    pred = (
        cand.withColumn("rk", F.row_number().over(wr))
        .groupBy("user_id", "y")
        .agg(
            F.sum(F.when(F.col("rk") <= _KNN_REG_K, F.col("c.y"))).alias("sy"),
            F.sum(F.when(F.col("rk") <= _KNN_REG_K, 1).otherwise(0)).alias("m"),
        )
        .filter(F.col("m") == _KNN_REG_K)
    )
    return pred.agg(
        F.count(F.lit(1)).alias("n_scored"),
        round6(
            F.sqrt(
                F.sum(
                    F.pow(
                        F.col("y") - F.col("sy").cast("double") / F.col("m"), 2
                    )
                )
                / F.count(F.lit(1))
            )
            / 100
        ).alias("rmse_r"),
    )


# ---------------------------------------------------------------------------
# sample-ratio-mismatch check
# ---------------------------------------------------------------------------

_SRM_CHI2_CRIT = 3.841458820694124  # chi²(1) at α = 0.05

_SRM_SQL = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
c AS (
  SELECT sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
         sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1
  FROM u
)
SELECT n0, n1,
       {round6_sql(
           'pow(n0 - (n0 + n1) / 2.0, 2) / ((n0 + n1) / 2.0)'
           ' + pow(n1 - (n0 + n1) / 2.0, 2) / ((n0 + n1) / 2.0)'
       )} AS chi2_r,
       (pow(n0 - (n0 + n1) / 2.0, 2) / ((n0 + n1) / 2.0)
        + pow(n1 - (n0 + n1) / 2.0, 2) / ((n0 + n1) / 2.0))
         > {_SRM_CHI2_CRIT} AS srm_flag
FROM c
"""


@register("ab_srm_check", sql=_SRM_SQL)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: χ² goodness-of-fit of the
    variant counts against the designed 50/50 split — the first check
    every experimentation platform runs, because a mismatched ratio
    invalidates the readout before any metric is looked at. The flag
    compares against the χ²(1) 5% critical value; with user_id%2
    assignment the counts are deterministic so the flag is stable.

    Scale: one distinct + one two-cell aggregate."""
    u = load_table(spark, sf_dir, "events").select("user_id").distinct()
    c = u.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("n1"),
    )
    half = (F.col("n0") + F.col("n1")) / 2.0
    chi2 = F.pow(F.col("n0") - half, 2) / half + F.pow(F.col("n1") - half, 2) / half
    return c.select(
        "n0", "n1", round6(chi2).alias("chi2_r"), (chi2 > _SRM_CHI2_CRIT).alias("srm_flag")
    )
