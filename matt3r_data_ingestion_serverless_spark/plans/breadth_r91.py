"""Round-4 batch 19: IPF raking, water-filling budget allocation, and
Oaxaca-Blinder gap decomposition.

Three allocation/adjustment operator families: iterative proportional
fitting of the event-type × weekday contingency table to target
marginals (survey raking — the 2-D Sinkhorn scaling), exact
water-filling of a document budget across sources under availability
caps (the fair-allocation rule dataset-mixture balancing uses), and
the two-fold Oaxaca-Blinder decomposition of a group outcome gap into
explained (covariate) and unexplained (coefficient) parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# iterative proportional fitting (raking)
# ---------------------------------------------------------------------------

_IPF_ITERS = 3


def _ipf_sql() -> str:
    ctes = [
        """x0 AS (
  SELECT event_type AS i, CAST(isodow(ts) AS INT) AS j,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
)""",
        "tot AS (SELECT sum(x) AS t FROM x0)",
    ]
    prev = "x0"
    for k in range(1, _IPF_ITERS + 1):
        ctes.append(
            f"""r{k} AS (
  SELECT i, j, x * ((SELECT t FROM tot) / 5.0)
              / sum(x) OVER (PARTITION BY i) AS x
  FROM {prev}
)"""
        )
        ctes.append(
            f"""c{k} AS (
  SELECT i, j, x * ((SELECT t FROM tot) / 7.0)
              / sum(x) OVER (PARTITION BY j) AS x
  FROM r{k}
)"""
        )
        prev = f"c{k}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT i AS event_type, j AS dow, {round6_sql('x')} AS raked_r FROM {prev}"
    )


@register("stats_ipf_raking", sql=_ipf_sql())
def stats_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking / iterative proportional fitting (the 2-D Sinkhorn
    scaling): alternately rescale the event-type × ISO-weekday count
    grid so row marginals hit T/5 and column marginals hit T/7
    (uniform targets), 3 sweeps — the weighting adjustment that makes a
    skewed sample representative of known population margins, and the
    matrix-scaling core of entropic optimal transport.

    Scale: the grid materializes with ONE data-sized groupBy (35 cells
    at any volume); each sweep is a window-sum over the constant grid.
    Cross-engine: every cell is the identical chain of multiply/divide
    over the same starting integers; the per-row/col sums are ≤ 7-term
    float additions whose order ulps the final round6 absorbs."""
    g = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("i"),
            (((F.dayofweek("ts") + 5) % 7) + 1).cast("int").alias("j"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .localCheckpoint(eager=True)
    )
    tot = g.agg(F.sum("x").alias("t"))
    cur = g.join(F.broadcast(tot))
    wi = Window.partitionBy("i")
    wj = Window.partitionBy("j")
    for _ in range(_IPF_ITERS):
        cur = cur.withColumn(
            "x", F.col("x") * (F.col("t") / 5.0) / F.sum("x").over(wi)
        )
        cur = cur.withColumn(
            "x", F.col("x") * (F.col("t") / 7.0) / F.sum("x").over(wj)
        )
    return cur.select(
        F.col("i").alias("event_type"),
        F.col("j").alias("dow"),
        round6(F.col("x")).alias("raked_r"),
    )


# ---------------------------------------------------------------------------
# water-filling budget allocation
# ---------------------------------------------------------------------------

_WF_BUDGET_FRAC = 0.5

_WF_SQL = f"""
WITH avail AS (
  SELECT source, CAST(count(*) AS BIGINT) AS a FROM documents GROUP BY source
),
b AS (SELECT CAST(floor(sum(a) * {_WF_BUDGET_FRAC}) AS BIGINT) AS budget FROM avail),
ord AS (
  SELECT source, a,
         sum(a) OVER (ORDER BY a, source ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (ORDER BY a, source) AS rn,
         count(*) OVER () AS k
  FROM avail
),
lv AS (
  -- candidate water level when all sources up to rn are saturated:
  -- level = (budget - cum_saturated) / remaining
  SELECT o.*, b.budget,
         (b.budget - coalesce(lag(cum) OVER (ORDER BY rn), 0))
           / CAST(k - rn + 1 AS DOUBLE) AS level
  FROM ord o, b
),
pick AS (
  SELECT * FROM lv WHERE level <= a ORDER BY rn LIMIT 1
)
SELECT o.source, o.a AS available,
       {round6_sql(
           "CASE WHEN p.level IS NULL OR o.a < p.level"
           " THEN CAST(o.a AS DOUBLE) ELSE p.level END"
       )} AS alloc_r
FROM ord o LEFT JOIN pick p ON true
"""


@register("ns_budget_water_filling", sql=_WF_SQL)
def ns_budget_water_filling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling allocation of a sampling budget (half the corpus)
    across document sources: every source gets min(availability, λ)
    where the water level λ spends the budget exactly — the max-min
    fair mixture rule (small sources keep everything, large sources cap
    at a common level) behind balanced dataset mixing. λ solves in
    CLOSED FORM after one sort: for the first source (ascending) whose
    availability reaches the candidate level, λ = (budget − Σ smaller
    avails)/(#remaining).

    Scale: availability is one groupBy(source); the level search is a
    window over the SOURCE list (constant-size), not the corpus. If
    the budget exceeds total availability every source saturates
    (level never binds — the NULL-pick branch)."""
    avail = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("a"))
        .localCheckpoint(eager=True)
    )
    b = avail.agg(
        F.floor(F.sum("a") * _WF_BUDGET_FRAC).cast("long").alias("budget")
    )
    wo = Window.orderBy("a", "source")
    ord_ = avail.select(
        "source",
        "a",
        F.sum("a").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(wo).alias("rn"),
    ).join(F.broadcast(avail.agg(F.count(F.lit(1)).alias("k"))))
    lv = ord_.join(F.broadcast(b)).select(
        "*",
        (
            (
                F.col("budget")
                - F.coalesce(F.lag("cum").over(Window.orderBy("rn")), F.lit(0))
            )
            / (F.col("k") - F.col("rn") + 1).cast("double")
        ).alias("level"),
    )
    pick = (
        lv.filter(F.col("level") <= F.col("a"))
        .orderBy("rn")
        .limit(1)
        .select(F.col("level").alias("plevel"))
    )
    # pick is provably non-empty for budget ≤ total (the last candidate
    # level always binds), so the cross join never drops rows; the
    # NULL-plevel branch mirrors the oracle's LEFT JOIN for the
    # saturate-everything edge a larger budget would hit
    return (
        ord_.crossJoin(F.broadcast(pick))
        .select(
            "source",
            F.col("a").alias("available"),
            round6(
                F.when(
                    F.col("plevel").isNull() | (F.col("a") < F.col("plevel")),
                    F.col("a").cast("double"),
                ).otherwise(F.col("plevel"))
            ).alias("alloc_r"),
        )
    )


# ---------------------------------------------------------------------------
# Oaxaca-Blinder decomposition
# ---------------------------------------------------------------------------

_OB_SPLIT = "2024-01-16 00:00:00"
_OB_DAY1 = "2024-01-02 00:00:00"
_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

_OB_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '{_OB_SPLIT}' THEN {_CENTS} ELSE 0 END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '{_OB_SPLIT}' THEN {_CENTS} ELSE 0 END) AS y,
         max(CASE WHEN event_type = 'error'
                   AND ts < TIMESTAMP '{_OB_DAY1}' THEN 1 ELSE 0 END) AS grp
  FROM events GROUP BY 1
),
fit AS (
  SELECT grp, count(*) AS n,
         CAST(sum(x) AS DOUBLE) / count(*) AS mx,
         CAST(sum(y) AS DOUBLE) / count(*) AS my,
         CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
           / (count(*) * sum(x * x) - sum(x) * sum(x)) AS b1
  FROM per_user GROUP BY grp
)
SELECT {round6_sql('(a.my - b.my) / 100')} AS gap_r,
       {round6_sql('(a.mx - b.mx) * b.b1 / 100')} AS explained_r,
       {round6_sql(
           '((a.my - b.my) - (a.mx - b.mx) * b.b1) / 100'
       )} AS unexplained_r,
       {round6_sql('a.b1')} AS beta1_treated_r,
       {round6_sql('b.b1')} AS beta1_control_r,
       a.n AS n_treated, b.n AS n_control
FROM fit a, fit b WHERE a.grp = 1 AND b.grp = 0
"""


@register("stats_oaxaca_blinder", sql=_OB_SQL)
def stats_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-fold Oaxaca-Blinder decomposition of the post-period spend
    gap between day-one-error users and the rest: fit y = β₀ + β₁x
    (x = pre-period spend) per group in closed form, then split the
    mean gap into EXPLAINED = (x̄₁−x̄₀)·β₁⁰ (the part the covariate
    difference accounts for at control prices) and UNEXPLAINED — the
    standard wage-gap econometrics, applied to the same self-selected
    treatment causal_ipw_ate adjusts.

    Scale: one groupBy(user) then one groupBy(group) of five exact
    integer sums each; the decomposition is arithmetic on two rows.
    Every double is an identical expression over exact integers."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    split = F.lit(_OB_SPLIT).cast("timestamp")
    day1 = F.lit(_OB_DAY1).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0)).alias("y"),
        F.max(
            F.when(
                (F.col("event_type") == "error") & (F.col("ts") < day1), 1
            ).otherwise(0)
        ).alias("grp"),
    )
    fit = per_user.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mx"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("my"),
        (
            (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
                - F.sum("x") * F.sum("y")
            ).cast("double")
            / (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            )
        ).alias("b1"),
    )
    a = fit.filter(F.col("grp") == 1).select(
        F.col("n").alias("n_treated"),
        F.col("mx").alias("mx1"),
        F.col("my").alias("my1"),
        F.col("b1").alias("b1_1"),
    )
    b = fit.filter(F.col("grp") == 0).select(
        F.col("n").alias("n_control"),
        F.col("mx").alias("mx0"),
        F.col("my").alias("my0"),
        F.col("b1").alias("b1_0"),
    )
    return a.crossJoin(b).select(
        round6((F.col("my1") - F.col("my0")) / 100).alias("gap_r"),
        round6((F.col("mx1") - F.col("mx0")) * F.col("b1_0") / 100).alias(
            "explained_r"
        ),
        round6(
            (
                (F.col("my1") - F.col("my0"))
                - (F.col("mx1") - F.col("mx0")) * F.col("b1_0")
            )
            / 100
        ).alias("unexplained_r"),
        round6(F.col("b1_1")).alias("beta1_treated_r"),
        round6(F.col("b1_0")).alias("beta1_control_r"),
        "n_treated",
        "n_control",
    )
