"""Round-4 batch 22: privacy generalization ladder, F1-optimal
threshold sweep, and WSPT scheduling.

Three operator families: the k-anonymity generalization-lattice search
(find the least-coarse quasi-identifier bucketing that satisfies k),
decision-threshold tuning by exact F1 sweep (one sorted prefix-sum
pass, the eval-harness step after calibration), and the
weighted-shortest-processing-time schedule with its total weighted
completion time (the classic single-machine OR rule as a window
query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# k-anonymity generalization ladder
# ---------------------------------------------------------------------------

_KANON_K = 5
# generalization levels for the (user-bucket, time-bucket) quasi-id,
# least general first: user_id % m buckets user granularity coarser as
# m shrinks; the time bucket coarsens hour → day → week
_KANON_LEVELS = (
    (1, 100, "hour"),
    (2, 50, "day"),
    (3, 20, "day"),
    (4, 10, "week"),
)


def _kanon_sql() -> str:
    branches = []
    for lvl, m, tb in _KANON_LEVELS:
        tcol = f"date_trunc('{tb}', ts)"
        branches.append(
            f"""
  SELECT {lvl} AS level, '{m} user buckets x {tb}' AS scheme,
         count(*) AS n_classes,
         min(c) AS min_class_size,
         min(c) >= {_KANON_K} AS k_anonymous
  FROM (
    SELECT user_id % {m}, {tcol}, count(*) AS c
    FROM events GROUP BY 1, 2
  )"""
        )
    return f"""
WITH lv AS ({" UNION ALL ".join(branches)})
SELECT level, scheme, n_classes, min_class_size, k_anonymous,
       coalesce(level = (SELECT min(level) FROM lv WHERE k_anonymous), false)
         AS chosen
FROM lv
"""


@register("privacy_generalization_ladder", sql=_kanon_sql())
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization search: walk the quasi-identifier
    lattice from least to most general (finer user buckets × hour →
    coarser buckets × week) and mark the FIRST level whose smallest
    equivalence class reaches k=5 — the Datafly/Incognito-style ladder
    that picks the minimal information loss satisfying the privacy
    constraint (ns_kanonymity_audit measures one scheme; this chooses
    among schemes).

    Scale: each level is one groupBy over the scan with a 1-row
    min-class aggregate; levels is a constant, and the chosen-level
    marker is a scalar subquery over the 4-row ladder."""
    ev = load_table(spark, sf_dir, "events")
    rows = []
    for lvl, m, tb in _KANON_LEVELS:
        cls = ev.groupBy(
            (F.col("user_id") % m).alias("ub"), F.date_trunc(tb, "ts").alias("tb")
        ).agg(F.count(F.lit(1)).alias("c"))
        rows.append(
            cls.agg(
                F.lit(lvl).alias("level"),
                F.lit(f"{m} user buckets x {tb}").alias("scheme"),
                F.count(F.lit(1)).alias("n_classes"),
                F.min("c").alias("min_class_size"),
                (F.min("c") >= _KANON_K).alias("k_anonymous"),
            )
        )
    lv = rows[0]
    for r in rows[1:]:
        lv = lv.union(r)
    lv = lv.localCheckpoint(eager=True)
    chosen = lv.filter("k_anonymous").agg(F.min("level").alias("min_lvl"))
    return lv.crossJoin(F.broadcast(chosen)).select(
        "level",
        "scheme",
        "n_classes",
        "min_class_size",
        "k_anonymous",
        # no qualifying level (possible at tiny SFs) → FALSE, not NULL
        F.coalesce(F.col("level") == F.col("min_lvl"), F.lit(False)).alias(
            "chosen"
        ),
    )


# ---------------------------------------------------------------------------
# F1-optimal threshold sweep
# ---------------------------------------------------------------------------

_F1_SQL = f"""
WITH pts AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lbl
  FROM events WHERE value IS NOT NULL
),
tot AS (SELECT sum(lbl) AS p FROM pts),
g AS (SELECT s, count(*) AS n, sum(lbl) AS np FROM pts GROUP BY s),
sweep AS (
  -- predict positive when score >= threshold s: tp/fp from suffix sums
  SELECT s,
         sum(np) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS tp,
         sum(n - np) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS fp
  FROM g
),
f1 AS (
  SELECT s, tp, fp, tot.p,
         CAST(2 * tp AS DOUBLE) / (2 * tp + fp + (tot.p - tp)) AS f1
  FROM sweep, tot
),
best AS (
  SELECT * FROM f1 ORDER BY floor(f1 * 1e6 + 0.5) DESC, s ASC LIMIT 1
)
SELECT {round6_sql('s / 100.0')} AS threshold_r, tp, fp, p AS n_pos,
       {round6_sql('f1')} AS f1_r
FROM best
"""


@register("ml_f1_threshold_sweep", sql=_F1_SQL)
def ml_f1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-threshold tuning: sweep every distinct score (event
    value, predicting 'is purchase') and pick the threshold maximizing
    F1 = 2tp/(2tp+fp+fn) — the post-calibration step that turns a
    scored model into a classifier. One sorted suffix-sum pass gives
    tp/fp at EVERY candidate simultaneously (same prefix-sum shape as
    the CART split search); the argmax compares micro-rounded F1 with
    the threshold as tiebreak.

    Scale: groupBy(score) collapses to the score grid before the
    ordered sweep, so the single-partition window is support-sized
    (cent grid), not row-sized — the aggregate-below-window shape."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = ev.select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("lbl"),
    )
    g = pts.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("lbl").alias("np")
    )
    tot = g.agg(F.sum("np").alias("p"))
    wd = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    sweep = g.select(
        "s",
        F.sum("np").over(wd).alias("tp"),
        F.sum(F.col("n") - F.col("np")).over(wd).alias("fp"),
    )
    f1 = sweep.join(F.broadcast(tot)).select(
        "s",
        "tp",
        "fp",
        "p",
        (
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + (F.col("p") - F.col("tp")))
        ).alias("f1"),
    )
    best = f1.orderBy(
        F.desc(F.floor(F.col("f1") * 1e6 + 0.5)), F.asc("s")
    ).limit(1)
    return best.select(
        round6(F.col("s") / 100.0).alias("threshold_r"),
        "tp",
        "fp",
        F.col("p").alias("n_pos"),
        round6(F.col("f1")).alias("f1_r"),
    )


# ---------------------------------------------------------------------------
# WSPT scheduling
# ---------------------------------------------------------------------------

_WSPT_SQL = f"""
WITH jobs AS (
  SELECT o_orderkey AS job,
         CAST(round(o_totalprice, 0) AS BIGINT) AS p,
         6 - CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w
  FROM orders WHERE o_orderkey % 20 = 0
),
sched AS (
  SELECT job, p, w,
         sum(p) OVER (ORDER BY CAST(p AS DOUBLE) / w, job
                      ROWS UNBOUNDED PRECEDING) AS completion,
         row_number() OVER (ORDER BY CAST(p AS DOUBLE) / w, job) AS pos
  FROM jobs
)
SELECT count(*) AS n_jobs,
       sum(w * completion) AS total_weighted_completion,
       max(CASE WHEN pos = 1 THEN job END) AS first_job,
       max(completion) AS makespan
FROM sched
"""


@register("ops_wspt_schedule", sql=_WSPT_SQL)
def ops_wspt_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-shortest-processing-time scheduling (Smith's rule): a
    5%-sample of orders become single-machine jobs (processing = price,
    weight = inverted priority digit); sorting by p/w is OPTIMAL for
    total weighted completion time, which one running sum then
    evaluates — the classic OR scheduling result as a window query,
    the same objective a queue/backlog planner minimizes.

    Scale: one sort (range-partitioned at scale with per-partition
    prefix offsets) + one running sum + one aggregate. The p/w order
    key is a ratio of exact integers, identical in both engines, with
    the job id as tiebreak."""
    jobs = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(
            F.col("o_orderkey").alias("job"),
            F.round("o_totalprice", 0).cast("long").alias("p"),
            (6 - F.substring("o_orderpriority", 1, 1).cast("long")).alias("w"),
        )
    )
    wo = Window.orderBy(F.col("p").cast("double") / F.col("w"), F.col("job"))
    sched = jobs.select(
        "job",
        "p",
        "w",
        F.sum("p").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "completion"
        ),
        F.row_number().over(wo).alias("pos"),
    )
    return sched.agg(
        F.count(F.lit(1)).alias("n_jobs"),
        F.sum(F.col("w") * F.col("completion")).alias("total_weighted_completion"),
        F.max(F.when(F.col("pos") == 1, F.col("job"))).alias("first_job"),
        F.max("completion").alias("makespan"),
    )
