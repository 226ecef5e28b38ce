"""Round-4 batch 17: cohort LTV accumulation curves and first-story
(novelty) detection over the embedding stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import vectors
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# cohort lifetime-value accumulation
# ---------------------------------------------------------------------------

_LTV_SQL = f"""
WITH first_seen AS (
  SELECT user_id, min(date_trunc('day', ts)) AS d0 FROM events GROUP BY user_id
),
cohorted AS (
  SELECT strftime(date_trunc('week', f.d0), '%Y-%m-%d') AS cohort_week,
         date_diff('week', date_trunc('week', f.d0),
                   date_trunc('week', e.ts)) AS week_idx,
         CAST(round(e.value * 100, 0) AS BIGINT) AS cents
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
),
sizes AS (
  SELECT strftime(date_trunc('week', d0), '%Y-%m-%d') AS cohort_week,
         count(*) AS cohort_users
  FROM first_seen GROUP BY 1
),
wk AS (
  SELECT cohort_week, week_idx, sum(cents) AS rev
  FROM cohorted GROUP BY 1, 2
)
SELECT wk.cohort_week, CAST(week_idx AS INT) AS week_idx,
       CAST(sizes.cohort_users AS BIGINT) AS cohort_users,
       CAST(sum(rev) OVER (PARTITION BY wk.cohort_week ORDER BY week_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_revenue_cents,
       {round6_sql(
           "CAST(sum(rev) OVER (PARTITION BY wk.cohort_week ORDER BY week_idx "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
           " / sizes.cohort_users / 100.0"
       )} AS ltv_per_user
FROM wk JOIN sizes ON wk.cohort_week = sizes.cohort_week
"""


@register("cohort_ltv_curve", _LTV_SQL)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by first-activity
    week, purchase revenue accumulated by weeks-since-signup, divided
    by cohort size — the LTV-by-age grid growth teams pair with
    cohort_retention's activity counts (that one asks "do they come
    back", this one "what are they worth by age k").

    Exact integer cents through the cumulative window (per-cohort
    prefix sum over week indices — a handful of rows per cohort after
    the week-grain agg); cohort sizes broadcast back; the single
    division to dollars-per-user is the only rounded double."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("d0")
    )
    cohort_week = F.date_format(F.date_trunc("week", F.col("d0")), "yyyy-MM-dd")
    sizes = first_seen.groupBy(cohort_week.alias("cohort_week")).agg(
        F.count("*").alias("cohort_users")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").join(
        first_seen, "user_id"
    )
    week_idx = (
        F.datediff(
            F.date_trunc("week", F.col("ts")), F.date_trunc("week", F.col("d0"))
        )
        / 7
    ).cast("int")
    wk = purchases.select(
        cohort_week.alias("cohort_week"),
        week_idx.alias("week_idx"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).groupBy("cohort_week", "week_idx").agg(F.sum("cents").alias("rev"))
    cum = F.sum("rev").over(
        Window.partitionBy("cohort_week")
        .orderBy("week_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = wk.join(F.broadcast(sizes), "cohort_week")
    return j.select(
        "cohort_week",
        F.col("week_idx").cast("int").alias("week_idx"),
        F.col("cohort_users").cast("long").alias("cohort_users"),
        cum.cast("long").alias("cum_revenue_cents"),
        round6(cum.cast("double") / F.col("cohort_users") / 100.0).alias(
            "ltv_per_user"
        ),
    )


# ---------------------------------------------------------------------------
# first-story detection (novelty over the embedding arrival order)
# ---------------------------------------------------------------------------

_FSD_TAU = 0.5  # max-prior-similarity below this ⇒ novel


def _fsd_sql() -> str:
    from matt3r_data_ingestion_serverless_spark.plans.northstar import _emb_norm_cte

    cos = f"{vectors.dot_sql('cur.v', 'prev.v')} / (cur.nrm * prev.nrm)"
    return f"""
WITH {_emb_norm_cte()},
scored AS (
  SELECT cur.vec_id, max(round({cos}, 6)) AS max_prior_sim
  FROM n cur JOIN n prev ON prev.vec_id < cur.vec_id
  GROUP BY cur.vec_id
)
SELECT n.vec_id,
       scored.max_prior_sim,
       coalesce(scored.max_prior_sim < {_FSD_TAU}, TRUE) AS is_novel
FROM n LEFT JOIN scored ON n.vec_id = scored.vec_id
"""


@register("ns_first_story_detection", sql=_fsd_sql())
def ns_first_story_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-story detection (the TDT novelty task): an item is NOVEL
    when its maximum cosine similarity to every EARLIER item (vec_id =
    arrival order) stays below τ=0.5 — the "have we seen this story
    before" filter a streaming dedup/alerting pipeline runs on each
    arrival; the very first item is novel by definition.

    Batch formulation: the exact prior-max is a distributed blocked
    GEMM (operators/ann.py:blocked_prior_max_sim) — rows replicate to
    unordered block-pairs via a broadcast equi-join, each pair scores
    as dense BLAS in applyInPandas and emits per-item PARTIAL maxima
    over the prior items it holds, and a final groupBy(id).max
    combines them, so only n·(B+1) tiny rows ever shuffle back. No
    BroadcastNestedLoopJoin / no O(n²) shuffle rows (pinned in
    tests/test_plan_shapes.py); the 6-dp-rounded cosine keeps the max
    engine-exact. τ = 0.5 sits below the LSH near-dup regime (the SRP
    band join recalls ~7 % of such pairs on this corpus), so an exact
    novelty gate cannot ride the band join; when τ is high, the
    ns_ann_ivf_topk index cascade slots in with the same output
    contract."""
    from matt3r_data_ingestion_serverless_spark.operators.ann import (
        blocked_prior_max_sim,
    )
    from matt3r_data_ingestion_serverless_spark.plans.northstar import _emb_normed

    n = _emb_normed(spark, sf_dir)
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    scored = blocked_prior_max_sim(emb)
    return n.select("vec_id").join(scored, "vec_id", "left").select(
        "vec_id",
        "max_prior_sim",
        F.coalesce(F.col("max_prior_sim") < _FSD_TAU, F.lit(True)).alias("is_novel"),
    )
