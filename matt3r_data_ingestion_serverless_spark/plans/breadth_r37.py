"""Round-2 batch 12 (this run): exponential recency-weighted
engagement and the silhouette score of labeled embeddings.

Per-row transcendentals (exp) quantize to micro-units before any
cross-row sum; centroid means divide exact integer element sums once
(SCALE.md §13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# exponential recency-weighted engagement score
# ---------------------------------------------------------------------------

_HALF_DAYS = 30.0  # decay scale in days

_RECENCY_SQL = f"""
WITH g AS (SELECT epoch_us(max(ts)) AS wm FROM events),
q AS (
  SELECT user_id,
         CAST(floor(exp(-(CAST(g.wm - epoch_us(ts) AS DOUBLE) / 86400e6)
                         / {_HALF_DAYS}) * 1e6 + 0.5) AS BIGINT) AS w_micro,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events CROSS JOIN g
),
s AS (
  SELECT user_id, count(*) AS n,
         sum(w_micro) AS w_sum, sum(w_micro * cents) AS score
  FROM q GROUP BY user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n,
       CAST(w_sum AS BIGINT) AS weight_micro,
       CAST(score AS BIGINT) AS score_micro_cents,
       {round6_sql("CAST(score AS DOUBLE) / w_sum")} AS weighted_mean_cents
FROM s
"""


@register("ns_recency_weighted_engagement", _RECENCY_SQL)
def ns_recency_weighted_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential recency-weighted engagement per user — value mass
    decayed by e^(−age/30 d) from the corpus high-watermark, the
    standard feature-store recency feature (and the batch twin of a
    streaming EWMA keyed by event time, ts_ewma_smoothing). Each row's
    decay weight quantizes to micro-units, so the weighted sum and
    total weight are exact int64 (w ≤ 10⁶, cents ≤ 5·10⁴ ⇒ 5·10¹⁰ per
    row) and the weighted mean divides once. One scan + one hash agg;
    the watermark is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.unix_micros(F.max("ts")).alias("wm"))
    q = ev.crossJoin(F.broadcast(g)).select(
        "user_id",
        F.floor(
            F.exp(
                -((F.col("wm") - F.unix_micros("ts")).cast("double") / 86400e6)
                / _HALF_DAYS
            )
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("w_micro"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    s = q.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("w_micro").alias("w_sum"),
        F.sum(F.col("w_micro") * F.col("cents")).alias("score"),
    )
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.col("w_sum").cast("long").alias("weight_micro"),
        F.col("score").cast("long").alias("score_micro_cents"),
        round6(F.col("score").cast("double") / F.col("w_sum")).alias("weighted_mean_cents"),
    )


# ---------------------------------------------------------------------------
# silhouette score of the labeled embedding space
# ---------------------------------------------------------------------------

_SIL_SQL = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS vm
  FROM embeddings
),
el AS (
  SELECT label, i, sum(vm[i]) AS s, count(*) AS n
  FROM e, (SELECT unnest(range(1, 65)) AS i)
  GROUP BY label, i
),
cent AS (
  SELECT label,
         list_transform(list(s ORDER BY i), x -> CAST(x AS DOUBLE))
           AS csum,
         max(n) AS n
  FROM el GROUP BY label
),
c AS (
  SELECT label AS clabel,
         list_transform(csum, x -> x / n / 1e6) AS cv
  FROM cent
),
d AS (
  SELECT e.vec_id, e.label, c.clabel,
         list_reduce(
           list_transform(range(1, 65),
                          i -> (e.vm[i] / 1e6 - c.cv[i]) * (e.vm[i] / 1e6 - c.cv[i])),
           (a, b) -> a + b) AS dist2
  FROM e CROSS JOIN c
),
ab AS (
  SELECT vec_id, label,
         CAST(floor(sqrt(max(CASE WHEN label = clabel THEN dist2 END)) * 1e6 + 0.5)
              AS BIGINT) AS a_micro,
         CAST(floor(sqrt(min(CASE WHEN label != clabel THEN dist2 END)) * 1e6 + 0.5)
              AS BIGINT) AS b_micro
  FROM d GROUP BY vec_id, label
),
s AS (
  SELECT label,
         CAST(floor(CAST(b_micro - a_micro AS DOUBLE)
                    / greatest(a_micro, b_micro) * 1e6
                    + CASE WHEN b_micro >= a_micro THEN 0.5 ELSE -0.5 END) AS BIGINT)
           AS s_micro
  FROM ab
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(s_micro) AS BIGINT) AS sum_s_micro,
       {round6_sql("CAST(sum(s_micro) AS DOUBLE) / count(*) / 1e6")} AS mean_silhouette
FROM s GROUP BY label
"""


@register("embedding_silhouette_by_label", _SIL_SQL)
def embedding_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette score per embedding
    label — s = (b−a)/max(a,b) with a = distance to own centroid, b =
    nearest other centroid — the clustering-quality readout for the
    labeled vector space (the eval side of kmeans_embeddings /
    ns_semdedup_clusters). Element values quantize to micro-units so
    centroid element sums are exact int64 (one division per element);
    distances are fixed-order folds over identical doubles; per-vector
    s quantizes to micro before the per-label mean (int64 sum, one
    division). The 10 centroids broadcast — the O(n·k) assign pattern,
    never O(n²)."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * 1e6 + 0.5).cast("long"),
        ).alias("vm"),
    )
    el = (
        e.select("label", F.posexplode("vm").alias("i0", "v"))
        .groupBy("label", "i0")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    )
    cent = el.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("i0", "s"))), lambda st: st["s"]
        ).alias("csum"),
        F.max("n").alias("n"),
    )
    c = cent.select(
        F.col("label").alias("clabel"),
        F.transform(F.col("csum"), lambda x: x.cast("double") / F.col("n") / 1e6).alias("cv"),
    )
    pairs = e.crossJoin(F.broadcast(c))
    dist2 = F.aggregate(
        F.zip_with(
            F.col("vm"),
            F.col("cv"),
            lambda x, cvi: (x.cast("double") / 1e6 - cvi) * (x.cast("double") / 1e6 - cvi),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = pairs.select("vec_id", "label", "clabel", dist2.alias("dist2"))
    ab = d.groupBy("vec_id", "label").agg(
        F.floor(
            F.sqrt(F.max(F.when(F.col("label") == F.col("clabel"), F.col("dist2")))) * 1e6
            + 0.5
        )
        .cast("long")
        .alias("a_micro"),
        F.floor(
            F.sqrt(F.min(F.when(F.col("label") != F.col("clabel"), F.col("dist2")))) * 1e6
            + 0.5
        )
        .cast("long")
        .alias("b_micro"),
    )
    s_micro = F.floor(
        (F.col("b_micro") - F.col("a_micro")).cast("double")
        / F.greatest("a_micro", "b_micro")
        * 1e6
        + F.when(F.col("b_micro") >= F.col("a_micro"), 0.5).otherwise(-0.5)
    ).cast("long")
    s = ab.select("label", s_micro.alias("s_micro"))
    return s.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s_micro").cast("long").alias("sum_s_micro"),
        round6(F.sum("s_micro").cast("double") / F.count("*") / 1e6).alias(
            "mean_silhouette"
        ),
    )
