"""Round-2 batch 43 (this run): funnel-window sensitivity sweep and
weekday-profile similarity scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# funnel window-size sensitivity: signup→click within 1h / 6h / 24h
# ---------------------------------------------------------------------------

_FWS_WINDOWS_US = (3_600_000_000, 21_600_000_000, 86_400_000_000)


def _fws_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN min_gap_us <= {w} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS converted_{w // 3_600_000_000}h"
        for w in _FWS_WINDOWS_US
    )
    return f"""
WITH s AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'signup'),
c AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
g AS (
  SELECT s.user_id, min(c.us - s.us) AS min_gap_us
  FROM s JOIN c ON s.user_id = c.user_id AND c.us > s.us
  GROUP BY s.user_id
),
base AS (SELECT count(DISTINCT user_id) AS n_signup FROM s)
SELECT CAST(max(base.n_signup) AS BIGINT) AS n_signup_users,
       CAST(count(*) AS BIGINT) AS n_with_any_click_after,
       {cols}
FROM g CROSS JOIN base
"""


@register("funnel_window_sensitivity", _fws_sql())
def funnel_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window sensitivity: how many signup users click
    within 1 h / 6 h / 24 h of ANY signup — the sweep that justifies
    (or indicts) the window chosen by window_funnel_depth; a
    conversion metric that doubles when the window is widened is
    measuring coincidence, not intent. The minimum positive
    signup→click gap is computed ONCE per user (one join + min agg);
    the three window thresholds are then conditional sums over that single
    number — the sweep costs one pass, not three."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.unix_micros("ts").alias("s_us")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid"), F.unix_micros("ts").alias("c_us")
    )
    g = (
        s.join(c, (s.user_id == c.uid) & (F.col("c_us") > F.col("s_us")))
        .groupBy("user_id")
        .agg(F.min(F.col("c_us") - F.col("s_us")).alias("min_gap_us"))
    )
    base = s.agg(F.count_distinct("user_id").alias("n_signup"))
    j = g.crossJoin(F.broadcast(base))
    aggs = [
        F.max("n_signup").cast("long").alias("n_signup_users"),
        F.count("*").cast("long").alias("n_with_any_click_after"),
    ]
    for w in _FWS_WINDOWS_US:
        aggs.append(
            F.sum(F.when(F.col("min_gap_us") <= w, 1).otherwise(0))
            .cast("long")
            .alias(f"converted_{w // 3_600_000_000}h")
        )
    return j.agg(*aggs)


# ---------------------------------------------------------------------------
# weekday-profile similarity: each user's schedule vs the population
# ---------------------------------------------------------------------------

_WPS_SQL = f"""
WITH c AS (
  SELECT user_id, dayofweek(ts) AS dow, count(*) AS k
  FROM events GROUP BY user_id, dayofweek(ts)
),
g AS (SELECT dow, sum(k) AS gk FROM c GROUP BY dow),
dots AS (
  SELECT c.user_id,
         sum(c.k * g.gk) AS dot,
         sum(c.k * c.k) AS uu,
         max(total.gg) AS gg,
         sum(c.k) AS n
  FROM c JOIN g USING (dow)
  CROSS JOIN (SELECT sum(gk * gk) AS gg FROM g) total
  GROUP BY c.user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(dot AS BIGINT) AS dot_int,
       {round6_sql(
           "CAST(dot AS DOUBLE) / (sqrt(CAST(uu AS DOUBLE)) * sqrt(CAST(gg AS DOUBLE)))"
       )} AS profile_cosine
FROM dots
"""


@register("weekday_profile_similarity", _WPS_SQL)
def weekday_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's weekday-activity profile scored by cosine against
    the population profile — the schedule-conformity signal (shift
    workers and bots score low; the 7-dimensional integer cousin of
    the embedding cosine family). All dot products are EXACT int64
    over integer day-counts (k·gk ≤ 10³·10⁵ per term); only the final
    normalization touches doubles. One (user, dow) agg + a broadcast
    7-row population vector."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", F.dayofweek("ts").alias("dow")).agg(
        F.count("*").alias("k")
    )
    g = c.groupBy("dow").agg(F.sum("k").alias("gk"))
    gg = g.agg(F.sum(F.col("gk") * F.col("gk")).alias("gg"))
    dots = (
        c.join(F.broadcast(g), "dow")
        .crossJoin(F.broadcast(gg))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("k") * F.col("gk")).alias("dot"),
            F.sum(F.col("k") * F.col("k")).alias("uu"),
            F.max("gg").alias("gg"),
            F.sum("k").alias("n"),
        )
    )
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("uu").cast("double")) * F.sqrt(F.col("gg").cast("double"))
    )
    return dots.select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.col("dot").cast("long").alias("dot_int"),
        round6(cosine).alias("profile_cosine"),
    )
