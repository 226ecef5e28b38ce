"""Round-2 batch 13 (this run): HITS hubs/authorities in pure integer
arithmetic, the Hodges–Lehmann shift estimator, and the cumulative
unique-user curve.

HITS scores renormalize by integer division each half-step, so the
whole iteration is int64 and engine-exact (SCALE.md §13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# HITS (2 iterations) over the directed near-dup graph
# ---------------------------------------------------------------------------


def _hits_sql() -> str:
    from matt3r_data_ingestion_serverless_spark.plans.northstar import _minhash_lsh_sql

    pairs = _minhash_lsh_sql().strip()
    return f"""
WITH pairs AS ({pairs}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs),
nodes AS (SELECT DISTINCT node FROM
          (SELECT s AS node FROM edges UNION SELECT t FROM edges)),
a1r AS (SELECT t AS node, count(*) * 1000000 AS v FROM edges GROUP BY t),
a1 AS (SELECT node, (v * 1000000) // (SELECT max(v) FROM a1r) AS v FROM a1r),
h1r AS (SELECT e.s AS node, sum(a1.v) AS v
        FROM edges e JOIN a1 ON e.t = a1.node GROUP BY e.s),
h1 AS (SELECT node, (v * 1000000) // (SELECT max(v) FROM h1r) AS v FROM h1r),
a2r AS (SELECT e.t AS node, sum(h1.v) AS v
        FROM edges e JOIN h1 ON e.s = h1.node GROUP BY e.t),
a2 AS (SELECT node, (v * 1000000) // (SELECT max(v) FROM a2r) AS v FROM a2r),
h2r AS (SELECT e.s AS node, sum(a2.v) AS v
        FROM edges e JOIN a2 ON e.t = a2.node GROUP BY e.s),
h2 AS (SELECT node, (v * 1000000) // (SELECT max(v) FROM h2r) AS v FROM h2r)
SELECT n.node AS doc_id,
       CAST(coalesce(ideg.d, 0) AS BIGINT) AS in_deg,
       CAST(coalesce(odeg.d, 0) AS BIGINT) AS out_deg,
       CAST(coalesce(a2.v, 0) AS BIGINT) AS auth_micro,
       CAST(coalesce(h2.v, 0) AS BIGINT) AS hub_micro
FROM nodes n
LEFT JOIN (SELECT t, count(*) AS d FROM edges GROUP BY t) ideg ON n.node = ideg.t
LEFT JOIN (SELECT s, count(*) AS d FROM edges GROUP BY s) odeg ON n.node = odeg.s
LEFT JOIN a2 ON n.node = a2.node
LEFT JOIN h2 ON n.node = h2.node
"""


@register("graph_hits_hubs_authorities", _hits_sql())
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hubs-and-authorities, two full iterations over
    the near-dup graph directed low-id → high-id (the citation-style
    orientation that keeps hubs and authorities distinct — symmetric
    edges would collapse them). Every half-step renormalizes by the
    current MAX via TRUE integer division (v·10⁶ // max), so scores
    stay exact int64 through both iterations — no float ever enters,
    unlike the classic L2 normalization. Each half-step is one
    edge-list join + hash agg on the same key (the exchange is reused
    across steps), the same shape as graph_pagerank; max() is a 1-row
    broadcast."""
    from matt3r_data_ingestion_serverless_spark.plans.northstar import (
        ns_dedup_minhash_lsh,
    )

    edges = (
        ns_dedup_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("s").alias("node"))
        .union(edges.select("t"))
        .distinct()
    )

    def normalize(raw: DataFrame) -> DataFrame:
        # Checkpoint the half-step's raw scores FIRST: `raw` is consumed
        # twice (the max subquery and the projection), and each of the
        # four chained half-steps consumed its predecessor's WHOLE plan
        # twice more — the returned plan held 178 Exchanges / 96 scans /
        # 276 aggregates of duplicated subtrees (measured, r10). With
        # the lazy checkpoint each half-step is one join + one hash agg
        # over a materialized table: plan size O(steps), the pagerank
        # treatment. The 1-row max broadcast is bounded at any scale.
        raw = raw.localCheckpoint(eager=False)
        mx = raw.agg(F.max("v").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node", F.expr("(v * 1000000) div mx").alias("v")
        )

    a1 = normalize(
        edges.groupBy(F.col("t").alias("node")).agg((F.count("*") * 1000000).alias("v"))
    )
    h1 = normalize(
        edges.join(a1, edges.t == a1.node)
        .groupBy(F.col("s").alias("node2"))
        .agg(F.sum("v").alias("v"))
        .withColumnRenamed("node2", "node")
    )
    a2 = normalize(
        edges.join(h1, edges.s == h1.node)
        .groupBy(F.col("t").alias("node2"))
        .agg(F.sum("v").alias("v"))
        .withColumnRenamed("node2", "node")
    )
    h2 = normalize(
        edges.join(a2, edges.t == a2.node)
        .groupBy(F.col("s").alias("node2"))
        .agg(F.sum("v").alias("v"))
        .withColumnRenamed("node2", "node")
    )
    ideg = edges.groupBy(F.col("t").alias("node")).agg(F.count("*").alias("in_deg"))
    odeg = edges.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("out_deg"))
    out = (
        nodes.join(ideg, "node", "left")
        .join(odeg, "node", "left")
        .join(a2.withColumnRenamed("v", "auth"), "node", "left")
        .join(h2.withColumnRenamed("v", "hub"), "node", "left")
    )
    return out.select(
        F.col("node").alias("doc_id"),
        F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
        F.coalesce("auth", F.lit(0)).cast("long").alias("auth_micro"),
        F.coalesce("hub", F.lit(0)).cast("long").alias("hub_micro"),
    )


# ---------------------------------------------------------------------------
# Hodges–Lehmann shift estimator between two daily series
# ---------------------------------------------------------------------------

_HL_SQL = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY event_type, strftime(ts, '%Y-%m-%d')
),
diffs AS (
  SELECT p.cents - c.cents AS d
  FROM (SELECT cents FROM daily WHERE event_type = 'purchase') p
  CROSS JOIN (SELECT cents FROM daily WHERE event_type = 'click') c
),
r AS (
  SELECT d, row_number() OVER (ORDER BY d) AS rn, count(*) OVER () AS n
  FROM diffs
)
SELECT CAST(max(n) AS BIGINT) AS n_pairs,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN d END) AS BIGINT) AS hl_lo_cents,
       CAST(max(CASE WHEN rn = n // 2 + 1 THEN d END) AS BIGINT) AS hl_hi_cents,
       CAST(min(d) AS BIGINT) AS min_diff,
       CAST(max(d) AS BIGINT) AS max_diff
FROM r
"""


@register("hodges_lehmann_shift", _HL_SQL)
def hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann estimator of the location shift between the
    purchase and click daily-value distributions — the median of ALL
    pairwise differences, the robust effect-size companion to the
    rank tests (Mann-Whitney's point estimate). Aggregate-first: the
    O(n₁·n₂) pair grid is built from ~365-row daily rollups, never raw
    events (the only sound way at 100 TB); differences are exact
    integer cents and both middle order statistics are reported
    (median = their average for even N, left to the reader to avoid a
    fractional cent)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"))
    )
    p = daily.filter(F.col("event_type") == "purchase").select(
        F.col("cents").alias("pc")
    )
    c = daily.filter(F.col("event_type") == "click").select(F.col("cents").alias("cc"))
    diffs = p.crossJoin(c).select((F.col("pc") - F.col("cc")).alias("d"))
    r = diffs.select(
        "d",
        F.row_number().over(Window.orderBy("d")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return r.agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("d")))
        .cast("long")
        .alias("hl_lo_cents"),
        F.max(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("d")))
        .cast("long")
        .alias("hl_hi_cents"),
        F.min("d").cast("long").alias("min_diff"),
        F.max("d").cast("long").alias("max_diff"),
    )


# ---------------------------------------------------------------------------
# cumulative unique-user acquisition curve
# ---------------------------------------------------------------------------

_CUM_SQL = """
WITH first_day AS (
  SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day FROM events GROUP BY user_id
),
new_users AS (SELECT day, count(*) AS new_users FROM first_day GROUP BY day)
SELECT day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM new_users
"""


@register("cumulative_unique_users", _CUM_SQL)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user acquisition curve — the growth chart's
    data: per day, how many users appear for the FIRST time and the
    running total. The classic trap is COUNT(DISTINCT) per expanding
    window (quadratic rescans); the scalable identity is first-touch
    attribution — one min-day per user, then a day-grain rollup and a
    ~365-row cumulative window. Complements rolling_7d_distinct_users
    (trailing distinct) with the expanding variant."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.date_format("ts", "yyyy-MM-dd")).alias("day")
    )
    new_users = first_day.groupBy("day").agg(F.count("*").alias("new_users"))
    cum = F.sum("new_users").over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return new_users.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        cum.cast("long").alias("cum_users"),
    )
