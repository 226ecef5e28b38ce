"""Round-4 batch 9: numerical differentiation of irregular telemetry
and neighborhood-Jaccard link prediction on the near-dup graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# central-difference derivative of an irregular series
# ---------------------------------------------------------------------------

_DERIV_SQL = f"""
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
w AS (
  SELECT user_id, event_id, t_us, cents,
         lag(cents)  OVER win AS c_prev, lag(t_us)  OVER win AS t_prev,
         lead(cents) OVER win AS c_next, lead(t_us) OVER win AS t_next
  FROM s
  WINDOW win AS (PARTITION BY user_id ORDER BY t_us, event_id)
)
SELECT user_id, event_id, CAST(t_us AS BIGINT) AS t_us,
       {round6_sql(
           "CAST(c_next - c_prev AS DOUBLE) * 864.0 "
           "/ (CAST(t_next - t_prev AS DOUBLE) / 100000000.0)"
       )} AS deriv_per_day
FROM w
WHERE c_prev IS NOT NULL AND c_next IS NOT NULL AND t_next > t_prev
"""


@register("ts_numerical_derivative", _DERIV_SQL)
def ts_numerical_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Central-difference derivative over an IRREGULARLY sampled series:
    d/dt at each interior sample = (v₊ − v₋)/(t₊ − t₋), per device —
    how a telemetry stack derives acceleration from the reference's
    speed channel (parse_canserver_filtered_log.py:167-169) or power
    from an energy meter, without resampling first.

    One window (lag + lead share the same sort) per device hash; the
    quotient derives from exact int64 cents and µs with one fixed
    double formula (scaled to per-day units), so results match the
    oracle bit-for-bit. Endpoint samples have no central difference and
    drop — forward/backward one-sided stencils are the same lag/lead
    columns if a consumer needs them."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    s = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    win = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    w = s.select(
        "user_id",
        "event_id",
        "t_us",
        F.lag("cents").over(win).alias("c_prev"),
        F.lag("t_us").over(win).alias("t_prev"),
        F.lead("cents").over(win).alias("c_next"),
        F.lead("t_us").over(win).alias("t_next"),
    )
    deriv = (
        (F.col("c_next") - F.col("c_prev")).cast("double")
        * 864.0
        / ((F.col("t_next") - F.col("t_prev")).cast("double") / 100000000.0)
    )
    return w.filter(
        F.col("c_prev").isNotNull()
        & F.col("c_next").isNotNull()
        & (F.col("t_next") > F.col("t_prev"))
    ).select("user_id", "event_id", "t_us", round6(deriv).alias("deriv_per_day"))


# ---------------------------------------------------------------------------
# link prediction: neighborhood Jaccard over the near-dup graph
# ---------------------------------------------------------------------------

_LP_MIN_JACCARD = 0.2
_LP_MIN_COOCCUR = 2


def _link_pred_sql() -> str:
    return f"""
WITH e0 AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM e0 a JOIN e0 b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_LP_MIN_COOCCUR}
),
edges AS (
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION SELECT part_b, part_a FROM pairs
),
deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
common AS (
  SELECT e1.src AS u, e2.src AS v, count(*) AS cn
  FROM edges e1 JOIN edges e2
    ON e1.dst = e2.dst AND e1.src < e2.src
  GROUP BY 1, 2
),
cand AS (
  SELECT c.u, c.v, c.cn, du.d AS du, dv.d AS dv
  FROM common c
  JOIN deg du ON c.u = du.node
  JOIN deg dv ON c.v = dv.node
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = c.u AND e.dst = c.v)
)
SELECT u AS part_a, v AS part_b, CAST(cn AS BIGINT) AS common_neighbors,
       {round6_sql("CAST(cn AS DOUBLE) / (du + dv - cn)")} AS nbr_jaccard
FROM cand
WHERE CAST(cn AS DOUBLE) / (du + dv - cn) >= {_LP_MIN_JACCARD}
"""


@register("graph_link_prediction", sql=_link_pred_sql())
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard over the part
    CO-PURCHASE graph (parts sharing >= 2 distinct orders): for
    NON-adjacent part pairs sharing co-purchase neighbours, score
    |N(u)∩N(v)|/|N(u)∪N(v)| — the classic "triangle-closing"
    recommender candidate generator (Amazon's people-also-bought).

    The r07 version ran this over the MinHash-LSH near-dup graph and
    was VACUOUS AT EVERY SF (r08 finding): LSH banding recovers dup
    clusters as complete cliques, so every wedge's endpoints are
    already adjacent and the non-adjacency anti-join leaves zero
    candidates structurally — no threshold can fix a graph whose
    triangles always close. Co-purchase edges carry no such closure, so
    the query grades non-trivial rows at sf0.01/sf0.1/sf1 (2076 / 1390
    / 161 measured).

    Shape: per-order part pairs from ONE equi-self-join on l_orderkey
    (per-key fan-out bounded by lines-per-order, a constant ≤ C(7,2));
    the >= 2-order HAVING makes the edge list collision-sparse (~4k
    edges at every SF); common neighbours come from one self-join of
    that edge list on the shared endpoint, degrees broadcast back,
    existing edges anti-joined away. Work is Σ deg² over a sparse
    graph. The Jaccard |N(u)∪N(v)| = du + dv − cn stays exact-integer
    under the single rounded division."""
    e0 = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = e0.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = e0.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _LP_MIN_COOCCUR)
        .select("part_a", "part_b")
    )
    edges = (
        pairs.union(pairs.select(F.col("part_b"), F.col("part_a")))
        .toDF("src", "dst")
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e1 = edges.select(F.col("src").alias("u"), F.col("dst").alias("mid"))
    e2 = edges.select(F.col("src").alias("v"), F.col("dst").alias("mid"))
    common = (
        e1.join(e2, "mid")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )
    cand = (
        common.join(edges, (common.u == edges.src) & (common.v == edges.dst), "left_anti")
        .join(F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("du"))), "u")
        .join(F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))), "v")
    )
    jac = F.col("cn").cast("double") / (F.col("du") + F.col("dv") - F.col("cn"))
    return cand.filter(jac >= _LP_MIN_JACCARD).select(
        F.col("u").alias("part_a"),
        F.col("v").alias("part_b"),
        F.col("cn").cast("long").alias("common_neighbors"),
        round6(jac).alias("nbr_jaccard"),
    )


# ---------------------------------------------------------------------------
# peak-over-threshold tail analysis (EVT-style exceedance summary)
# ---------------------------------------------------------------------------

_POT_SQL = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
vc AS (SELECT event_type, cents, count(*) AS c FROM v GROUP BY 1, 2),
cum AS (
  SELECT event_type, cents, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM vc
),
thr AS (
  SELECT event_type, min(cents) AS u
  FROM cum WHERE cum >= ceil(0.99 * n)
  GROUP BY event_type
)
SELECT v.event_type,
       CAST(max(thr.u) AS BIGINT) AS threshold_cents,
       count(*) AS n_exceed,
       CAST(sum(v.cents - thr.u) AS BIGINT) AS total_excess_cents,
       CAST(max(v.cents) AS BIGINT) AS max_cents,
       {mean_excess} AS mean_excess_cents
FROM v JOIN thr ON v.event_type = thr.event_type
WHERE v.cents > thr.u
GROUP BY v.event_type
""".replace(
    "{mean_excess}",
    round6_sql("CAST(sum(v.cents - thr.u) AS DOUBLE) / count(*)"),
)


@register("ts_pot_tail_analysis", _POT_SQL)
def ts_pot_tail_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-over-threshold tail analysis (the EVT first step): per
    channel, set the threshold at the exact p99 (value-histogram
    quantile, the exact_global_quantiles pattern per group), then
    summarize the exceedances — count, total and mean excess, max — the
    numbers a GPD tail fit consumes and capacity planning reads as
    "how bad is bad".

    All exact-int until the single rounded mean-excess division; the
    per-group histogram window replaces any raw-row sort, and the
    threshold table broadcasts back onto the scan."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    vc = v.groupBy("event_type", "cents").agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vc.select(
        "event_type",
        "cents",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    thr = (
        cum.filter(F.col("cum") >= F.ceil(0.99 * F.col("n")))
        .groupBy("event_type")
        .agg(F.min("cents").alias("u"))
    )
    j = v.join(F.broadcast(thr), "event_type").filter(F.col("cents") > F.col("u"))
    excess = F.col("cents") - F.col("u")
    return j.groupBy("event_type").agg(
        F.max("u").cast("long").alias("threshold_cents"),
        F.count("*").alias("n_exceed"),
        F.sum(excess).cast("long").alias("total_excess_cents"),
        F.max("cents").cast("long").alias("max_cents"),
        round6(F.sum(excess).cast("double") / F.count("*")).alias(
            "mean_excess_cents"
        ),
    )


# ---------------------------------------------------------------------------
# SPC individuals control chart (XmR)
# ---------------------------------------------------------------------------

_SPC_SQL = """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         sum(CAST(round(value, 0) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
mr AS (
  SELECT event_type, day, v,
         abs(v - lag(v) OVER (PARTITION BY event_type ORDER BY day)) AS moving_range
  FROM d
),
lim AS (
  SELECT event_type,
         CAST(sum(v) AS DOUBLE) / count(*) AS center,
         CAST(sum(moving_range) AS DOUBLE) / count(moving_range) AS mr_bar
  FROM mr GROUP BY event_type
)
SELECT mr.event_type, mr.day, CAST(mr.v AS BIGINT) AS v,
       {center} AS center,
       {ucl} AS ucl,
       {lcl} AS lcl,
       (mr.v > lim.center + 2.66 * lim.mr_bar
        OR mr.v < lim.center - 2.66 * lim.mr_bar) AS out_of_control
FROM mr JOIN lim ON mr.event_type = lim.event_type
""".replace("{center}", round6_sql("lim.center")).replace(
    "{ucl}", round6_sql("lim.center + 2.66 * lim.mr_bar")
).replace("{lcl}", round6_sql("lim.center - 2.66 * lim.mr_bar"))


@register("ts_spc_control_chart", _SPC_SQL)
def ts_spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC individuals chart (XmR, Shewhart): daily channel totals
    against center ± 2.66·mR̄ control limits (mR̄ = mean absolute
    successive difference) — the classic "is the process stable"
    monitor, a third alarm philosophy beside the rolling z-score
    (parametric) and rolling IQR (robust): SPC limits freeze on the
    WHOLE baseline and flag instability rather than outliers.

    The center/limits derive from exact int sums with fixed double
    formulas; the out-of-control comparison runs on UNROUNDED limits
    (rounding only reported columns). One day-grain agg, one lag
    window, one tiny per-channel limit table broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.round(F.col("value"), 0).cast("long")).alias("v"))
    mr = d.select(
        "event_type",
        "day",
        "v",
        F.abs(
            F.col("v")
            - F.lag("v").over(Window.partitionBy("event_type").orderBy("day"))
        ).alias("moving_range"),
    )
    lim = mr.groupBy("event_type").agg(
        (F.sum("v").cast("double") / F.count("*")).alias("center"),
        (F.sum("moving_range").cast("double") / F.count("moving_range")).alias(
            "mr_bar"
        ),
    )
    j = mr.join(F.broadcast(lim), "event_type")
    ucl = F.col("center") + 2.66 * F.col("mr_bar")
    lcl = F.col("center") - 2.66 * F.col("mr_bar")
    return j.select(
        "event_type",
        "day",
        F.col("v").cast("long").alias("v"),
        round6(F.col("center")).alias("center"),
        round6(ucl).alias("ucl"),
        round6(lcl).alias("lcl"),
        ((F.col("v") > ucl) | (F.col("v") < lcl)).alias("out_of_control"),
    )
