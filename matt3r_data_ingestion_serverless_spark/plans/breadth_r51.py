"""Round-2 batch 26 (this run): hysteresis burst detection without a
fold, and ClickHouse-style windowFunnel depth.

The hysteresis recurrence is rewritten as LOCF over boundary-crossing
markers (last_value IGNORE NULLS), so the 'stateful' automaton runs as
one declarative window; thresholds are cross-multiplied integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# hysteresis (Schmitt-trigger) burst episodes over hourly counts
# ---------------------------------------------------------------------------

# enter burst when cnt > 1.5×mean, leave when cnt < 0.8×mean
_HYST_HI_NUM, _HYST_LO_NUM = 15, 8  # ×mean_milli/10 cross-multiplied

_HYST_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
m AS (
  SELECT event_type, count(*) AS n_hours, sum(cnt) AS s FROM hourly GROUP BY event_type
),
mk AS (
  SELECT h.event_type, h.hr, h.cnt, m.n_hours,
         CASE WHEN h.cnt * 10000 > {_HYST_HI_NUM} * ((m.s * 1000) // m.n_hours) THEN 1
              WHEN h.cnt * 10000 < {_HYST_LO_NUM} * ((m.s * 1000) // m.n_hours) THEN 0
              ELSE NULL END AS marker
  FROM hourly h JOIN m USING (event_type)
),
st AS (
  SELECT event_type, hr, n_hours,
         coalesce(last_value(marker IGNORE NULLS)
                  OVER (PARTITION BY event_type ORDER BY hr
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS state
  FROM mk
),
tr AS (
  SELECT event_type, n_hours, state,
         coalesce(lag(state) OVER (PARTITION BY event_type ORDER BY hr), 0) AS prev
  FROM st
)
SELECT event_type,
       CAST(max(n_hours) AS BIGINT) AS n_hours,
       CAST(sum(state) AS BIGINT) AS burst_hours,
       CAST(sum(CASE WHEN state = 1 AND prev = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bursts
FROM tr GROUP BY event_type
"""


@register("ts_hysteresis_bursts", _HYST_SQL)
def ts_hysteresis_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schmitt-trigger burst detection on hourly counts — enter a
    burst above 1.5× the mean rate, leave below 0.8× (the two-
    threshold hysteresis that kills the flapping a single threshold
    produces; the practical cousin of Kleinberg's burst automaton).
    The recurrence state_t = f(state_{t-1}, cnt_t) needs NO fold: the
    state equals the LAST boundary-crossing marker, so last_value
    IGNORE NULLS over the marker column runs the automaton as one
    declarative window — the LOCF identity that keeps stateful scans
    parallel (same family as ts_gap_fill_locf). Thresholds compare
    cross-multiplied integers against the milli-quantized mean; burst
    episodes count 0→1 transitions."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count("*").alias("cnt")
    )
    m = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_hours"), F.sum("cnt").alias("s")
    )
    mk = hourly.join(F.broadcast(m), "event_type").select(
        "event_type",
        "hr",
        "n_hours",
        F.when(
            F.col("cnt") * 10000 > _HYST_HI_NUM * F.expr("(s * 1000) div n_hours"), 1
        )
        .when(F.col("cnt") * 10000 < _HYST_LO_NUM * F.expr("(s * 1000) div n_hours"), 0)
        .otherwise(F.lit(None))
        .alias("marker"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    st = mk.select(
        "event_type",
        "hr",
        "n_hours",
        F.coalesce(F.last("marker", ignorenulls=True).over(wcum), F.lit(0)).alias("state"),
    )
    tr = st.select(
        "event_type",
        "n_hours",
        "state",
        F.coalesce(
            F.lag("state").over(Window.partitionBy("event_type").orderBy("hr")), F.lit(0)
        ).alias("prev"),
    )
    return tr.groupBy("event_type").agg(
        F.max("n_hours").cast("long").alias("n_hours"),
        F.sum("state").cast("long").alias("burst_hours"),
        F.sum(F.when((F.col("state") == 1) & (F.col("prev") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_bursts"),
    )


# ---------------------------------------------------------------------------
# windowFunnel: max signup→click→purchase depth with 1-hour step gaps
# ---------------------------------------------------------------------------

_WF_GAP_US = 3_600_000_000

_WF_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
),
d1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'signup'),
d2 AS (
  SELECT DISTINCT c.user_id
  FROM e c JOIN e s
    ON s.user_id = c.user_id AND s.event_type = 'signup' AND c.event_type = 'click'
   AND c.us > s.us AND c.us - s.us <= {_WF_GAP_US}
),
d3 AS (
  SELECT DISTINCT p.user_id
  FROM e p
  JOIN e c ON c.user_id = p.user_id AND c.event_type = 'click'
          AND p.event_type = 'purchase' AND p.us > c.us
          AND p.us - c.us <= {_WF_GAP_US}
  JOIN e s ON s.user_id = c.user_id AND s.event_type = 'signup'
          AND c.us > s.us AND c.us - s.us <= {_WF_GAP_US}
),
depth AS (
  SELECT d1.user_id,
         1 + CASE WHEN d2.user_id IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN d3.user_id IS NOT NULL THEN 1 ELSE 0 END AS naive,
         CASE WHEN d3.user_id IS NOT NULL THEN 3
              WHEN d2.user_id IS NOT NULL THEN 2 ELSE 1 END AS depth
  FROM d1 LEFT JOIN d2 USING (user_id) LEFT JOIN d3 USING (user_id)
)
SELECT depth, CAST(count(*) AS BIGINT) AS n_users
FROM depth GROUP BY depth
"""


@register("window_funnel_depth", _WF_SQL)
def window_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel semantics (the ClickHouse operator): each user's
    maximum signup→click→purchase depth where every consecutive step
    happens within ONE HOUR of the previous — funnel_conversion
    requires order only; the step-gap constraint is what separates an
    intent chain from coincidence. Depth-k membership is a k-way
    self-join on (user, type) with the gap predicate (hash join on
    user + range filter — no range-join fallback); users are deduped
    per depth and the final histogram is 3 rows. At 100 TB each join
    input is pre-filtered to one event type — the selective-scan
    shape."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type").isin("signup", "click", "purchase")).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("uid"), F.col("us").alias("s_us")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid"), F.col("us").alias("c_us")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"), F.col("us").alias("p_us")
    )
    d1 = s.select("uid").distinct()
    sc = s.join(c, "uid").filter(
        (F.col("c_us") > F.col("s_us")) & (F.col("c_us") - F.col("s_us") <= _WF_GAP_US)
    )
    d2 = sc.select("uid").distinct()
    d3 = (
        sc.join(p, "uid")
        .filter(
            (F.col("p_us") > F.col("c_us")) & (F.col("p_us") - F.col("c_us") <= _WF_GAP_US)
        )
        .select("uid")
        .distinct()
    )
    depth = (
        d1.join(d2.withColumn("h2", F.lit(1)), "uid", "left")
        .join(d3.withColumn("h3", F.lit(1)), "uid", "left")
        .select(
            F.when(F.col("h3").isNotNull(), 3)
            .when(F.col("h2").isNotNull(), 2)
            .otherwise(1)
            .alias("depth")
        )
    )
    return depth.groupBy("depth").agg(F.count("*").cast("long").alias("n_users"))
