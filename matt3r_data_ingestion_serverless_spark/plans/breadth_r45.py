"""Round-2 batch 20 (this run): an autocorrelation-function table and
monthly growth accounting.

ACF moment sums are exact int64 per lag; growth accounting is pure set
logic on (user, month) activity — no floats anywhere except final
round6 ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# ACF table: lags 1..14 of the global daily value-mass series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 14

_ACF_SQL = f"""
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS x
  FROM events GROUP BY strftime(ts, '%Y-%m-%d')
),
r AS (SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily),
p AS (
  SELECT k.k, a.x AS xa, b.x AS xb
  FROM (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS k) k
  JOIN r a ON TRUE
  JOIN r b ON b.rn = a.rn + k.k
),
s AS (
  SELECT k, count(*) AS n,
         sum(xa) AS sa, sum(xb) AS sb,
         sum(CAST(xa AS DECIMAL(38,0)) * xb) AS sab,
         sum(CAST(xa AS DECIMAL(38,0)) * xa) AS saa,
         sum(CAST(xb AS DECIMAL(38,0)) * xb) AS sbb
  FROM p GROUP BY k
)
SELECT k AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       {round6_sql(
           "(CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)"
           " - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))"
           " / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)"
           "          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
           "    * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)"
           "           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))"
       )} AS acf
FROM s
"""


@register("ts_acf_table", _ACF_SQL)
def ts_acf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full autocorrelation function of the daily value-mass
    series at lags 1..14 — the table behind an ACF plot (weekly
    seasonality shows as a spike at 7), generalizing
    ts_autocorr_hourly's two fixed lags. Per lag, the lagged pairing
    is an rn-offset EQUI-join on the ~365-row daily rollup (the
    aggregate-first discipline), and all five moment sums accumulate
    exactly (DECIMAL(38,0) products — daily cents reach ~10⁹ at sf0.1,
    so Σx² exceeds int64); the Pearson closed form runs once per lag.
    14 lags × 365 rows — trivially broadcast-sized after the shrink."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("x")
    )
    r = daily.select("x", F.row_number().over(Window.orderBy("day")).alias("rn"))
    ks = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    a = r.crossJoin(F.broadcast(ks)).select(
        "k", F.col("x").alias("xa"), (F.col("rn") + F.col("k")).alias("probe_rn")
    )
    b = r.select(F.col("x").alias("xb"), F.col("rn").alias("probe_rn"))
    p = a.join(b, "probe_rn")
    s = p.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("xa").alias("sa"),
        F.sum("xb").alias("sb"),
        F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb")).alias("sab"),
        F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xa")).alias("saa"),
        F.sum(F.col("xb").cast("decimal(38,0)") * F.col("xb")).alias("sbb"),
    )
    n = F.col("n").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    sab, saa, sbb = (
        F.col("sab").cast("double"),
        F.col("saa").cast("double"),
        F.col("sbb").cast("double"),
    )
    acf = (n * sab - sa * sb) / (F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb))
    return s.select(
        F.col("k").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        round6(acf).alias("acf"),
    )


# ---------------------------------------------------------------------------
# monthly growth accounting: new / retained / resurrected / churned
# ---------------------------------------------------------------------------

_GROWTH_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, strftime(ts, '%Y-%m') AS month FROM events
),
hist AS (
  SELECT user_id, month,
         lag(month) OVER (PARTITION BY user_id ORDER BY month) AS prev_month,
         row_number() OVER (PARTITION BY user_id ORDER BY month) AS nth,
         strftime(CAST(month || '-01' AS DATE) - INTERVAL 1 MONTH, '%Y-%m')
           AS month_minus_1
  FROM act
),
flags AS (
  SELECT month,
         CASE WHEN nth = 1 THEN 'new'
              WHEN prev_month = month_minus_1 THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM hist
),
active AS (SELECT month, count(*) AS mau FROM act GROUP BY month),
churn AS (
  SELECT strftime(CAST(h.month || '-01' AS DATE) + INTERVAL 1 MONTH, '%Y-%m')
           AS month,
         count(*) AS churned
  FROM hist h
  LEFT JOIN act nxt
    ON nxt.user_id = h.user_id
   AND nxt.month = strftime(CAST(h.month || '-01' AS DATE) + INTERVAL 1 MONTH, '%Y-%m')
  WHERE nxt.user_id IS NULL
  GROUP BY 1
)
SELECT f.month,
       CAST(max(a.mau) AS BIGINT) AS mau,
       CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS retained,
       CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
         AS resurrected,
       CAST(coalesce(max(c.churned), 0) AS BIGINT) AS churned_in
FROM flags f
JOIN active a USING (month)
LEFT JOIN churn c USING (month)
GROUP BY f.month
"""


@register("growth_accounting_monthly", _GROWTH_SQL)
def growth_accounting_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly growth accounting — every MAU decomposed into new
    (first month ever), retained (active last month), or resurrected
    (returned after a gap), plus how many of the previous month's
    actives churned INTO this month — the standard growth ledger
    (MAU_t = new + retained + resurrected; checked in tests). One
    distinct (user, month) shrink feeds a per-user lag window and an
    anti-join for churn; everything after the shrink is
    month-cardinality. The identity cross-checks cohort_retention and
    cumulative_unique_users."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select("user_id", F.date_format("ts", "yyyy-MM").alias("month")).distinct()
    w = Window.partitionBy("user_id").orderBy("month")
    m1 = F.date_format(
        F.add_months(F.to_date(F.concat(F.col("month"), F.lit("-01"))), -1), "yyyy-MM"
    )
    p1 = F.date_format(
        F.add_months(F.to_date(F.concat(F.col("month"), F.lit("-01"))), 1), "yyyy-MM"
    )
    hist = act.select(
        "user_id",
        "month",
        F.lag("month").over(w).alias("prev_month"),
        F.row_number().over(w).alias("nth"),
        m1.alias("month_minus_1"),
        p1.alias("month_plus_1"),
    )
    flags = hist.select(
        "month",
        F.when(F.col("nth") == 1, "new")
        .when(F.col("prev_month") == F.col("month_minus_1"), "retained")
        .otherwise("resurrected")
        .alias("status"),
    )
    active = act.groupBy("month").agg(F.count("*").alias("mau"))
    nxt = act.select(
        F.col("user_id").alias("u2"), F.col("month").alias("m2")
    )
    churn = (
        hist.join(
            nxt,
            (F.col("user_id") == F.col("u2")) & (F.col("month_plus_1") == F.col("m2")),
            "left_anti",
        )
        .groupBy(F.col("month_plus_1").alias("month"))
        .agg(F.count("*").alias("churned"))
    )
    agg = flags.groupBy("month").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias("new_users"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0)).alias("retained"),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0)).alias(
            "resurrected"
        ),
    )
    return (
        agg.join(active, "month")
        .join(churn, "month", "left")
        .select(
            "month",
            F.col("mau").cast("long").alias("mau"),
            F.col("new_users").cast("long").alias("new_users"),
            F.col("retained").cast("long").alias("retained"),
            F.col("resurrected").cast("long").alias("resurrected"),
            F.coalesce("churned", F.lit(0)).cast("long").alias("churned_in"),
        )
    )
