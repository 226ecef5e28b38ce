"""Round-2 batch 22 (this run): price-volume-mix variance bridge,
new-vs-repeat revenue split, and a duplicate-payment audit.

All value arithmetic is exact integer cents / quantities; the PVM
bridge reconciles to the total revenue delta by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# price-volume-mix bridge between two ship years
# ---------------------------------------------------------------------------

_PVM_Y0 = "1996"
_PVM_Y1 = "1997"

_PVM_SQL = f"""
WITH per AS (
  SELECT l_partkey, strftime(l_shipdate, '%Y') AS y,
         sum(CAST(l_quantity AS BIGINT)) AS q,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem WHERE strftime(l_shipdate, '%Y') IN ('{_PVM_Y0}', '{_PVM_Y1}')
  GROUP BY l_partkey, strftime(l_shipdate, '%Y')
),
w AS (
  SELECT l_partkey,
         coalesce(max(CASE WHEN y = '{_PVM_Y0}' THEN q END), 0) AS q0,
         coalesce(max(CASE WHEN y = '{_PVM_Y0}' THEN rev END), 0) AS r0,
         coalesce(max(CASE WHEN y = '{_PVM_Y1}' THEN q END), 0) AS q1,
         coalesce(max(CASE WHEN y = '{_PVM_Y1}' THEN rev END), 0) AS r1
  FROM per GROUP BY l_partkey
),
fx AS (
  SELECT
    -- price effect at constant volume: (p1-p0)·q1 = r1 - r0·q1/q0
    -- (exact rational form: r1·q0 - r0·q1, over q0) — only for parts
    -- present both years; new/lost parts land in the mix effect.
    CASE WHEN q0 > 0 AND q1 > 0
         THEN (r1 * q0 - r0 * q1) // q0 ELSE 0 END AS price_eff,
    CASE WHEN q0 > 0 AND q1 > 0
         THEN (r0 * q1 - r0 * q0) // q0 ELSE 0 END AS volume_eff,
    CASE WHEN q0 > 0 AND q1 > 0
         THEN (r1 - r0) - (r1 * q0 - r0 * q1) // q0 - (r0 * q1 - r0 * q0) // q0
         ELSE r1 - r0 END AS mix_eff,
    r1 - r0 AS delta
  FROM w
)
SELECT CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(price_eff) AS BIGINT) AS price_effect_cents,
       CAST(sum(volume_eff) AS BIGINT) AS volume_effect_cents,
       CAST(sum(mix_eff) AS BIGINT) AS mix_residual_cents,
       CAST(sum(delta) AS BIGINT) AS total_delta_cents
FROM fx
"""


@register("price_volume_mix_bridge", _PVM_SQL)
def price_volume_mix_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix variance bridge between two ship years — the
    FP&A decomposition of ΔRevenue into price effect ((p₁−p₀)·q₁ at
    constant volume), volume effect (p₀·Δq), and a mix/rounding
    residual absorbing new/lost parts and the integer-division
    remainders, so price + volume + mix == total Δ EXACTLY per part
    and in aggregate (asserted in tests). Unit prices never
    materialize as floats: each effect is a cross-multiplied integer
    rational floored ONCE (r·q products ≤ 10⁹·10⁴ ≪ 2⁶³). One pivoted
    hash agg per part, then a 1-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    per = (
        li.filter(F.date_format("l_shipdate", "yyyy").isin(_PVM_Y0, _PVM_Y1))
        .groupBy("l_partkey", F.date_format("l_shipdate", "yyyy").alias("y"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")).alias("rev"),
        )
    )
    w = per.groupBy("l_partkey").agg(
        F.coalesce(F.max(F.when(F.col("y") == _PVM_Y0, F.col("q"))), F.lit(0)).alias("q0"),
        F.coalesce(F.max(F.when(F.col("y") == _PVM_Y0, F.col("rev"))), F.lit(0)).alias("r0"),
        F.coalesce(F.max(F.when(F.col("y") == _PVM_Y1, F.col("q"))), F.lit(0)).alias("q1"),
        F.coalesce(F.max(F.when(F.col("y") == _PVM_Y1, F.col("rev"))), F.lit(0)).alias("r1"),
    )
    both = (F.col("q0") > 0) & (F.col("q1") > 0)
    price = F.when(both, F.expr("(r1 * q0 - r0 * q1) div q0")).otherwise(0)
    volume = F.when(both, F.expr("(r0 * q1 - r0 * q0) div q0")).otherwise(0)
    delta = F.col("r1") - F.col("r0")
    fx = w.select(
        price.alias("price_eff"),
        volume.alias("volume_eff"),
        (delta - price - volume).alias("mix_eff"),
        delta.alias("delta"),
    )
    return fx.agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("price_eff").cast("long").alias("price_effect_cents"),
        F.sum("volume_eff").cast("long").alias("volume_effect_cents"),
        F.sum("mix_eff").cast("long").alias("mix_residual_cents"),
        F.sum("delta").cast("long").alias("total_delta_cents"),
    )


# ---------------------------------------------------------------------------
# new vs repeat customer revenue split per order year
# ---------------------------------------------------------------------------

_NVR_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y') AS y,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         min(strftime(o_orderdate, '%Y'))
           OVER (PARTITION BY o_custkey) AS first_y
  FROM orders
)
SELECT y,
       CAST(sum(CASE WHEN y = first_y THEN 1 ELSE 0 END) AS BIGINT) AS new_orders,
       CAST(sum(CASE WHEN y = first_y THEN cents ELSE 0 END) AS BIGINT)
         AS new_revenue_cents,
       CAST(sum(CASE WHEN y != first_y THEN 1 ELSE 0 END) AS BIGINT) AS repeat_orders,
       CAST(sum(CASE WHEN y != first_y THEN cents ELSE 0 END) AS BIGINT)
         AS repeat_revenue_cents
FROM o GROUP BY y
"""


@register("new_vs_repeat_revenue", _NVR_SQL)
def new_vs_repeat_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue split between customers in their FIRST year
    (acquisition revenue) and returning customers — the commerce
    health metric that growth_accounting_monthly expresses for users
    and this expresses for money. The first-year flag is one
    per-customer MIN window (no self-join, no expanding rescans);
    everything else is conditional integer sums in the same pass."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.date_format("o_orderdate", "yyyy").alias("y"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.min(F.date_format("o_orderdate", "yyyy"))
        .over(Window.partitionBy("o_custkey"))
        .alias("first_y"),
    )
    is_new = F.col("y") == F.col("first_y")
    return o.groupBy("y").agg(
        F.sum(is_new.cast("int")).cast("long").alias("new_orders"),
        F.sum(F.when(is_new, F.col("cents")).otherwise(0)).cast("long").alias(
            "new_revenue_cents"
        ),
        F.sum((~is_new).cast("int")).cast("long").alias("repeat_orders"),
        F.sum(F.when(~is_new, F.col("cents")).otherwise(0)).cast("long").alias(
            "repeat_revenue_cents"
        ),
    )


# ---------------------------------------------------------------------------
# duplicate-payment audit: same customer, amount, and day
# ---------------------------------------------------------------------------

_DUPPAY_SQL = """
WITH g AS (
  SELECT user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         count(*) AS n,
         min(event_id) AS first_event,
         max(event_id) AS last_event,
         strftime(min(ts), '%Y-%m-%d') AS first_day,
         strftime(max(ts), '%Y-%m-%d') AS last_day
  FROM events
  GROUP BY 1, 2 HAVING count(*) > 1
)
SELECT user_id, cents,
       CAST(n AS BIGINT) AS n_payments,
       CAST(first_event AS BIGINT) AS first_event,
       CAST(last_event AS BIGINT) AS last_event,
       first_day, last_day,
       CAST((n - 1) * cents AS BIGINT) AS exposure_cents
FROM g
"""


@register("duplicate_payment_audit", _DUPPAY_SQL)
def duplicate_payment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment control: payment events from the SAME payer
    for the SAME exact amount — the classic accounts-payable audit
    (beside monetary_unit_sampling's PPS selection and
    benford_digit_audit's digit screen). Exact cents make the amount
    key collision-precise; exposure = (n−1)·amount is the recoverable
    value if all but one are erroneous re-submissions; first/last day
    bound the recurrence window for the reviewer.

    r08 finding: the original orders-based variant was VACUOUS AT
    EVERY SF — o_totalprice is uniform over ~10^7 distinct cents, so a
    (customer, amount, day) collision structurally never occurs; the
    audit belongs on the payment-events stream, whose exponential
    amount distribution concentrates small values exactly like real
    payment ledgers (2 / 42 / 337 / 3310 flagged groups at
    sf0.001/0.01/0.1/1).

    One hash agg with HAVING — map-side combine keeps the shuffle at
    group granularity."""
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.groupBy(
            "user_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
            F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.max("ts"), "yyyy-MM-dd").alias("last_day"),
        )
        .filter(F.col("n") > 1)
    )
    return g.select(
        "user_id",
        "cents",
        F.col("n").cast("long").alias("n_payments"),
        F.col("first_event").cast("long").alias("first_event"),
        F.col("last_event").cast("long").alias("last_event"),
        "first_day",
        "last_day",
        ((F.col("n") - 1) * F.col("cents")).cast("long").alias("exposure_cents"),
    )
