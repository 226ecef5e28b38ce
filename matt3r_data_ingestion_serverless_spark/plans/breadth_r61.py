"""Round-2 batch 36 (this run): RATIO_TO_REPORT window shares and the
printf/format string surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# RATIO_TO_REPORT: each supplier's share of its nation's revenue
# ---------------------------------------------------------------------------

_RTR_SQL = f"""
WITH rev AS (
  SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
         sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT)) AS cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
r AS (
  SELECT nationkey, suppkey, cents,
         (cents * 1000000) // sum(cents) OVER (PARTITION BY nationkey) AS share_micro,
         rank() OVER (PARTITION BY nationkey ORDER BY cents DESC, suppkey) AS rk
  FROM rev
)
SELECT nationkey, suppkey, CAST(cents AS BIGINT) AS cents,
       CAST(share_micro AS BIGINT) AS share_micro,
       CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 5
"""


@register("ratio_to_report_window", _RTR_SQL)
def ratio_to_report_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT semantics — each top-5 supplier's share of its
    nation's revenue, computed as the row value divided by a window
    SUM over the partition (the Oracle/Teradata reporting function
    both engines spell as an expression). The share is a TRUE integer
    division against the window total so every row is engine-exact;
    the per-nation rank and the share ride the SAME partition — one
    Exchange. The detail-grain percent-of-total complements
    pct_of_parent_rollup's aggregated levels."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
                ).cast("long")
            ).alias("cents")
        )
    )
    wp = Window.partitionBy("nationkey")
    r = rev.select(
        "nationkey",
        "suppkey",
        "cents",
        (F.col("cents") * 1000000).alias("_num"),
        F.sum("cents").over(wp).alias("_tot"),
        F.rank()
        .over(Window.partitionBy("nationkey").orderBy(F.desc("cents"), F.asc("suppkey")))
        .alias("rk"),
    ).select(
        "nationkey",
        "suppkey",
        F.col("cents").cast("long").alias("cents"),
        F.expr("_num div _tot").cast("long").alias("share_micro"),
        F.col("rk").cast("long").alias("rk"),
    )
    return r.filter(F.col("rk") <= 5)


# ---------------------------------------------------------------------------
# printf / string formatting surface
# ---------------------------------------------------------------------------

_FMT_SQL = """
SELECT printf('INV-%08d', o_orderkey) AS invoice_no,
       printf('%s/%s', o_orderpriority, o_orderstatus) AS status_key,
       printf('%.2f', o_totalprice) AS amount_str,
       lpad(CAST(o_custkey AS VARCHAR), 10, '0') AS cust_padded,
       CAST(len(printf('INV-%08d', o_orderkey)) AS BIGINT) AS key_len
FROM orders WHERE o_orderkey % 997 = 0
"""


@register("string_format_surface", _FMT_SQL)
def string_format_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting surface — zero-padded invoice numbers,
    composed status keys, fixed-decimal amount strings, and lpad — the
    key-construction idioms every export/reconciliation job uses
    (table_checksum_reconciliation depends on exactly this class of
    canonical string). Spark's format_string and DuckDB's printf share
    C semantics, so '%08d' and '%.2f' render identically (prices have
    2 dp — no rounding ambiguity at the printed precision). Pure
    scan-stage projection on a pushed-down key filter."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 997 == 0).select(
        F.format_string("INV-%08d", F.col("o_orderkey")).alias("invoice_no"),
        F.format_string("%s/%s", F.col("o_orderpriority"), F.col("o_orderstatus")).alias(
            "status_key"
        ),
        F.format_string("%.2f", F.col("o_totalprice")).alias("amount_str"),
        F.lpad(F.col("o_custkey").cast("string"), 10, "0").alias("cust_padded"),
        F.length(F.format_string("INV-%08d", F.col("o_orderkey")))
        .cast("long")
        .alias("key_len"),
    )
