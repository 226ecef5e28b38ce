"""Correlated-subquery / decision-support breadth (SURVEY.md §2.6-2.7
"complete engine" surface): EXISTS / NOT EXISTS, scalar correlated
subqueries, IN-with-HAVING, disjunctive join predicates, left-join
distributions — the TPC-H shapes (q4/q7/q13/q14/q17/q18/q19/q22) the
reference never needed but a replacement engine must answer.

Spark-first stance: every correlated subquery is rewritten to the join
Catalyst would produce anyway — EXISTS → left-semi, NOT EXISTS →
left-anti, scalar per-group subquery → aggregate-then-join, scalar
uncorrelated subquery → broadcast cross-join of a 1-row aggregate. The
oracle SQL keeps the subquery form, proving the rewrite preserves
semantics.

Scale notes (100 TB stance):
- dimension sides (nation, filtered part/customer) are broadcast; the
  fact table never shuffles on those edges.
- q17/q18's per-group aggregates are map-side-partial hash aggs on the
  join key the subsequent join shuffles on anyway — AQE reuses the
  exchange partitioning, no extra pass.
- semi/anti joins ship only the key column of the filtering side.
- money sums go through DECIMAL before aggregation (bit-stable across
  partition orders and vs. the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table


def _dec(col, scale: int = 4):
    return col.cast(f"decimal(18,{scale})")


@register(
    "q4_order_priority",
    sql="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape — correlated EXISTS with an inequality on both
    relations. Spark-first: left-semi join with a composite (equi +
    range) condition; the equi component keys the shuffle, the range
    rides along as a post-probe filter."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    exists = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return exists.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "q7_nation_volume",
    sql="""
SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
       JOIN orders ON o_orderkey = l_orderkey
       JOIN customer ON c_custkey = o_custkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
) GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape — 6-way join with a cross-relation disjunction.
    Spark-first: nation is pre-filtered to the two names BEFORE joining
    (partition-pruning the dimension by hand is free; Catalyst can't
    push a cross-relation OR), both nation sides broadcast, and the
    pair disjunction evaluates after the equi-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue")
    )


@register(
    "q13_customer_distribution",
    sql="""
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape — left outer join preserved under a two-level
    aggregation (customers with zero orders land in the c_count=0
    bucket). The second groupBy's key cardinality is tiny, so the
    second exchange is negligible."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    sql="""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6)
       AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape — conditional-aggregate ratio. The date filter
    pushes to the lineitem scan; part joins broadcast; one map-side
    partial agg, one 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias("promo"),
        F.sum(rev).alias("total"),
    )
    return agg.select(
        F.round(
            100.0 * F.col("promo").cast("double") / F.col("total").cast("double"), 6
        ).alias("promo_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    sql="""
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
       AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape — scalar subquery correlated per part. Spark-
    first rewrite: the per-part threshold is a hash aggregate computed
    once and joined back; the brand filter semi-prunes the aggregate's
    input first so the threshold pass only touches the brand's parts
    (at 100 TB that's the difference between scanning one brand and
    scanning the corpus)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    brand_li = li.join(p, li.l_partkey == F.col("p_partkey"), "left_semi")
    thresh = brand_li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    small = brand_li.join(thresh, "l_partkey").filter(
        F.col("l_quantity") < F.col("qty_thresh")
    )
    return small.agg(
        F.round(
            F.sum(_dec(F.col("l_extendedprice"), 2)).cast("double") / 7.0, 6
        ).alias("avg_yearly")
    )


@register(
    "q18_large_orders",
    sql="""
SELECT c_name, c_custkey, o_orderkey, year(o_orderdate) AS o_year,
       o_totalprice, round(sum_qty, 6) AS sum_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
     JOIN orders ON o_orderkey = l_orderkey
     JOIN customer ON c_custkey = o_custkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape — IN over a HAVING subquery. Spark-first: the
    subquery IS the driving table (aggregate once, filter, join the
    survivors) instead of TPC-H's re-join-and-re-group formulation;
    the handful of qualifying orders then broadcasts into orders."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.year("o_orderdate").alias("o_year"),
            "o_totalprice",
            F.round("sum_qty", 6).alias("sum_qty"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    sql="""
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
       AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape — disjunction spanning both join sides. The
    brand∈{...} and quantity-range envelopes are implied single-table
    prefilters Catalyst derives from the OR; part broadcasts, so each
    lineitem row tests the three-way predicate against an in-memory
    hash row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    j = li.join(p, li.l_partkey == p.p_partkey)

    def arm(brand, smax, qlo, qhi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )

    j = j.filter(
        arm("Brand#1", 15, 1, 21) | arm("Brand#13", 25, 10, 30) | arm("Brand#20", 35, 20, 40)
    )
    return j.agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue")
    )


@register(
    "q22_idle_customers",
    sql="""
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape — uncorrelated scalar subquery + NOT EXISTS.
    Spark-first: the global average is a 1-row aggregate broadcast via
    cross-join (no driver round-trip, stays one lazy plan); NOT EXISTS
    is a left-anti join that ships only o_custkey of the date-filtered
    orders."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.sum(_dec(F.col("c_acctbal"), 2)).cast("double").alias("totacctbal"),
    )
