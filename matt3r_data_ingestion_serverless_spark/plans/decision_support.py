"""Decision-support breadth, part 2 — the remaining classic TPC-H
shapes (q2/q8/q9/q11/q15/q16/q20/q21), adapted to the driver star
schema (no partsupp table, no commit/receipt dates: lineitem is the
part↔supplier link, l_returnflag='R' stands in for "failed to deliver").

Complements plans/subqueries.py (q4/q7/q13/q14/q17/q18/q19/q22) —
together the full TPC-H pattern family is oracle-checked: correlated
scalar MIN (q2), market-share ratio over a two-role dimension (q8),
profit decomposition (q9), group-vs-global-fraction HAVING (q11),
view + scalar MAX (q15), NOT IN + count-distinct (q16), nested
IN-over-aggregate (q20), and the EXISTS/NOT-EXISTS self-join pair (q21).

Spark-first stance, as in subqueries.py: every subquery becomes the
join/aggregate Catalyst would produce — correlated MIN → per-key
aggregate joined back, scalar global → 1-row broadcast cross-join,
NOT IN (non-null keys) → left-anti, EXISTS-pair over the same relation
→ one aggregate pass computing both existence facts (q21 reads
lineitem ONCE for the order stats where the literal form self-joins it
twice more).

Scale notes (100 TB stance):
- part/supplier/nation/region sides broadcast after their filters;
  lineitem never shuffles on a dimension edge.
- q2/q15's per-key aggregate shares its shuffle key with the join that
  consumes it (AQE reuses the exchange).
- q21's rewrite turns two extra fact-table shuffles (the EXISTS and
  NOT EXISTS probes) into one groupBy over the already-shuffled key.
- doubles are rounded at 6 dp in both dialects; money math goes
  through DECIMAL before summation (bit-stable across partitionings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table


def _dec(col, scale: int = 4):
    return col.cast(f"decimal(18,{scale})")


def _suppliers_in_region(spark: SparkSession, sf_dir: str, r_name: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == r_name)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q2_min_cost_supplier",
    # unit_price rounds via the explicit floor formula ON BOTH SIDES,
    # not round(): quotients land near .5 at the 7th digit whenever
    # quantity is a power of two, and there Spark's round() (rounds the
    # SHORTEST DECIMAL repr via BigDecimal.valueOf) and DuckDB's
    # (rounds the BINARY value) disagree. One shared formula = one
    # IEEE evaluation = identical everywhere (caught by the sf0.1
    # parity sweep).
    sql="""
WITH offers AS (
  SELECT DISTINCT l_partkey, l_suppkey,
         sign(CAST(l_extendedprice AS DOUBLE) / l_quantity)
           * floor(abs(CAST(l_extendedprice AS DOUBLE) / l_quantity) * 1e6 + 0.5)
           / 1e6 AS unit_price
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON n_nationkey = s_nationkey
         JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE')
)
SELECT p_partkey, p_brand, s_name, n_name, unit_price AS min_unit_price
FROM offers
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
WHERE p_size <= 12 AND p_type = 'LARGE'
  AND unit_price = (SELECT min(unit_price) FROM offers o2
                    WHERE o2.l_partkey = offers.l_partkey)
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape — correlated scalar MIN over the supplier-offer
    relation (lineitem stands in for partsupp). Spark-first: the
    per-part minimum is a hash aggregate joined back on the same key
    the offers already shuffled on; region pruning applies BEFORE the
    aggregate so the min is computed only over eligible suppliers."""
    eur = _suppliers_in_region(spark, sf_dir, "EUROPE")
    q = F.col("l_extendedprice").cast("double") / F.col("l_quantity")
    up = F.signum(q) * F.floor(F.abs(q) * 1e6 + 0.5) / 1e6
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        up.alias("unit_price"),
    )
    offers = (
        li.join(F.broadcast(eur.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .distinct()
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 12) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_brand")
    )
    offers = offers.join(p, offers.l_partkey == p.p_partkey, "inner")
    min_per_part = offers.groupBy("l_partkey").agg(F.min("unit_price").alias("min_up"))
    best = offers.join(min_per_part, "l_partkey").filter(
        F.col("unit_price") == F.col("min_up")
    )
    return best.join(F.broadcast(eur), best.l_suppkey == eur.s_suppkey).select(
        "p_partkey",
        "p_brand",
        "s_name",
        "n_name",
        F.col("unit_price").alias("min_unit_price"),
    )


@register(
    "q8_market_share",
    sql="""
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
         n1.n_name AS supp_nation
  FROM part JOIN lineitem ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN orders ON o_orderkey = l_orderkey
       JOIN customer ON c_custkey = o_custkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
       JOIN region ON r_regionkey = n2.n_regionkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape — one nation's share of regional volume per year.
    nation plays two roles (supplier side, customer side); both are
    broadcast under distinct aliases. The share is a conditional-sum /
    total-sum ratio computed in ONE aggregate pass (no second scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(F.col("n_nationkey").alias("c_nk"))
    )
    n1 = F.broadcast(
        n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = (
        li.join(p, li.l_partkey == F.col("p_partkey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0))).alias("nat"),
        F.sum(vol).alias("tot"),
    )
    return agg.select(
        "o_year",
        F.round(F.col("nat").cast("double") / F.col("tot").cast("double"), 6).alias("mkt_share"),
    )


@register(
    "q9_product_type_profit",
    sql="""
SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
           - CAST(0.6 * p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount
  FROM part JOIN lineitem ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN orders ON o_orderkey = l_orderkey
       JOIN nation ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%red%'
)
GROUP BY nation, o_year
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape — profit decomposition by supplier nation × year.
    Cost proxy = 0.6 × p_retailprice × quantity (no partsupp table).
    The p_name LIKE filter can't push below the join, but the filtered
    part side broadcasts so lineitem is pruned in the probe."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    amount = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))) - _dec(
        0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(n, F.col("s_nationkey") == n.n_nationkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(F.sum(amount).cast("double").alias("sum_profit"))


@register(
    "q11_important_part_value",
    sql="""
WITH partval AS (
  SELECT l_partkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS val
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS part_value
FROM partval
WHERE val > (SELECT sum(val) * 2.0 / count(*) FROM partval)
""",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape — groups whose value exceeds a threshold derived
    from a scalar subquery over the same derived table (HAVING against
    the global aggregate). TPC-H's FRACTION is spec-scaled as
    0.0001/SF precisely because a FIXED fraction starves as the part
    count grows — our original 0.002 returned 0 rows at sf1 (found by
    the round-9 sf1 sweep). The scale-free equivalent: "important" =
    value above 2x the MEAN per-part value, which flags the same
    heavy-tail parts at every SF. Spark-first: the per-part aggregate
    is computed once and reused for both the threshold (1-row
    re-aggregate, broadcast cross-join) and the filter — no second
    scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    )
    partval = (
        li.join(nat_supp, li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("val"))
    )
    thresh = partval.agg((F.sum("val") * 2.0 / F.count(F.lit(1))).alias("cut"))
    return (
        partval.crossJoin(F.broadcast(thresh))
        .filter(F.col("val") > F.col("cut"))
        .select(F.col("l_partkey").alias("partkey"), F.col("val").cast("double").alias("part_value"))
    )


@register(
    "q15_top_supplier",
    sql="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape — the view + scalar MAX pattern. The revenue
    aggregate is computed once; the max is a 1-row re-aggregate
    broadcast back. DECIMAL revenue makes the equality comparison
    exact (double summation order could otherwise split the max)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("best"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("best"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@register(
    "q16_part_supplier_counts",
    sql="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape — NOT IN exclusion + count(DISTINCT) per group.
    Spark-first: NOT IN over a non-null key list is a left-anti join
    (ships only the excluded-supplier keys, broadcast); the distinct
    count is a two-phase hash aggregate (partial distinct map-side)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = F.broadcast(
        load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_heavy_suppliers",
    sql="""
WITH shipped AS (
  SELECT l_suppkey, CAST(sum(l_quantity) AS DOUBLE) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
)
SELECT s_name, n_name
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM shipped
                    WHERE qty > (SELECT 0.5 * avg(qty) FROM shipped))
""",
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape — IN over a nested aggregate-with-threshold
    subquery (availqty → shipped-quantity proxy). Spark-first: the
    shipped aggregate is reused for both the global average (1-row
    broadcast) and the qualifying-supplier set (left-semi into
    supplier); lineitem is scanned exactly once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    shipped = (
        li.join(p, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("double").alias("qty"))
    )
    cut = shipped.agg((0.5 * F.avg("qty")).alias("cut"))
    heavy = (
        shipped.crossJoin(F.broadcast(cut))
        .filter(F.col("qty") > F.col("cut"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(n, s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    sql="""
SELECT s_name, count(*) AS numwait
FROM supplier
  JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
  JOIN orders ON o_orderkey = l1.l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_1'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape — the EXISTS / NOT EXISTS self-join pair
    (multi-supplier order where exactly this supplier "failed";
    l_returnflag='R' proxies the late-delivery predicate, which needs
    receipt dates this schema doesn't carry). Spark-first rewrite: the
    two correlated probes collapse into ONE aggregate over lineitem —
    per order, (distinct suppliers, distinct R-flag suppliers); l1
    qualifies iff n_supp ≥ 2 and n_r_supp = 1 (l1 itself is R, so
    being the only R-supplier ⇔ NOT EXISTS another). Two fact-table
    shuffles become one groupBy on the join key."""
    li = load_table(spark, sf_dir, "lineitem")
    ordstats = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    sn = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    qualified = (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(ordstats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(sn, l1.l_suppkey == sn.s_suppkey)
    )
    return qualified.groupBy("s_name").agg(F.count("*").alias("numwait"))


@register(
    "q12_shipmode_priority",
    sql="""
SELECT l_linestatus AS ship_mode,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_mode
""",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape — conditional priority counts per shipping class
    (l_linestatus stands in for l_shipmode; the returnflag + shipdate
    range stands in for the commit/receipt-date lateness predicate).
    Completes the 22-query TPC-H pattern family.

    Spark-first: the returnflag/shipdate predicates push into the
    lineitem scan (PushedFilters); orders projects only
    (o_orderkey, o_orderpriority) before the join, and the priority
    split is a conditional map-side partial aggregate — one shuffle on
    l_orderkey for the fact-fact join, one on the single-value group
    key. At 100 TB the shipdate range prunes partitions before any
    join work."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
