"""Round-2 batch 41 (this run): single-source supplier risk and a
consolidation what-if on market concentration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# single-source part risk
# ---------------------------------------------------------------------------

_SINGLE_SQL = """
WITH ps AS (
  SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
           AS cents
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT sum(cents) AS total, count(*) AS n_parts FROM ps)
SELECT CAST(max(t.n_parts) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN ps.n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS single_source_parts,
       CAST(sum(CASE WHEN ps.n_suppliers = 1 THEN ps.cents ELSE 0 END) AS BIGINT)
         AS at_risk_cents,
       CAST((sum(CASE WHEN ps.n_suppliers = 1 THEN ps.cents ELSE 0 END) * 1000000)
            // max(t.total) AS BIGINT) AS at_risk_share_micro,
       CAST(max(ps.n_suppliers) AS BIGINT) AS max_suppliers_per_part
FROM ps CROSS JOIN t
"""


@register("single_source_parts_risk", _SINGLE_SQL)
def single_source_parts_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procurement-risk audit: parts whose entire observed volume
    flows through ONE supplier, with the revenue share at risk — the
    supply-chain fragility number beside hhi_concentration's market
    view (concentration measures power; this measures redundancy).
    One part-grain agg with a count-distinct, then a conditional
    rollup; the at-risk share is a true integer division of exact
    cents."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey").agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
            ).cast("long")
        ).alias("cents"),
    )
    t = ps.agg(F.sum("cents").alias("total"), F.count("*").alias("n_parts"))
    j = ps.crossJoin(F.broadcast(t))
    single = F.when(F.col("n_suppliers") == 1, 1).otherwise(0)
    at_risk = F.when(F.col("n_suppliers") == 1, F.col("cents")).otherwise(0)
    return j.agg(
        F.max("n_parts").cast("long").alias("n_parts"),
        F.sum(single).cast("long").alias("single_source_parts"),
        F.sum(at_risk).cast("long").alias("at_risk_cents"),
        F.expr(
            "(sum(CASE WHEN n_suppliers = 1 THEN cents ELSE 0 END) * 1000000)"
            " div max(total)"
        )
        .cast("long")
        .alias("at_risk_share_micro"),
        F.max("n_suppliers").cast("long").alias("max_suppliers_per_part"),
    )


# ---------------------------------------------------------------------------
# consolidation what-if: each part's volume moves to its top supplier
# ---------------------------------------------------------------------------

_WHATIF_SQL = """
WITH flow AS (
  SELECT s.s_nationkey AS nationkey, l.l_partkey, l.l_suppkey,
         sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT)) AS cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_partkey, l.l_suppkey
),
ranked AS (
  SELECT nationkey, l_partkey, l_suppkey, cents,
         row_number() OVER (PARTITION BY nationkey, l_partkey
                            ORDER BY cents DESC, l_suppkey) AS rn,
         sum(cents) OVER (PARTITION BY nationkey, l_partkey) AS part_cents
  FROM flow
),
winner AS (
  SELECT nationkey, l_partkey, l_suppkey AS top_supp, part_cents
  FROM ranked WHERE rn = 1
),
before_rev AS (
  SELECT nationkey, l_suppkey AS suppkey, sum(cents) AS cents
  FROM flow GROUP BY nationkey, l_suppkey
),
after_rev AS (
  SELECT nationkey, top_supp AS suppkey, sum(part_cents) AS cents
  FROM winner GROUP BY nationkey, top_supp
),
tot AS (SELECT nationkey, sum(cents) AS total FROM before_rev GROUP BY nationkey),
hb AS (
  SELECT b.nationkey,
         sum(((b.cents * 1000000) // t.total) * ((b.cents * 1000000) // t.total)) AS h
  FROM before_rev b JOIN tot t USING (nationkey) GROUP BY b.nationkey
),
ha AS (
  SELECT a.nationkey,
         sum(((a.cents * 1000000) // t.total) * ((a.cents * 1000000) // t.total)) AS h
  FROM after_rev a JOIN tot t USING (nationkey) GROUP BY a.nationkey
)
SELECT hb.nationkey,
       CAST(hb.h AS BIGINT) AS hhi_before_sq_micro,
       CAST(ha.h AS BIGINT) AS hhi_after_sq_micro,
       CAST(ha.h - hb.h AS BIGINT) AS hhi_delta_sq_micro
FROM hb JOIN ha USING (nationkey)
"""


@register("consolidation_what_if_hhi", _WHATIF_SQL)
def consolidation_what_if_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scenario query: if every part consolidated its volume onto its
    current TOP supplier (the procurement-consolidation playbook), how
    much does each nation's supplier concentration rise? HHI (as
    Σshare_micro², the integer form from hhi_concentration) is
    computed on the observed flows and on the counterfactual
    reallocation, and the delta is the negotiation-leverage-vs-
    fragility tradeoff quantified. The winner per (nation, part) is a
    deterministic rank-1 on (cents DESC, suppkey); shares use
    true integer division throughout — the whole what-if is
    engine-exact. Same two-agg + broadcast shape as HHI, run twice on
    the SAME part-grain flow table."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    flow = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            "l_partkey",
            "l_suppkey",
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
                ).cast("long")
            ).alias("cents")
        )
    )
    flow = flow.localCheckpoint(eager=True)
    wpart = Window.partitionBy("nationkey", "l_partkey")
    winner = (
        flow.select(
            "nationkey",
            "l_partkey",
            F.col("l_suppkey").alias("top_supp"),
            F.row_number()
            .over(wpart.orderBy(F.desc("cents"), F.asc("l_suppkey")))
            .alias("rn"),
            F.sum("cents").over(wpart).alias("part_cents"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    before_rev = flow.groupBy("nationkey", F.col("l_suppkey").alias("suppkey")).agg(
        F.sum("cents").alias("cents")
    )
    after_rev = winner.groupBy("nationkey", F.col("top_supp").alias("suppkey")).agg(
        F.sum("part_cents").alias("cents")
    )
    tot = before_rev.groupBy("nationkey").agg(F.sum("cents").alias("total"))

    def hhi(rev: DataFrame) -> DataFrame:
        share = F.expr("(cents * 1000000) div total")
        return (
            rev.join(F.broadcast(tot), "nationkey")
            .select("nationkey", share.alias("sh"))
            .groupBy("nationkey")
            .agg(F.sum(F.col("sh") * F.col("sh")).alias("h"))
        )

    hb = hhi(before_rev).withColumnRenamed("h", "hb")
    ha = hhi(after_rev).withColumnRenamed("h", "ha")
    return hb.join(ha, "nationkey").select(
        "nationkey",
        F.col("hb").cast("long").alias("hhi_before_sq_micro"),
        F.col("ha").cast("long").alias("hhi_after_sq_micro"),
        (F.col("ha") - F.col("hb")).cast("long").alias("hhi_delta_sq_micro"),
    )
