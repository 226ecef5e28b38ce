"""Round-2 batch 32 (this run): OTIF service level and a T5-style
span-corruption masking plan.

Masking decisions come from the md5 hash contract (engine-portable);
everything else is integer flags and window transitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import hashing
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# on-time-in-full service level per priority
# ---------------------------------------------------------------------------

_OTIF_DAYS = 30

_OTIF_SQL = f"""
WITH lines AS (
  SELECT l_orderkey,
         max(datediff('day', CAST(strftime(o.o_orderdate, '%Y-%m-%d') AS DATE),
                      CAST(strftime(l.l_shipdate, '%Y-%m-%d') AS DATE))) AS worst_days,
         count(*) AS n_lines,
         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned,
         max(o.o_orderpriority) AS priority
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l_orderkey
),
f AS (
  SELECT priority,
         CASE WHEN worst_days <= {_OTIF_DAYS} AND n_returned = 0 THEN 1 ELSE 0 END
           AS otif
  FROM lines
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(otif) AS BIGINT) AS n_otif,
       CAST((sum(otif) * 1000000) // count(*) AS BIGINT) AS otif_share_micro,
       {round6_sql("CAST(sum(otif) AS DOUBLE) / count(*)")} AS otif_rate
FROM f GROUP BY priority
"""


@register("otif_service_level", _OTIF_SQL)
def otif_service_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTIF (on-time-in-full) service level per order priority — an
    order scores only if its SLOWEST line ships within 30 days AND no
    line is returned (the all-or-nothing supply-chain KPI; the binary
    twin of leadtime_percentiles_by_priority's distribution view). One
    line-grain agg per order (worst lead, return count) before any
    rollup, then a conditional share with the exact integer
    micro-rate beside the double."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    lines = j.groupBy("l_orderkey").agg(
        F.max(
            F.datediff(
                F.to_date(F.date_format("l_shipdate", "yyyy-MM-dd")),
                F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd")),
            )
        ).alias("worst_days"),
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
        F.max("o_orderpriority").alias("priority"),
    )
    f = lines.select(
        "priority",
        F.when(
            (F.col("worst_days") <= _OTIF_DAYS) & (F.col("n_returned") == 0), 1
        )
        .otherwise(0)
        .alias("otif"),
    )
    return f.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("otif").cast("long").alias("n_otif"),
        F.expr("(sum(otif) * 1000000) div count(*)").cast("long").alias(
            "otif_share_micro"
        ),
        round6(F.sum("otif").cast("double") / F.count("*")).alias("otif_rate"),
    )


# ---------------------------------------------------------------------------
# deterministic T5-style span-corruption masking plan
# ---------------------------------------------------------------------------

_MASK_PCT = 15

_SPAN_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(range(1, n_tok + 1)) AS pos
  FROM (SELECT doc_id,
               len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
        FROM documents)
),
m AS (
  SELECT doc_id, pos,
         CASE WHEN {hashing.md5_hash64_sql("concat('mask', doc_id, ':', pos)")}
                   % 100 < {_MASK_PCT} THEN 1 ELSE 0 END AS masked
  FROM toks
),
w AS (
  SELECT doc_id, masked,
         coalesce(lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), 0) AS prev
  FROM m
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(masked) AS BIGINT) AS n_masked,
       CAST(sum(CASE WHEN masked = 1 AND prev = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_spans,
       CAST((sum(masked) * 1000000) // count(*) AS BIGINT) AS corruption_micro
FROM w GROUP BY doc_id
"""


@register("ns_span_corruption_plan", _SPAN_SQL)
def ns_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption masking plan: each token position is
    masked with 15% probability drawn from the md5 hash contract
    (REPRODUCIBLE across engines and runs — the property a pretraining
    data pipeline needs so a restarted job masks identically), and
    contiguous masked runs collapse into sentinel spans. Per document:
    token count, masked count, span count (0→1 transitions via one
    lag window), and the realized corruption rate as an integer
    micro-share. The position grid comes from a bounded range explode
    gated by each doc's token count — no UDF, no Python."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_tok"),
    ).select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.col("n_tok"))).alias("pos")
    )
    masked = (
        hashing.md5_hash64(
            F.concat(F.lit("mask"), F.col("doc_id"), F.lit(":"), F.col("pos"))
        )
        % 100
        < _MASK_PCT
    ).cast("int")
    m = toks.select("doc_id", "pos", masked.alias("masked"))
    w = m.select(
        "doc_id",
        "masked",
        F.coalesce(
            F.lag("masked").over(Window.partitionBy("doc_id").orderBy("pos")), F.lit(0)
        ).alias("prev"),
    )
    return w.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("masked").cast("long").alias("n_masked"),
        F.sum(F.when((F.col("masked") == 1) & (F.col("prev") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_spans"),
        F.expr("(sum(masked) * 1000000) div count(*)").cast("long").alias(
            "corruption_micro"
        ),
    )
