"""Round-2 batch 3 (this run): market-concentration HHI, behavioral
trigram motifs, month-end backlog snapshots, DECIMAL money aggregates,
a Kolmogorov–Smirnov uniformity test, and reciprocal-rank fusion.

Determinism per SCALE.md §7: integer cents / micro-unit shares with
TRUE integer division (`div` / `//`), cross-multiplied rationals for
the KS sup-statistic, and RRF weights as pure integer quotients — no
float enters any ordering or argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import vectors
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# Herfindahl–Hirschman market concentration per nation
# ---------------------------------------------------------------------------

_HHI_SQL = f"""
WITH rev AS (
  SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
         sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT)) AS cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
tot AS (SELECT nationkey, sum(cents) AS total FROM rev GROUP BY nationkey),
sh AS (
  SELECT r.nationkey, r.suppkey, (r.cents * 1000000) // t.total AS share_micro,
         row_number() OVER (PARTITION BY r.nationkey
                            ORDER BY r.cents DESC, r.suppkey) AS rk
  FROM rev r JOIN tot t USING (nationkey)
)
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(max(t.total) AS BIGINT) AS total_cents,
       {round6_sql("CAST(sum(share_micro * share_micro) AS DOUBLE) / 1e12")} AS hhi,
       CAST(max(share_micro) AS BIGINT) AS top_share_micro,
       CAST(sum(CASE WHEN rk <= 4 THEN share_micro ELSE 0 END) AS BIGINT)
         AS cr4_micro
FROM sh JOIN tot t USING (nationkey) JOIN nation n ON sh.nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("hhi_concentration", _HHI_SQL)
def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation,
    with the top-1 share and CR4 (top-4 concentration ratio). Revenue
    aggregates as exact integer cents; each supplier's share is
    quantized to micro-units by TRUE integer division (cents·10⁶ //
    total — never a float divide, so bin-edge and overflow behavior is
    identical across engines and Σshare² stays far inside int64 where
    Σcents² would overflow at sf0.1+). Two hash aggregations sharing
    the nation partitioning plus one broadcast of 25 nation totals."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast(
        "long"
    )
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(cents).alias("cents"))
    )
    tot = rev.groupBy("nationkey").agg(F.sum("cents").alias("total"))
    sh = (
        rev.join(F.broadcast(tot), "nationkey")
        .withColumn("share_micro", F.expr("(cents * 1000000) div total"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("nationkey").orderBy(F.desc("cents"), F.asc("suppkey"))
            ),
        )
    )
    return (
        sh.join(F.broadcast(nat), sh.nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.max("total").cast("long").alias("total_cents"),
            round6(
                F.sum(F.col("share_micro") * F.col("share_micro")).cast("double") / 1e12
            ).alias("hhi"),
            F.max("share_micro").cast("long").alias("top_share_micro"),
            F.sum(F.when(F.col("rk") <= 4, F.col("share_micro")).otherwise(0))
            .cast("long")
            .alias("cr4_micro"),
        )
    )


# ---------------------------------------------------------------------------
# behavioral trigram motifs over per-user event sequences
# ---------------------------------------------------------------------------

_TRIGRAM_K = 25

_TRIGRAM_SQL = f"""
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
  FROM events GROUP BY user_id
),
tri AS (
  SELECT user_id,
         unnest(list_transform(range(1, len(types) - 1),
                               i -> types[i] || '>' || types[i + 1] || '>' || types[i + 2]))
           AS motif
  FROM seq WHERE len(types) >= 3
)
SELECT motif,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM tri
GROUP BY motif
ORDER BY n_occurrences DESC, motif
LIMIT {_TRIGRAM_K}
"""


@register("event_sequence_ngrams", _TRIGRAM_SQL)
def event_sequence_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral trigram motifs (adjacent event-type 3-grams in
    each user's time-ordered stream) with occurrence and user-reach
    counts — the sequence-mining step behind funnel discovery, one
    level up from event_transition_matrix's bigrams. The sequence is
    ONE ordered list aggregation per user (sort_array over a (ts, id,
    type) struct — the per-key sort shuffles once and never globally);
    trigram expansion is a pure array transform, so everything before
    the final count is map-side after the user shuffle. DuckDB range()
    excludes its upper bound: range(1, n−1) yields starts 1..n−2,
    matching Spark's sequence(1, n−2)."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ).alias("types")
    )
    tri = seq.filter(F.size("types") >= 3).select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("types") - 2),
                lambda i: F.concat_ws(
                    ">",
                    F.element_at(F.col("types"), i),
                    F.element_at(F.col("types"), i + 1),
                    F.element_at(F.col("types"), i + 2),
                ),
            )
        ).alias("motif"),
    )
    return (
        tri.groupBy("motif")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("motif"))
        .limit(_TRIGRAM_K)
    )


# ---------------------------------------------------------------------------
# month-end open-order backlog snapshots
# ---------------------------------------------------------------------------

_BACKLOG_SQL = """
WITH shipped AS (
  SELECT l_orderkey, max(l_shipdate) AS ship_complete FROM lineitem GROUP BY l_orderkey
),
spans AS (
  SELECT o.o_orderkey,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         date_trunc('month', o.o_orderdate) AS m0,
         date_trunc('month', s.ship_complete) AS m1
  FROM orders o JOIN shipped s ON o.o_orderkey = s.l_orderkey
),
grid AS (
  SELECT o_orderkey, cents,
         unnest(generate_series(m0, m1 - INTERVAL 1 MONTH, INTERVAL 1 MONTH)) AS m
  FROM spans WHERE m1 > m0
)
SELECT strftime(m, '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS open_orders,
       CAST(sum(cents) AS BIGINT) AS open_cents
FROM grid
GROUP BY strftime(m, '%Y-%m')
"""


@register("backlog_month_end_snapshot", _BACKLOG_SQL)
def backlog_month_end_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end open-order backlog time series: an order is open at
    the end of month m iff it was placed in or before m and its last
    line shipped in a LATER month — the point-in-time snapshot fact
    every finance close builds from interval data. Implemented by
    exploding each order's [order-month, ship-month) span onto the
    month grid (bounded fan-out ≈ months-open, shrunk AFTER the per-
    order max-shipdate agg), never by joining every order to every
    month. Value mass stays integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    shipped = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("ship_complete"))
    spans = (
        orders.join(shipped, orders.o_orderkey == shipped.l_orderkey)
        .select(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
            F.date_trunc("month", "o_orderdate").alias("m0"),
            F.date_trunc("month", "ship_complete").alias("m1"),
        )
        .filter(F.col("m1") > F.col("m0"))
    )
    grid = spans.select(
        "cents",
        F.explode(
            F.expr("sequence(m0, m1 - interval 1 month, interval 1 month)")
        ).alias("m"),
    )
    return grid.groupBy(F.date_format("m", "yyyy-MM").alias("month")).agg(
        F.count("*").cast("long").alias("open_orders"),
        F.sum("cents").cast("long").alias("open_cents"),
    )


# ---------------------------------------------------------------------------
# DECIMAL(18,2) exact money aggregates
# ---------------------------------------------------------------------------

_DECIMAL_SQL = f"""
WITH d AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         CAST(l_discount AS DECIMAL(18,2)) AS disc
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(price) AS DOUBLE) AS sum_price,
       CAST(min(price) AS DOUBLE) AS min_price,
       CAST(max(price) AS DOUBLE) AS max_price,
       CAST(sum(price * (1 - disc)) AS DOUBLE) AS sum_discounted,
       {round6_sql("CAST(sum(price) AS DOUBLE) / count(*)")} AS avg_price
FROM d
GROUP BY l_returnflag
"""


@register("decimal_money_aggregates", _DECIMAL_SQL)
def decimal_money_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money aggregation on the DECIMAL(18,2) type surface — the
    fixed-point path a financial warehouse actually uses instead of
    doubles. Sums, extrema, and the discounted product accumulate as
    EXACT decimals in both engines (Spark widens to DECIMAL(28,2)/
    (38,6), DuckDB to (38,2)/(38,6) — different containers, identical
    values), so summation order cannot perturb results; only the final
    projection casts to double, and the mean divides the exact decimal
    sum once. Demonstrates overflow-checked decimal arithmetic inside
    whole-stage codegen — no UDF, one partial-aggregated scan."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    d = li.select("l_returnflag", price.alias("price"), disc.alias("disc"))
    agg = d.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("price").alias("sp"),
        F.min("price").alias("mn"),
        F.max("price").alias("mx"),
        F.sum(F.col("price") * (F.lit(1).cast("decimal(18,2)") - F.col("disc"))).alias("sd"),
    )
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.col("sp").cast("double").alias("sum_price"),
        F.col("mn").cast("double").alias("min_price"),
        F.col("mx").cast("double").alias("max_price"),
        F.col("sd").cast("double").alias("sum_discounted"),
        round6(F.col("sp").cast("double") / F.col("n")).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Kolmogorov–Smirnov one-sample test against Uniform(0, 500)
# ---------------------------------------------------------------------------

_KS_HI = 50000  # 500.00 in cents — the uniform upper bound

_KS_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
pts AS (
  SELECT event_type, cents, count(*) AS cnt FROM v GROUP BY event_type, cents
),
e AS (
  SELECT event_type, cents, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM pts
),
d AS (
  SELECT event_type, cents, n,
         greatest(abs(cum * {_KS_HI} - cents * n),
                  abs((cum - cnt) * {_KS_HI} - cents * n)) AS num
  FROM e
),
mx AS (SELECT event_type, max(num) AS mnum, max(n) AS n FROM d GROUP BY event_type)
SELECT m.event_type,
       CAST(m.n AS BIGINT) AS n,
       {round6_sql("CAST(m.mnum AS DOUBLE) / (CAST(m.n AS DOUBLE) * " + str(_KS_HI) + ")")}
         AS d_stat,
       CAST(max(d.cents) AS BIGINT) AS d_at_cents
FROM mx m JOIN d ON d.event_type = m.event_type AND d.num = m.mnum
GROUP BY m.event_type, m.n, m.mnum
"""


@register("ks_uniform_test", _KS_SQL)
def ks_uniform_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample Kolmogorov–Smirnov sup-statistic of each event type's
    value distribution against Uniform(0, 500): D = sup|F̂ − F| taken
    at both ECDF sides of every jump. The comparison is fully
    cross-multiplied — |cum·HI − cents·n| over integer cents — so the
    argmax and the tie-broken location are engine-exact; the single
    division happens once per type at the end. Distinct-value shrink
    (≤ 50k cents points) happens BEFORE the cumulative window, which is
    how an exact ECDF sup-test stays feasible at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents")
    ).groupBy("event_type", "cents").agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = pts.select(
        "event_type",
        "cents",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    num = F.greatest(
        F.abs(F.col("cum") * _KS_HI - F.col("cents") * F.col("n")),
        F.abs((F.col("cum") - F.col("cnt")) * _KS_HI - F.col("cents") * F.col("n")),
    )
    d = e.select("event_type", "cents", "n", num.alias("num"))
    mx = d.groupBy("event_type").agg(F.max("num").alias("mnum"), F.max("n").alias("n"))
    joined = d.drop("n").join(
        F.broadcast(mx.withColumnRenamed("event_type", "et")),
        (F.col("event_type") == F.col("et")) & (F.col("num") == F.col("mnum")),
    )
    return (
        joined.groupBy("event_type", "mnum")
        .agg(F.max("n").alias("n"), F.max("cents").alias("d_at_cents"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            round6(F.col("mnum").cast("double") / (F.col("n").cast("double") * _KS_HI)).alias(
                "d_stat"
            ),
            F.col("d_at_cents").cast("long").alias("d_at_cents"),
        )
    )


# ---------------------------------------------------------------------------
# reciprocal-rank fusion of two retrieval rankings
# ---------------------------------------------------------------------------

_RRF_C = 60
_RRF_DEPTH = 50  # fuse the top-50 of each ranking
_RRF_K = 10
_RRF_DIMS = 16


def _rrf_sql() -> str:
    full_cos = f"{vectors.dot_sql('q.v', 'c.v')} / (q.nrm * c.nrm)"
    tr_cos = f"{vectors.dot_sql('q.tv', 'c.tv')} / (q.tnrm * c.tnrm)"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, {vectors.l2_norm_sql('v')} AS nrm,
             list_slice(v, 1, {_RRF_DIMS}) AS tv
      FROM e),
t AS (SELECT vec_id, v, nrm, tv,
             sqrt(list_reduce(list_transform(tv, x -> x * x), (a, b) -> a + b)) AS tnrm
      FROM n),
q AS (SELECT * FROM t WHERE vec_id % 100 = 7),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         {round6_sql(full_cos)} AS fc, {round6_sql(tr_cos)} AS tc
  FROM q JOIN t c ON c.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, match_id,
         row_number() OVER (PARTITION BY query_id ORDER BY fc DESC, match_id) AS ra,
         row_number() OVER (PARTITION BY query_id ORDER BY tc DESC, match_id) AS rb
  FROM scored
),
fused AS (
  SELECT query_id, match_id,
         (CASE WHEN ra <= {_RRF_DEPTH} THEN 1000000 // ({_RRF_C} + ra) ELSE 0 END)
       + (CASE WHEN rb <= {_RRF_DEPTH} THEN 1000000 // ({_RRF_C} + rb) ELSE 0 END)
           AS rrf_micro
  FROM ranked
  WHERE ra <= {_RRF_DEPTH} OR rb <= {_RRF_DEPTH}
),
top AS (
  SELECT query_id, match_id, rrf_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_micro DESC, match_id) AS fused_rank
  FROM fused
)
SELECT query_id, match_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
       CAST(fused_rank AS BIGINT) AS fused_rank
FROM top WHERE fused_rank <= {_RRF_K}
"""


@register("retrieval_rrf_fusion", _rrf_sql())
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    rankings — full-vector cosine and truncated 16-dim cosine — the
    standard hybrid-search combiner (BM25 ⊕ dense in production; two
    dense views here). Each list contributes 10⁶//(60+rank) for its
    top-50: a PURE integer quotient, so fusion scores, ordering, and
    the final top-10 are bit-identical across engines with no float
    anywhere past the 6-dp-rounded cosines. One pair scan feeds both
    rankings (two windows over the same partitioning = one Exchange);
    at 100 TB each ranking arrives pre-truncated from its own ANN
    index and fusion touches only queries×depth rows."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    t = e.select(
        "vec_id",
        "v",
        vectors.l2_norm("v").alias("nrm"),
        F.slice(F.col("v"), 1, _RRF_DIMS).alias("tv"),
    ).withColumn(
        "tnrm",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("tv"), lambda x: x * x), F.lit(0.0), lambda a, b: a + b
            )
        ),
    )
    q = t.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("tv").alias("qtv"),
        F.col("tnrm").alias("qtn"),
    )
    c = t.select(
        F.col("vec_id").alias("match_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("tv").alias("ctv"),
        F.col("tnrm").alias("ctn"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("match_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "match_id",
        round6(vectors.cosine("qv", "cv", F.col("qn"), F.col("cn"))).alias("fc"),
        round6(vectors.cosine("qtv", "ctv", F.col("qtn"), F.col("ctn"))).alias(
            "tc"
        ),
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("fc"), F.asc("match_id"))
    wb = Window.partitionBy("query_id").orderBy(F.desc("tc"), F.asc("match_id"))
    ranked = scored.select(
        "query_id",
        "match_id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    contrib_a = F.when(F.col("ra") <= _RRF_DEPTH, F.expr(f"1000000 div ({_RRF_C} + ra)")).otherwise(0)
    contrib_b = F.when(F.col("rb") <= _RRF_DEPTH, F.expr(f"1000000 div ({_RRF_C} + rb)")).otherwise(0)
    fused = ranked.filter((F.col("ra") <= _RRF_DEPTH) | (F.col("rb") <= _RRF_DEPTH)).select(
        "query_id", "match_id", (contrib_a + contrib_b).alias("rrf_micro")
    )
    wtop = Window.partitionBy("query_id").orderBy(F.desc("rrf_micro"), F.asc("match_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wtop))
        .filter(F.col("fused_rank") <= _RRF_K)
        .select(
            "query_id",
            "match_id",
            F.col("rrf_micro").cast("long").alias("rrf_micro"),
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )
