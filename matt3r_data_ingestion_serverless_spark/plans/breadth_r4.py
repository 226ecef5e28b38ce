"""Round-3 batch 4: feature-store point-in-time correctness (SCD2 PIT
join), iterative distributed ML (two Lloyd iterations of k-means over
the embeddings, fully deterministic via micro-unit distances and
rounded centroids), and a Zipf-law corpus diagnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import vectors
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# point-in-time join against the SCD2 dimension history
# ---------------------------------------------------------------------------


def _scd2_pit_sql() -> str:
    from matt3r_data_ingestion_serverless_spark.plans.llmprep import (
        _SCD2_EFF,
        _SCD2_START,
    )

    return f"""
WITH dim AS (
  SELECT c_custkey, c_mktsegment, c_acctbal, '{_SCD2_START}' AS valid_from
  FROM customer WHERE c_custkey <= 1000
),
upd AS (
  SELECT c_custkey, 'DELINQUENT' AS new_seg FROM dim WHERE c_acctbal < 0
),
hist AS (
  SELECT d.c_custkey, d.c_mktsegment AS segment, d.valid_from,
         CASE WHEN u.c_custkey IS NOT NULL THEN '{_SCD2_EFF}'
              ELSE '9999-12-31' END AS valid_to
  FROM dim d LEFT JOIN upd u USING (c_custkey)
  UNION ALL
  SELECT c_custkey, 'DELINQUENT' AS segment, '{_SCD2_EFF}' AS valid_from,
         '9999-12-31' AS valid_to
  FROM upd
)
SELECT h.segment, CAST(year(o.o_orderdate) AS INT) AS order_year,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o
JOIN hist h ON o.o_custkey = h.c_custkey
           AND strftime(o.o_orderdate, '%Y-%m-%d') >= h.valid_from
           AND strftime(o.o_orderdate, '%Y-%m-%d') < h.valid_to
WHERE o.o_custkey <= 1000
GROUP BY 1, 2
"""


@register("scd2_pit_join", sql=_scd2_pit_sql())
def scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: every order is attributed to the
    dimension version that was valid ON ITS ORDER DATE — the
    feature-store correctness rule that prevents training-serving
    leakage (an order must never see a segment assigned later). Built
    on scd2_customer_history's validity intervals with a half-open
    [valid_from, valid_to) containment predicate, so each fact row
    matches exactly one version.

    Scale: equi-join on the business key carries the pair matching;
    the range predicate is a residual filter on the joined row — no
    interval index needed because versions-per-key is tiny (SCD2
    history depth). Dates compare as ISO strings: identical
    lexicographic and chronological order, no timezone surface."""
    from matt3r_data_ingestion_serverless_spark.plans.llmprep import (
        scd2_customer_history,
    )

    hist = scd2_customer_history(spark, sf_dir).select(
        "c_custkey", "segment", "valid_from", "valid_to"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 1000)
    od = F.date_format("o_orderdate", "yyyy-MM-dd")
    j = o.join(
        hist,
        (o.o_custkey == hist.c_custkey)
        & (od >= hist.valid_from)
        & (od < hist.valid_to),
    )
    return j.groupBy(
        "segment", F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# k-means (2 Lloyd iterations) over the embeddings table
# ---------------------------------------------------------------------------

_KM_K = 8


def _kmeans_sql() -> str:
    def d2(v: str, c: str) -> str:
        return (
            f"{vectors.dot_sql(v, v)} - 2 * {vectors.dot_sql(v, c)}"
            f" + {vectors.dot_sql(c, c)}"
        )

    d2u = f"CAST(floor(({d2('e.v', 'c.c')}) * 1e6 + 0.5) AS BIGINT)"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {_KM_K}),
j1 AS (SELECT e.vec_id, c.cid, {d2u} AS d2u FROM e CROSS JOIN c0 c),
a1 AS (SELECT vec_id, cid FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2u, cid) AS rn
         FROM j1) WHERE rn = 1),
m AS (
  SELECT cid, dim, {round6_sql("avg(val)")} AS val
  FROM (SELECT a1.cid, generate_subscripts(e.v, 1) AS dim, unnest(e.v) AS val
        FROM a1 JOIN e USING (vec_id))
  GROUP BY cid, dim
),
c1 AS (SELECT cid, list(val ORDER BY dim) AS c FROM m GROUP BY cid),
j2 AS (SELECT e.vec_id, c.cid, {d2u} AS d2u FROM e CROSS JOIN c1 c),
a2 AS (SELECT vec_id, cid, d2u FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2u, cid) AS rn
         FROM j2) WHERE rn = 1)
SELECT cid, count(*) AS n_members,
       CAST(sum(d2u) AS BIGINT) AS inertia_micro
FROM a2 GROUP BY cid
"""


@register("kmeans_embeddings", sql=_kmeans_sql())
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (K = 8) over the embedding
    corpus — the iterative-ML primitive behind IVF index training and
    SemDeDup-style semantic clustering, run entirely as DataFrame ops:
    assign = broadcast(centroids) × corpus with an argmin window;
    update = posexplode to (cluster, dim) cells, mean per cell, rebuild
    arrays. Reports per-cluster size and inertia after the second
    assignment.

    Determinism across engines, the hard part of distributed iterative
    ML: (1) squared distances quantize to integer MICRO-UNITS before
    the argmin, so a last-ulp fold difference can't flip an assignment;
    (2) updated centroids round to 6 dp (shared sign·floor formula)
    before iteration 2, so both engines re-assign against bit-identical
    centroids; (3) argmin ties break on cluster id. Seeding is the
    first K vec_ids (deterministic; k-means++ would randomize).

    Scale: per iteration one broadcast of K×d doubles + one corpus scan
    (assignment is map-side) + one (K×d)-cell hash agg for the update —
    the canonical Spark k-means shape; corpus never self-joins."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", vectors.as_double(F.col("embedding")).alias("v")
    )
    c0 = e.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )

    def d2u_col():
        d2 = (
            vectors.dot(F.col("v"), F.col("v"))
            - F.lit(2.0) * vectors.dot(F.col("v"), F.col("c"))
            + vectors.dot(F.col("c"), F.col("c"))
        )
        return F.floor(d2 * 1e6 + 0.5).cast("long")

    def assign(cents: DataFrame) -> DataFrame:
        j = e.crossJoin(F.broadcast(cents)).select(
            "vec_id", "cid", d2u_col().alias("d2u")
        )
        w = Window.partitionBy("vec_id").orderBy("d2u", "cid")
        return (
            j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    a1 = assign(c0)
    cells = (
        a1.join(e, "vec_id")
        .select("cid", F.posexplode("v").alias("dim0", "val"))
        .groupBy("cid", F.col("dim0").alias("dim"))
        .agg(round6(F.avg("val")).alias("val"))
    )
    c1 = cells.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "val"))), lambda s: s["val"]
        ).alias("c")
    )
    a2 = assign(c1)
    return a2.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("d2u").cast("long").alias("inertia_micro"),
    )


# ---------------------------------------------------------------------------
# Zipf-law corpus diagnostic
# ---------------------------------------------------------------------------

_ZIPF_TOP = 200


@register(
    "ns_zipf_slope",
    sql=f"""
WITH toks AS (
  SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
  FROM vocab
)
SELECT count(*) AS n_terms,
       {round6_sql("regr_slope(ln(cnt), ln(rnk))")} AS zipf_slope,
       {round6_sql("regr_r2(ln(cnt), ln(rnk))")} AS r2
FROM ranked WHERE rnk <= {_ZIPF_TOP}
""",
)
def ns_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top-{n} vocabulary: the OLS slope of
    ln(frequency) on ln(rank) — natural language sits near −1, while
    generated/templated corpora flatten toward 0, making the slope a
    one-number corpus-health check on any new data source.

    Scale: the vocabulary agg is the only wide stage; ranking the top
    slice is a window over an already-aggregated, Heaps-law-bounded
    table; the regression is one tiny agg. Ranks tie-break on the
    token so both engines rank identically.""".replace("{n}", str(_ZIPF_TOP))
    docs = spread(load_table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = vocab.select(
        "cnt",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("tok"))).alias("rnk"),
    ).filter(F.col("rnk") <= _ZIPF_TOP)
    return ranked.agg(
        F.count("*").alias("n_terms"),
        round6(F.expr("regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE)))")).alias(
            "zipf_slope"
        ),
        round6(F.expr("regr_r2(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE)))")).alias(
            "r2"
        ),
    )
