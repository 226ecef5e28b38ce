"""Round-2 batch 10 (this run): disjunctive BM25 search, ANY/ALL
predicate translation, and a quartile mobility matrix.

The OR-search ranking sums per-term BM25 scores in a FIXED expression
order (one pivoted column per query term, each pre-rounded) — never a
data-order float sum (SCALE.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import text
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

_K1 = 1.2
_B = 0.75
_OR_TERMS = ("data", "stream", "vector")
_OR_TOP_K = 15

# ---------------------------------------------------------------------------
# disjunctive (OR) BM25-ranked search
# ---------------------------------------------------------------------------


def _or_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _OR_TERMS)
    per_term_cols = ", ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN bm25 END), 0.0) AS s{i}"
        for i, t in enumerate(_OR_TERMS)
    )
    total = " + ".join(f"s{i}" for i in range(len(_OR_TERMS)))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({text.tokens_sql('text')}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN ({terms}) GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
raw AS (
  SELECT tf.doc_id, tf.term,
         ln((CAST(stats.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
         * (CAST(tf.tf AS DOUBLE) * {_K1 + 1.0})
         / (CAST(tf.tf AS DOUBLE) + {_K1}
            * ({1.0 - _B} + ({_B} * dl.dl) / stats.avgdl)) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
scored AS (SELECT doc_id, term, {round6_sql("s")} AS bm25 FROM raw),
pivoted AS (
  SELECT doc_id, {per_term_cols}, count(*) AS n_terms_hit
  FROM scored GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, n_terms_hit, {round6_sql(total)} AS score,
         row_number() OVER (ORDER BY {round6_sql(total)} DESC, doc_id) AS rnk
  FROM pivoted
)
SELECT doc_id, CAST(n_terms_hit AS BIGINT) AS n_terms_hit, score,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_OR_TOP_K}
"""


@register("keyword_search_disjunctive", _or_sql())
def keyword_search_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive (OR) keyword search ranked by summed BM25 — the
    default web-search semantics beside keyword_search_conjunctive's
    AND. The query-term filter again lands inside the tokenize stage
    (only postings for the 3 query terms shuffle); each term's BM25 is
    rounded per (doc, term), pivoted to ONE COLUMN PER QUERY TERM, and
    the document score adds those columns in fixed expression order —
    a data-order float sum over matched terms would not be
    cross-engine stable. Top-k tie-breaks on doc_id."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term")).filter(
        F.col("term") != ""
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        tok.filter(F.col("term").isin(*_OR_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    raw = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n_docs").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    s = idf * (F.col("tf").cast("double") * (_K1 + 1.0)) / (
        F.col("tf").cast("double") + _K1 * (1.0 - _B + (_B * F.col("dl")) / F.col("avgdl"))
    )
    scored = raw.select("doc_id", "term", round6(s).alias("bm25"))
    pivot_cols = [
        F.coalesce(F.max(F.when(F.col("term") == t, F.col("bm25"))), F.lit(0.0)).alias(
            f"s{i}"
        )
        for i, t in enumerate(_OR_TERMS)
    ]
    pivoted = scored.groupBy("doc_id").agg(*pivot_cols, F.count("*").alias("n_terms_hit"))
    total = round6(sum(F.col(f"s{i}") for i in range(len(_OR_TERMS))))
    ranked = pivoted.select(
        "doc_id", "n_terms_hit", total.alias("score")
    ).withColumn("rnk", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))))
    return ranked.filter(F.col("rnk") <= _OR_TOP_K).select(
        "doc_id",
        F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
        "score",
        F.col("rnk").cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# ANY / ALL predicate translation
# ---------------------------------------------------------------------------

_ANYALL_SQL = """
WITH bench AS (SELECT o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN o.o_totalprice > ALL (SELECT * FROM bench)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above_all,
       CAST(sum(CASE WHEN o.o_totalprice > ANY (SELECT * FROM bench)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above_any
FROM orders o
GROUP BY o.o_orderpriority
"""


@register("any_all_predicates", _ANYALL_SQL)
def any_all_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY/ALL quantified-comparison translation: how many orders per
    priority beat ALL urgent orders (> max) and how many beat ANY (>
    min). The oracle states it with SQL's `> ALL (subquery)` / `> ANY
    (subquery)`; Spark has no quantified comparisons, so the engine
    applies the standard desugar — ALL ⇒ compare to the subquery MAX,
    ANY ⇒ compare to its MIN — as a 1-row broadcast. That agg-rewrite
    is exactly how a planner lowers these predicates at 100 TB: never
    a per-row subquery, one scalar join."""
    orders = load_table(spark, sf_dir, "orders")
    bench = orders.filter(F.col("o_orderpriority") == "1-URGENT").agg(
        F.max("o_totalprice").alias("mx"), F.min("o_totalprice").alias("mn")
    )
    j = orders.crossJoin(F.broadcast(bench))
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("o_totalprice") > F.col("mx"), 1).otherwise(0))
        .cast("long")
        .alias("n_above_all"),
        F.sum(F.when(F.col("o_totalprice") > F.col("mn"), 1).otherwise(0))
        .cast("long")
        .alias("n_above_any"),
    )


# ---------------------------------------------------------------------------
# month-over-month quartile mobility matrix
# ---------------------------------------------------------------------------

_MOBILITY_SQL = """
WITH weekly AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS period,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
),
q AS (
  SELECT user_id, period,
         ntile(4) OVER (PARTITION BY period ORDER BY cents, user_id) AS quartile
  FROM weekly
),
moves AS (
  SELECT a.quartile AS from_q, b.quartile AS to_q
  FROM q a JOIN q b
    ON a.user_id = b.user_id AND b.period = a.period + 1
)
SELECT from_q, to_q, CAST(count(*) AS BIGINT) AS n_transitions
FROM moves GROUP BY from_q, to_q
"""


@register("quartile_mobility_matrix", _MOBILITY_SQL)
def quartile_mobility_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period spend-quartile mobility matrix — how users
    move between value quartiles across consecutive periods, the
    income-mobility / engagement-tier analysis. The period is an
    ABSOLUTE 7-day bucket (epoch_us div one-week-of-micros): exact
    integer arithmetic in both engines, and — unlike the original
    calendar-month version — multiple periods exist inside the
    synthetic corpus's single-month span (month-over-month was
    structurally 0 rows at EVERY sf; the round-9 sf1 sweep flagged
    it). ntile(4) ranks on (cents, user_id) so bucket edges are
    total-ordered and identical in both engines (ntile's front-loaded
    remainder rule is shared SQL semantics); consecutive-period
    pairing is a self-equi-join on (user, period+1). Aggregate-first:
    quartiles and the join run on the user x period rollup, never raw
    events."""
    ev = load_table(spark, sf_dir, "events")
    period = F.expr("unix_micros(ts) div 604800000000")  # exact int div
    weekly = ev.groupBy("user_id", period.alias("period")).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    q = weekly.select(
        "user_id",
        "period",
        F.ntile(4)
        .over(Window.partitionBy("period").orderBy("cents", "user_id"))
        .alias("quartile"),
    )
    a = q.select(
        F.col("user_id").alias("uid"),
        (F.col("period") + 1).alias("next_period"),
        F.col("quartile").alias("from_q"),
    )
    b = q.select(
        F.col("user_id").alias("uid"),
        F.col("period").alias("next_period"),
        F.col("quartile").alias("to_q"),
    )
    moves = a.join(b, ["uid", "next_period"])
    return moves.groupBy("from_q", "to_q").agg(
        F.count("*").cast("long").alias("n_transitions")
    )
