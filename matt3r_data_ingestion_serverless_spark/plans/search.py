"""Full-text search over the documents corpus: inverted-index
construction, BM25 relevance ranking, and conjunctive keyword search.

The retrieval triad every corpus-curation stack needs next to dedup
(northstar.py) and TF-IDF (curation.py): build the postings index once,
rank with BM25, serve conjunctive queries off term statistics. All
tokenization shares functions/text.py's whitespace convention with the
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import text
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

_MIN_DF = 5
_POSTINGS_CAP = 10
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP_K = 5
_SEARCH_TERMS = ("data", "join", "stream")
_SEARCH_TOP_K = 10


@register(
    "inverted_index_postings",
    sql=f"""
WITH tok AS (
  SELECT doc_id, unnest({text.tokens_sql('text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term)
SELECT term, count(*) AS df, sum(tf) AS cf,
       array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1,
                                  {_POSTINGS_CAP}), ',') AS postings_head
FROM tf GROUP BY term HAVING count(*) >= {_MIN_DF}
""",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency, collection
    frequency, and the head of the sorted posting list. The index IS a
    DataFrame — term-partitioned, so at 100 TB each term's posting list
    assembles on one executor via the same hash shuffle the tf agg
    already paid (AQE reuses the exchange). Posting lists are capped
    (real indexes chunk postings into fixed-size blocks); the cap is a
    slice AFTER array_sort, so it is deterministic, and serialized to
    CSV for the cross-engine comparator."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_list("doc_id")), 1, _POSTINGS_CAP),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head"),
        )
        .filter(F.col("df") >= _MIN_DF)
    )


@register(
    "bm25_top_terms",
    sql=f"""
WITH tok AS (
  SELECT doc_id, unnest({text.tokens_sql('text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc_id),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM dl),
raw AS (
  -- every literal/operand is forced to DOUBLE: DuckDB parses bare 1.2
  -- as DECIMAL and decimal arithmetic would diverge from Spark's
  -- double path before the round
  SELECT tf.doc_id, tf.term,
         ln((CAST(stats.n_docs AS DOUBLE) - df.df + 0.5)
            / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
         * (CAST(tf.tf AS DOUBLE) * CAST({_BM25_K1 + 1.0} AS DOUBLE))
         / (CAST(tf.tf AS DOUBLE) + CAST({_BM25_K1} AS DOUBLE)
            * (CAST({1.0 - _BM25_B} AS DOUBLE)
               + (CAST({_BM25_B} AS DOUBLE) * dl.dl) / stats.avgdl)) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
scored AS (SELECT doc_id, term, {round6_sql("s")} AS bm25 FROM raw),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY bm25 DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, rnk, bm25 FROM ranked WHERE rnk <= {_BM25_TOP_K}
""",
)
def bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Okapi) relevance: top-k highest-scoring terms per document
    — TF-IDF's successor with tf saturation (k1) and length
    normalization (b). Everything derives from one tokenize+count pass:
    doc lengths re-aggregate tf by doc_id, document frequencies by
    term, and the corpus stats (N, avgdl) are a 1-row broadcast. The
    df-table join broadcasts (vocabulary ≪ corpus); the dl join shares
    the doc_id shuffle with the final top-k window. Both dialects spell
    the score formula with the identical literal nesting so the IEEE
    op sequence — and hence the rounded score — is bit-equal."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = tf.persist()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    k1, b = _BM25_K1, _BM25_B
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", round6(score).alias("bm25"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BM25_TOP_K)
        .select("doc_id", "term", "rnk", "bm25")
    )


@register(
    "keyword_search_conjunctive",
    sql=f"""
WITH tok AS (
  SELECT doc_id, unnest({text.tokens_sql('text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN {_SEARCH_TERMS!r} GROUP BY doc_id, term)
SELECT doc_id, sum(tf) AS score, count(*) AS n_terms_hit
FROM tf GROUP BY doc_id HAVING count(*) = {len(_SEARCH_TERMS)}
ORDER BY score DESC, doc_id LIMIT {_SEARCH_TOP_K}
""",
)
def keyword_search_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) keyword search served off the inverted index:
    docs containing ALL query terms, ranked by total term frequency.
    The query-term filter lands INSIDE the tokenize stage (predicate on
    the exploded term before the agg), so only postings for the ≤3
    query terms ever shuffle — the index-lookup access path, not a
    corpus scan. Intersection = per-doc distinct-term count equal to
    the query arity, a HAVING on the same agg. Deterministic top-k:
    (score desc, doc_id) total order."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term"))
    tf = (
        tok.filter(F.col("term").isin(*_SEARCH_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("doc_id")
        .agg(F.sum("tf").alias("score"), F.count("*").alias("n_terms_hit"))
        .filter(F.col("n_terms_hit") == len(_SEARCH_TERMS))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_SEARCH_TOP_K)
    )
