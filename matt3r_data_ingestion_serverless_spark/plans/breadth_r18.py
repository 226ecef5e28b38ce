"""Round-4 batch 14: funnel time-to-convert quantiles and
content-defined chunking (rolling-hash boundaries, storage-dedup
style).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import hashing, text
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# funnel time-to-convert quantiles (view → purchase latency)
# ---------------------------------------------------------------------------

_TTC_QUANTS = (0.5, 0.9)

_TTC_SQL = f"""
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS first_purchase
  FROM events GROUP BY user_id
),
d AS (
  SELECT (first_purchase - first_view) // 60000000 AS mins
  FROM f WHERE first_view IS NOT NULL AND first_purchase > first_view
),
vc AS (SELECT mins, count(*) AS c FROM d GROUP BY mins),
cum AS (
  SELECT mins, sum(c) OVER (ORDER BY mins
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM vc
),
tot AS (SELECT count(*) AS n FROM d),
qs AS (SELECT unnest([{", ".join(str(q) for q in _TTC_QUANTS)}]) AS q)
SELECT q, CAST(min(mins) AS BIGINT) AS minutes_to_convert,
       CAST(max(n) AS BIGINT) AS n_converters
FROM qs, cum, tot
WHERE cum >= ceil(q * n)
GROUP BY q
"""


@register("funnel_time_to_convert", _TTC_SQL)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution: per user, minutes from FIRST view
    to FIRST subsequent purchase; report the p50/p90 time-to-convert —
    the product-analytics companion to funnel_conversion's rates
    ("how many convert" there, "how fast" here).

    Both funnel endpoints come from ONE conditional-min agg per user
    (no join between steps), and the quantiles use the exact
    value-histogram pattern (⌈q·n⌉ over the latency histogram, the
    exact_global_quantiles discipline) — integer minutes end to end,
    no raw-row sort. Users who purchase before ever viewing are
    non-converting by the strict-order rule, matching
    funnel_conversion's semantics."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("first_purchase"),
    )
    d = f.filter(
        F.col("first_view").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(
        F.expr("(first_purchase - first_view) div 60000000").alias("mins")
    )
    vc = d.groupBy("mins").agg(F.count("*").alias("c"))
    cum = vc.select(
        "mins",
        F.sum("c")
        .over(Window.orderBy("mins").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    tot = d.agg(F.count("*").alias("n"))
    qs = spark.createDataFrame([(q,) for q in _TTC_QUANTS], "q double")
    return (
        cum.crossJoin(F.broadcast(tot))
        .join(F.broadcast(qs), F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(
            F.min("mins").cast("long").alias("minutes_to_convert"),
            F.max("n").cast("long").alias("n_converters"),
        )
    )


# ---------------------------------------------------------------------------
# content-defined chunking (rolling-hash boundaries) + chunk dedup
# ---------------------------------------------------------------------------

_CDC_MOD = 8  # expected chunk length in tokens (boundary ~ 1/8 tokens)


def _cdc_sql() -> str:
    th = (
        f"list_transform({text.tokens_sql('text')}, "
        f"t -> ({hashing.md5_hash64_sql('t')}) % {hashing.P31})"
    )
    return f"""
WITH th AS (SELECT doc_id, {th} AS th FROM documents),
-- boundary AFTER position i when hash % MOD == 0; chunk edges =
-- [0] + boundaries + [len]
-- boundaries strictly inside (1..len-1): edges are then strictly
-- increasing by construction, no dedup needed (DuckDB's list_distinct
-- does NOT preserve order)
ded AS (
  SELECT doc_id, th,
         list_concat(
           [0],
           list_concat(
             list_filter(range(1, len(th)), i -> th[i] % {_CDC_MOD} = 0),
             [len(th)])) AS e
  FROM th
),
chunks AS (
  SELECT doc_id,
         generate_subscripts(e, 1) AS ci,
         unnest(e) AS lo
  FROM ded
),
spans AS (
  SELECT c.doc_id, c.ci, c.lo, d.e[c.ci + 1] AS hi, d.th
  FROM chunks c JOIN ded d ON c.doc_id = d.doc_id
  WHERE c.ci < len(d.e)
),
fp AS (
  SELECT doc_id, ci, hi - lo AS n_tokens,
         list_reduce(
           list_prepend(CAST(7 AS BIGINT),
             list_slice(th, lo + 1, hi)),
           (a, b) -> (a * 1000003 + b) % {hashing.P31}) AS fp
  FROM spans WHERE hi > lo
)
SELECT fp AS chunk_fp,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS n_tokens
FROM fp
GROUP BY fp
HAVING count(*) > 1
"""


@register("ns_content_defined_chunking", sql=_cdc_sql())
def ns_content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the restic/borg/LBFS storage-dedup
    scheme): chunk boundaries fall where the per-token rolling hash ≡ 0
    (mod 8), so INSERTIONS SHIFT BOUNDARIES ONLY LOCALLY — unlike
    fixed-size chunks, edits don't re-chunk the whole document. Chunks
    fingerprint by a sequential polynomial fold of their token hashes;
    the query reports every chunk content shared across occurrences
    (the dedup savings ledger: n_occurrences − 1 copies are free).

    All hashing is the repo's md5-derived integer family (engine-
    portable); the chunk fingerprint folds left-to-right (aggregate ==
    list_reduce). Boundary detection, slicing and folding are pure
    higher-order array functions in the scan stage — the only shuffle
    is the final fingerprint groupBy."""
    P = hashing.P31
    B = 1_000_003
    docs = spread(load_table(spark, sf_dir, "documents"))
    th = docs.select(
        "doc_id",
        F.transform(
            text.tokens(F.col("text")), lambda t: hashing.md5_hash64(t) % P
        ).alias("th"),
    )
    n = F.size("th")
    # interior boundaries only (1..n-1): edges strictly increase, so no
    # dedup — array_distinct/list_distinct ordering is not portable
    bounds = F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.element_at(F.col("th"), i) % _CDC_MOD == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    edges = F.concat(F.array(F.lit(0)), bounds, F.array(n))
    # cut the lineage here: feeding the md5-token chain INTO the fold's
    # argument makes Spark's interpreted HigherOrderFunction re-evaluate
    # the whole chain per accumulator step (measured 20 s at sf0.1;
    # 0.9 s materialized)
    e = th.select("doc_id", "th", edges.alias("e")).localCheckpoint(eager=True)
    spans = e.select(
        "doc_id",
        "th",
        "e",
        F.posexplode(F.slice(F.col("e"), 1, F.size("e") - 1)).alias("ci0", "lo"),
        # hi for span ci0 is e[ci0 + 2] (posexplode is 0-based)
    ).withColumn("hi", F.element_at(F.col("e"), F.col("ci0") + 2))
    # materialize the chunk slice in its own projection BEFORE the fold
    # so aggregate() folds over a bound array value, not an expression
    chunk = spans.filter(F.col("hi") > F.col("lo")).select(
        "doc_id",
        (F.col("hi") - F.col("lo")).alias("n_tokens"),
        F.slice(F.col("th"), F.col("lo") + 1, F.col("hi") - F.col("lo")).alias(
            "chunk"
        ),
    )
    fp = chunk.select(
        "doc_id",
        "n_tokens",
        F.aggregate(
            F.col("chunk"), F.lit(7).cast("long"), lambda a, b: (a * B + b) % P
        ).alias("fp"),
    )
    return (
        fp.groupBy(F.col("fp").alias("chunk_fp"))
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.max("n_tokens").cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_occurrences") > 1)
    )
