"""Round-2 batch 6 (this run): cross-document duplicated n-gram span
mining, per-user behavioral entropy, a monthly revenue waterfall, and
schema-evolution UNION BY NAME parity.

Counts exact int64; entropies quantize ln per contribution row before
any cross-row sum (SCALE.md §13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# cross-document duplicated 8-gram spans (Lee et al. 2022 exact-substring dedup)
# ---------------------------------------------------------------------------

_NGRAM_N = 8
_NGRAM_K = 20

_NGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts) - {_NGRAM_N - 2}),
                               i -> array_to_string(list_slice(ts, i, i + {_NGRAM_N - 1}), ' ')))
           AS gram
  FROM toks WHERE len(ts) >= {_NGRAM_N}
),
agg AS (
  SELECT gram, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
  FROM grams GROUP BY gram
)
SELECT gram, CAST(n_occurrences AS BIGINT) AS n_occurrences,
       CAST(n_docs AS BIGINT) AS n_docs
FROM agg WHERE n_docs >= 2
ORDER BY n_docs DESC, n_occurrences DESC, gram
LIMIT {_NGRAM_K}
"""


@register("ns_duplicate_ngram_spans", _NGRAM_SQL)
def ns_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication mining (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    8-token span that appears in ≥2 documents, ranked by document
    reach — the span-granular signal that drives substring-level dedup
    where winnowing fingerprints (ns_winnow_fingerprints) sample and
    containment (ns_containment_pairs) works doc-pairwise. Spans come
    from ONE array transform over the token list (no self-join, no
    posexplode×N); the count table is the only shuffle. At 100 TB the
    gram stream is the map-side input to the same count-min/suffix
    machinery — and the ≥2-doc filter is the classic HAVING pushed
    after a combining agg."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "").alias("ts"),
    ).filter(F.size("ts") >= _NGRAM_N)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - (_NGRAM_N - 1)),
                lambda i: F.array_join(F.slice(F.col("ts"), i, _NGRAM_N), " "),
            )
        ).alias("gram"),
    )
    agg = grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
    )
    return (
        agg.filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("gram"))
        .limit(_NGRAM_K)
    )


# ---------------------------------------------------------------------------
# per-user behavioral bigram entropy
# ---------------------------------------------------------------------------

_ENTROPY_SQL = f"""
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
  FROM events GROUP BY user_id
),
bi AS (
  SELECT user_id,
         unnest(list_transform(range(1, len(types)),
                               i -> types[i] || '>' || types[i + 1])) AS bigram
  FROM seq WHERE len(types) >= 2
),
cnt AS (
  SELECT user_id, bigram, count(*) AS c FROM bi GROUP BY user_id, bigram
),
tot AS (SELECT user_id, sum(c) AS n FROM cnt GROUP BY user_id),
contrib AS (
  SELECT c.user_id,
         c.c * CAST(floor(abs(ln(CAST(c.c AS DOUBLE) / t.n)) * 1e6 + 0.5) AS BIGINT)
           AS h_micro_num,
         t.n
  FROM cnt c JOIN tot t USING (user_id)
)
SELECT user_id,
       CAST(max(n) AS BIGINT) AS n_bigrams,
       {round6_sql("CAST(sum(h_micro_num) AS DOUBLE) / max(n) / 1e6")} AS bigram_entropy
FROM contrib
GROUP BY user_id
"""


@register("user_transition_entropy", _ENTROPY_SQL)
def user_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type transition (bigram)
    distribution — low entropy = scripted/bot-like behavior, high =
    diverse; the per-user personalization/fraud feature that
    event_transition_matrix aggregates globally and
    event_sequence_ngrams mines corpus-wide. H = −Σ(c/n)ln(c/n) is
    reshaped so the only cross-row sum is integer: per bigram the
    contribution c·⌊|ln(c/n)|·10⁶⌉ (ln(c/n) ≤ 0, so |·| drops the
    sign) sums as int64 and divides by n once. Ordered list agg →
    array transform → two hash aggs on the same user key: ONE
    Exchange."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ).alias("types")
    )
    bi = seq.filter(F.size("types") >= 2).select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("types") - 1),
                lambda i: F.concat_ws(
                    ">", F.element_at(F.col("types"), i), F.element_at(F.col("types"), i + 1)
                ),
            )
        ).alias("bigram"),
    )
    cnt = bi.groupBy("user_id", "bigram").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("user_id").agg(F.sum("c").alias("n"))
    j = cnt.join(tot, "user_id")
    h_num = F.col("c") * F.floor(
        F.abs(F.log(F.col("c").cast("double") / F.col("n"))) * 1e6 + 0.5
    ).cast("long")
    contrib = j.select("user_id", h_num.alias("h_micro_num"), "n")
    return contrib.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_bigrams"),
        round6(
            F.sum("h_micro_num").cast("double") / F.max("n") / 1e6
        ).alias("bigram_entropy"),
    )


# ---------------------------------------------------------------------------
# monthly revenue waterfall: gross → discount → tax → net
# ---------------------------------------------------------------------------

_WATERFALL_SQL = """
WITH l AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS gross,
         CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT) AS disc,
         CAST(floor(l_extendedprice * (1 - l_discount) * l_tax * 100 + 0.5) AS BIGINT)
           AS tax
  FROM lineitem
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(gross) AS BIGINT) AS gross_cents,
       CAST(-sum(disc) AS BIGINT) AS discount_cents,
       CAST(sum(tax) AS BIGINT) AS tax_cents,
       CAST(sum(gross) - sum(disc) + sum(tax) AS BIGINT) AS net_cents
FROM l GROUP BY month
"""


@register("revenue_waterfall_monthly", _WATERFALL_SQL)
def revenue_waterfall_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue waterfall — gross, discount give-back, tax
    add-on, net — the finance bridge chart's data. Each component is
    rounded to cents PER LINE (the way invoices actually round) and
    summed exactly, so net = gross − discount + tax reconciles to the
    cent by construction at any scale and under any aggregation order.
    One partial-aggregated scan, grouped by ship month."""
    li = load_table(spark, sf_dir, "lineitem")
    gross = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    disc = F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100 + 0.5).cast("long")
    tax = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax") * 100 + 0.5
    ).cast("long")
    l = li.select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        gross.alias("gross"),
        disc.alias("disc"),
        tax.alias("tax"),
    )
    return l.groupBy("month").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum("gross").cast("long").alias("gross_cents"),
        (-F.sum("disc")).cast("long").alias("discount_cents"),
        F.sum("tax").cast("long").alias("tax_cents"),
        (F.sum("gross") - F.sum("disc") + F.sum("tax")).cast("long").alias("net_cents"),
    )


# ---------------------------------------------------------------------------
# schema-evolution union: UNION BY NAME with a missing column
# ---------------------------------------------------------------------------

_UBN_SQL = """
WITH v1 AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_id % 2 = 0
),
v2 AS (
  SELECT CAST(NULL AS BIGINT) AS cents, event_type, user_id, event_id
  FROM events WHERE event_id % 2 = 1
),
u AS (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(cents) AS BIGINT) AS n_with_value,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM u GROUP BY event_type
"""


@register("union_by_name_evolution", _UBN_SQL)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an old-schema slice (columns reordered,
    value column missing) unions with the current schema BY NAME —
    Spark's unionByName(allowMissingColumns=True) vs DuckDB's UNION
    ALL BY NAME, the ingestion-time reality when upstream producers
    roll schema versions at different times. The aggregate proves
    position-independence: counts reconcile and the value sum covers
    exactly the new-schema half. Nulls from the missing column flow
    through count/sum with standard SQL semantics."""
    ev = load_table(spark, sf_dir, "events")
    v1 = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    v2 = ev.filter(F.col("event_id") % 2 == 1).select("event_type", "user_id", "event_id")
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.count("cents").cast("long").alias("n_with_value"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
