"""Round-2 batch 5 (this run): Flesch readability scoring, a
quantized geometric mean, and the Theil inequality index.

Counts are exact int64 from regex/token surfaces both engines share;
every transcendental (ln) is quantized to integer micro-units PER ROW
before any cross-row sum, so group aggregates are order-free integer
arithmetic (SCALE.md §7 / §13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# Flesch reading-ease per document
# ---------------------------------------------------------------------------

_FLESCH_SQL = f"""
WITH c AS (
  SELECT doc_id,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_words,
         greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS n_syllables
  FROM documents
)
SELECT doc_id,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       {round6_sql(
           "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)"
           " - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)"
       )} AS flesch
FROM c WHERE n_words > 0
"""


@register("ns_readability_flesch", _FLESCH_SQL)
def ns_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the readability gate beside
    ns_text_quality's length/punctuation ratios and ns_char_entropy.
    Sentences ≈ terminal-punctuation runs, syllables ≈ vowel-group
    runs ([aeiouy]+) — the standard cheap proxies; all three counts are
    exact integers from regex surfaces both engines evaluate
    identically (RE2-safe patterns, no backreferences), and the score
    is one double expression per row. Pure scan-stage codegen — no
    shuffle at all; at 100 TB this is a free rider on any scan that
    already reads the text column."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    n_words = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    n_syll = F.greatest(
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"[aeiouy]+"), F.lit(0))), F.lit(1)
    )
    c = docs.select(
        "doc_id",
        n_sent.cast("long").alias("n_sentences"),
        n_words.cast("long").alias("n_words"),
        n_syll.cast("long").alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    flesch = (
        206.835
        - 1.015 * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words"))
    )
    return c.select(
        "doc_id", "n_sentences", "n_words", "n_syllables", round6(flesch).alias("flesch")
    )


# ---------------------------------------------------------------------------
# geometric mean via per-row quantized logs
# ---------------------------------------------------------------------------

_GEO_SQL = f"""
WITH q AS (
  SELECT event_type,
         CAST(sign(ln(value)) * floor(abs(ln(value)) * 1e6 + 0.5) AS BIGINT)
           AS ln_micro
  FROM events WHERE value > 0
),
s AS (
  SELECT event_type, count(*) AS n, sum(ln_micro) AS s1 FROM q GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(s1 AS BIGINT) AS sum_ln_micro,
       {round6_sql("exp(CAST(s1 AS DOUBLE) / n / 1e6)")} AS geo_mean
FROM s
"""


@register("geometric_mean_by_type", _GEO_SQL)
def geometric_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of event values per type — the right average for
    multiplicative quantities (growth factors, latencies, prices).
    exp(mean(ln x)) is float-order-sensitive if the ln's sum as
    doubles, so each row's ln quantizes to integer micro-units FIRST
    (the same sign·floor(|x|·1e6+0.5) contract as round6) and the
    group sum is pure int64 — shuffle/AQE order cannot perturb it; exp
    runs once per group on an identical double. One partial-aggregated
    scan."""
    ev = load_table(spark, sf_dir, "events")
    lnv = F.log(F.col("value"))
    ln_micro = (F.signum(lnv) * F.floor(F.abs(lnv) * 1e6 + 0.5)).cast("long")
    q = ev.filter(F.col("value") > 0).select("event_type", ln_micro.alias("ln_micro"))
    s = q.groupBy("event_type").agg(F.count("*").alias("n"), F.sum("ln_micro").alias("s1"))
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("s1").cast("long").alias("sum_ln_micro"),
        round6(F.exp(F.col("s1").cast("double") / F.col("n") / 1e6)).alias("geo_mean"),
    )


# ---------------------------------------------------------------------------
# Theil T inequality index over supplier revenues
# ---------------------------------------------------------------------------

_THEIL_SQL = f"""
WITH rev AS (
  SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
         sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT)) AS cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
tot AS (SELECT nationkey, sum(cents) AS total, count(*) AS n FROM rev GROUP BY nationkey),
contrib AS (
  SELECT r.nationkey,
         CAST(sign(ln(CAST(r.cents AS DOUBLE) * t.n / t.total))
              * floor(abs(ln(CAST(r.cents AS DOUBLE) * t.n / t.total)) * 1e6 + 0.5)
              AS BIGINT) AS ln_ratio_micro,
         (r.cents * 1000000) // t.total AS share_micro
  FROM rev r JOIN tot t USING (nationkey)
)
SELECT n.n_name AS nation,
       CAST(max(t.n) AS BIGINT) AS n_suppliers,
       {round6_sql(
           "CAST(sum(share_micro * ln_ratio_micro) AS DOUBLE) / 1e12"
       )} AS theil_t
FROM contrib c
JOIN tot t USING (nationkey)
JOIN nation n ON c.nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("theil_index_by_nation", _THEIL_SQL)
def theil_index_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of supplier revenue within each nation
    — T = Σᵢ (xᵢ/X)·ln(xᵢ/μ), the decomposable inequality measure that
    complements hhi_concentration (market power) and the Gini UDAF
    (dispersion). Both factors quantize per supplier BEFORE the group
    sum: the share by true integer division (cents·10⁶ // total) and
    the log ratio to micro-units — so the Σ is exact int64 (|share·ln|
    ≤ 10⁶·7·10⁶ ≈ 10¹³ per row, ×10³ suppliers ≪ 2⁶³) and one final
    scale-down produces the index. Same two-agg + broadcast-totals
    shape as HHI."""
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
    tot = rev.groupBy("nationkey").agg(F.sum("cents").alias("total"), F.count("*").alias("n"))
    j = rev.join(F.broadcast(tot), "nationkey")
    ratio = F.col("cents").cast("double") * F.col("n") / F.col("total")
    lnr = F.log(ratio)
    contrib = j.select(
        "nationkey",
        (F.signum(lnr) * F.floor(F.abs(lnr) * 1e6 + 0.5)).cast("long").alias("ln_ratio_micro"),
        F.expr("(cents * 1000000) div total").alias("share_micro"),
        "n",
    )
    return (
        contrib.join(F.broadcast(nat), contrib.nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n").cast("long").alias("n_suppliers"),
            round6(
                F.sum(F.col("share_micro") * F.col("ln_ratio_micro")).cast("double") / 1e12
            ).alias("theil_t"),
        )
    )
