"""Round-4 batch 15: crowd-label aggregation, temperature-scaled
mixture sampling weights, and a deterministic bootstrap standard error
— the label-quality / data-mixing / uncertainty tail of the
training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import hashing
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# crowd-label aggregation (majority vote + annotator accuracy)
# ---------------------------------------------------------------------------

_N_ANNOTATORS = 3
# annotator noise: with p = k/16 the annotator replaces the true label
# by a hash-chosen one (annotator 1 is sloppier than 3)
_NOISE_16THS = {1: 5, 2: 3, 3: 1}

_LANGS = "['de','en','es','fr','zh']"


def _vote_sql(a: int) -> str:
    """Annotator a's label for a doc: md5-keyed noise decides whether
    the true lang is replaced by a hash-chosen lang."""
    noise = _NOISE_16THS[a]
    h = hashing.md5_hash64_sql(f"concat('ann{a}-', CAST(doc_id AS VARCHAR))")
    return (
        f"CASE WHEN ({h}) % 16 < {noise} "
        f"THEN list_extract({_LANGS}, CAST(({h}) // 16 % 5 AS INT) + 1) "
        f"ELSE lang END"
    )


def _crowd_sql() -> str:
    votes = " UNION ALL ".join(
        f"SELECT doc_id, lang AS true_lang, {a} AS annotator, "
        f"{_vote_sql(a)} AS vote FROM documents"
        for a in sorted(_NOISE_16THS)
    )
    return f"""
WITH votes AS ({votes}),
maj AS (
  SELECT doc_id, true_lang,
         arg_max(vote, cnt * 1000000 - code) AS majority
  FROM (
    SELECT doc_id, true_lang, vote, count(*) AS cnt,
           min(list_position({_LANGS}, vote)) AS code
    FROM votes GROUP BY 1, 2, 3
  )
  GROUP BY doc_id, true_lang
)
SELECT v.annotator,
       count(*) AS n_votes,
       CAST(sum(CASE WHEN v.vote = m.majority THEN 1 ELSE 0 END) AS BIGINT)
         AS agree_majority,
       CAST(sum(CASE WHEN v.vote = m.true_lang THEN 1 ELSE 0 END) AS BIGINT)
         AS agree_truth,
       {round6_sql(
           "CAST(sum(CASE WHEN v.vote = m.majority THEN 1 ELSE 0 END)"
           " AS DOUBLE) / count(*)"
       )} AS majority_agreement
FROM votes v JOIN maj m ON v.doc_id = m.doc_id
GROUP BY v.annotator
"""


@register("ns_crowd_label_majority", sql=_crowd_sql())
def ns_crowd_label_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crowd-label aggregation (the Dawid–Skene step-0): three synthetic
    annotators vote on each doc's language — md5-keyed noise flips
    annotator a's vote with probability k_a/16, so annotator quality
    differs by construction — the MAJORITY label resolves by (count,
    then lowest label code), and each annotator is scored by agreement
    with the majority and with ground truth. The label-quality audit
    any labeling pipeline runs before training on crowd data (the
    full Dawid–Skene EM reweights votes by exactly these agreement
    matrices).

    Noise is a pure md5 projection (the ns_dp_noisy_counts idiom), so
    votes are reproducible across engines and retries; the vote matrix
    is a 3-way UNION in the scan stage, one hash agg per doc for the
    majority (composite-integer argmax — no ties possible), one
    broadcast-back join for scoring."""
    docs = load_table(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    lang_arr = F.array(*[F.lit(x) for x in langs])
    votes = None
    for a, noise in sorted(_NOISE_16THS.items()):
        h = hashing.md5_hash64(
            F.concat(F.lit(f"ann{a}-"), F.col("doc_id").cast("string"))
        )
        # h // 16 via shiftright — exact for the 60-bit hash, where a
        # double division would corrupt low bits past 2^53
        vote = F.when(
            h % 16 < noise,
            F.element_at(lang_arr, (F.shiftright(h, 4) % 5 + 1).cast("int")),
        ).otherwise(F.col("lang"))
        part = docs.select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.lit(a).alias("annotator"),
            vote.alias("vote"),
        )
        votes = part if votes is None else votes.unionByName(part)
    counted = votes.groupBy("doc_id", "true_lang", "vote").agg(
        F.count("*").alias("cnt"),
        F.min(F.array_position(lang_arr, F.col("vote"))).alias("code"),
    )
    maj = counted.groupBy("doc_id", "true_lang").agg(
        F.max_by("vote", F.col("cnt") * 1_000_000 - F.col("code")).alias("majority")
    )
    j = votes.join(maj.select("doc_id", "majority", "true_lang"), ["doc_id", "true_lang"])
    agree_m = (F.col("vote") == F.col("majority")).cast("int")
    agree_t = (F.col("vote") == F.col("true_lang")).cast("int")
    return j.groupBy("annotator").agg(
        F.count("*").alias("n_votes"),
        F.sum(agree_m).cast("long").alias("agree_majority"),
        F.sum(agree_t).cast("long").alias("agree_truth"),
        round6(F.sum(agree_m).cast("double") / F.count("*")).alias(
            "majority_agreement"
        ),
    )


# ---------------------------------------------------------------------------
# temperature-scaled mixture sampling weights (multilingual standard)
# ---------------------------------------------------------------------------

_MIX_BUDGET = 100_000  # sampled docs to apportion

_MIX_SQL = f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS wt FROM c),
tot AS (
  SELECT list_reduce(list_prepend(0.0, list(wt ORDER BY lang)),
                     (a, b) -> a + b) AS z
  FROM w
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       {round6_sql("wt / z")} AS mix_weight,
       CAST(floor(wt / z * {_MIX_BUDGET}) AS BIGINT) AS budget_docs,
       {round6_sql(f"(wt / z * {_MIX_BUDGET}) / n")} AS epochs_per_doc
FROM w, tot
"""


@register("ns_mixture_temperature", _MIX_SQL)
def ns_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-LLM data
    standard, T=2 ⇒ w_l ∝ n_l^(1/2)): up-samples low-resource
    languages relative to proportional sampling while avoiding the
    over-repetition of pure uniform. Emits per language the mixture
    weight, the doc budget out of 100k, and epochs-per-doc (>1 = that
    language's data repeats — the repetition-budget warning from the
    data-constrained scaling literature).

    The normalizer Σ n_l^(1/2) folds over a lang-ordered list
    (aggregate() == list_reduce) — five terms, but the discipline is
    the point; everything else is fixed-formula doubles from exact
    counts. Complements ns_dataset_mixture_sampling (which SELECTS the
    docs; this sets the TARGETS)."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    w = c.select("lang", "n", F.sqrt(F.col("n").cast("double")).alias("wt"))
    tot = w.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lang", "wt"))),
                lambda st: st["wt"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("z")
    )
    j = w.crossJoin(F.broadcast(tot))
    share = F.col("wt") / F.col("z")
    return j.select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        round6(share).alias("mix_weight"),
        F.floor(share * _MIX_BUDGET).cast("long").alias("budget_docs"),
        round6(share * _MIX_BUDGET / F.col("n")).alias("epochs_per_doc"),
    )


# ---------------------------------------------------------------------------
# deterministic bootstrap standard error (md5-weighted resamples)
# ---------------------------------------------------------------------------

_BOOT_B = 20

_BOOT_SQL = f"""
WITH reps AS (SELECT unnest(range(0, {_BOOT_B})) AS b),
w AS (
  SELECT d.source, reps.b, d.n_chars,
         ({hashing.md5_hash64_sql(
             "concat('boot-', CAST(reps.b AS VARCHAR), '-', CAST(d.doc_id AS VARCHAR))"
         )}) % 4 AS wt
  FROM documents d, reps
),
rep_means AS (
  SELECT source, b,
         CAST(sum(wt * n_chars) AS DOUBLE) / sum(wt) AS mean_b
  FROM w GROUP BY 1, 2
  HAVING sum(wt) > 0
),
stats AS (
  SELECT source, count(*) AS nb,
         list_reduce(list_prepend(0.0, list(mean_b ORDER BY b)),
                     (a, c) -> a + c) AS s1,
         list_reduce(list_prepend(0.0, list(mean_b * mean_b ORDER BY b)),
                     (a, c) -> a + c) AS s2
  FROM rep_means GROUP BY source
)
SELECT source, CAST(nb AS INT) AS n_replicates,
       {round6_sql("s1 / nb")} AS boot_mean,
       {round6_sql("sqrt((s2 - s1 * s1 / nb) / (nb - 1))")} AS boot_se
FROM stats
"""


@register("ns_bootstrap_se", _BOOT_SQL)
def ns_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap standard error of each source's mean doc length via 20
    DETERMINISTIC resamples: replicate b weights each doc by
    md5('boot-b-doc') mod 4 (mean-1.5 integer weights — the Poisson/
    multinomial-bootstrap idea with a keyed PRNG instead of an RNG), so
    the whole uncertainty estimate is reproducible across engines,
    retries, and partitionings. This is how resampling statistics run
    in a distributed engine: each replicate is a WEIGHTED aggregate in
    the same shuffle — one pass computes all B replicates, never B
    passes over the data.

    Replicate means are exact-int ratios; the across-replicate moment
    sums fold over b-ordered lists (the §12 discipline), and SE uses
    the n−1 formula on those folded doubles."""
    docs = load_table(spark, sf_dir, "documents")
    reps = spark.range(_BOOT_B).select(F.col("id").cast("long").alias("b"))
    w = docs.crossJoin(F.broadcast(reps)).select(
        "source",
        "b",
        "n_chars",
        (
            hashing.md5_hash64(
                F.concat(
                    F.lit("boot-"),
                    F.col("b").cast("string"),
                    F.lit("-"),
                    F.col("doc_id").cast("string"),
                )
            )
            % 4
        ).alias("wt"),
    )
    rep_means = (
        w.groupBy("source", "b")
        .agg(
            F.sum(F.col("wt") * F.col("n_chars")).alias("sw"),
            F.sum("wt").alias("tw"),
        )
        .filter(F.col("tw") > 0)
        .select(
            "source", "b", (F.col("sw").cast("double") / F.col("tw")).alias("mean_b")
        )
    )
    stats = rep_means.groupBy("source").agg(
        F.count("*").alias("nb"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("b", "mean_b"))),
                lambda st: st["mean_b"],
            ),
            F.lit(0.0),
            lambda a, c: a + c,
        ).alias("s1"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("b", "mean_b"))),
                lambda st: st["mean_b"] * st["mean_b"],
            ),
            F.lit(0.0),
            lambda a, c: a + c,
        ).alias("s2"),
    )
    se = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nb")) / (F.col("nb") - 1)
    )
    return stats.select(
        "source",
        F.col("nb").cast("int").alias("n_replicates"),
        round6(F.col("s1") / F.col("nb")).alias("boot_mean"),
        round6(se).alias("boot_se"),
    )
