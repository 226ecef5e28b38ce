"""Round-4 batch 2: set-similarity join with prefix filtering (the
AllPairs/PPJoin family), blocked fuzzy entity resolution, event-sequence
pattern counting (CEP/MATCH_RECOGNIZE shape), MAD-based robust outlier
detection, deterministic bottom-k priority sampling, and equi-depth
histogram construction.

Each fills a named operator family the curation/dedup surface did not
yet cover: PPJoin is THE scalable exact set-similarity join (Bayardo et
al., WWW'07) that MinHash-LSH approximates; blocked ER is the
record-linkage primitive; sequence matching is the Flink-CEP /
ClickHouse-sequenceMatch shape; MAD is the robust alternative to the
z-score outlier queries; bottom-k priority sampling is the mergeable
uniform sample every distributed profiler uses; equi-depth histograms
are the optimizer statistics every engine builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# PPJoin-style prefix-filtered exact set-similarity self-join
# ---------------------------------------------------------------------------

_SSJ_NUM, _SSJ_DEN = 6, 10  # Jaccard threshold τ = 0.6 as a RATIONAL

_SSJ_SQL = f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
toks AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tok
  FROM (
    SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
    FROM words WHERE len(ws) >= 3
  )
),
sz AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS u, b.doc_id AS w, count(*) AS i
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT u, w, i AS inter, sa.n AS sz_u, sb.n AS sz_w,
       {round6_sql("CAST(i AS DOUBLE) / (sa.n + sb.n - i)")} AS jac
FROM inter
JOIN sz sa ON u = sa.doc_id JOIN sz sb ON w = sb.doc_id
WHERE {_SSJ_DEN} * i >= {_SSJ_NUM} * (sa.n + sb.n - i)
"""


@register("ns_setsim_prefix_join", sql=_SSJ_SQL)
def ns_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.6 set-similarity self-join over word-3-shingle
    SETS via prefix filtering (AllPairs/PPJoin, Bayardo et al. WWW'07)
    — the exact counterpart of MinHash-LSH: near-dup detection with
    zero false negatives, graded at PAIR level. Each doc's shingles are
    ordered by ascending GLOBAL frequency (rarest first); J(x,y) ≥ τ
    forces an overlap i ≥ ⌈τ·|x|⌉, so any qualifying pair must collide
    inside the first |x| − ⌈τ·|x|⌉ + 1 rarest shingles — only those
    PREFIX shingles are emitted as join keys, and rare shingles have
    few carriers, so the candidate join is a sliver of the full
    shingle join. Candidates are then verified exactly (intersection
    via the candidate-restricted join, rational-arithmetic threshold
    τD·i ≥ τN·union — no float compare, no ⌈τ·n⌉ float-ceil hazard).

    The join unit is the 3-word shingle, not the word, for the same
    reason every near-dup system shingles first: set similarity over a
    tiny vocabulary is uninformative AND computationally degenerate —
    measured on this corpus (31 distinct words), word-level prefixes
    prune nothing and the candidate set approaches all-pairs (~10⁶
    candidate pairs at sf0.1, 108 s), while the shingle space
    (≥ 16k distinct) is sparse: only true near-dups collide, the same
    plan runs in ~1 s, and the output is the meaningful pair set.

    The oracle is the brute-force shingle self-join — the spec the
    prefix filter must reproduce verbatim.

    Scale: the global shingle-frequency table aggregates map-side;
    prefixes shrink each doc to a few join keys; the verify join
    touches candidate pairs only. One corpus-wide shuffle on shingle,
    one on pair — never doc×doc."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select("doc_id", F.split("text", " ").alias("ws")).filter(
        F.size("ws") >= 3
    )
    toks = (
        words.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 3),"
                    " i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
                )
            ).alias("tok"),
        )
        .distinct()
        # the shingle table feeds FIVE consumers (freq, sizes, prefix,
        # and both verify sides): pin it once or every branch re-runs
        # the explode+distinct (SCALE.md §5 — the materialized
        # signature-table pattern)
        .localCheckpoint(eager=True)
    )
    sz = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    # global order: rarest shingle first, ties by shingle string. The
    # prefix theorem needs any CONSISTENT total order, not a dense
    # rank, so (c, tok) is used directly as the per-doc sort key — no
    # global row_number over the vocabulary (which would be a
    # single-partition sort of a corpus-scaled table at 100 TB)
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    ranked = (
        # no broadcast hints: the frequency table is |vocab| rows and
        # the size table |docs| rows — tiny here (Catalyst auto-
        # broadcasts under threshold) but corpus-scaled at 100 TB,
        # where these become plain shuffle joins on their keys
        toks.join(freq, "tok")
        .join(sz, "doc_id")
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("c", "tok")),
        )
    )
    # prefix length |d| - minOverlap + 1, minOverlap = ceil(τ·n) in
    # EXACT integer arithmetic: (τN·n + τD - 1) div τD — a float
    # ceil(0.6·35) = ceil(21.000000000000004) = 22 would silently
    # shorten the prefix and drop pairs
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.expr(f"(({_SSJ_NUM} * n + {_SSJ_DEN - 1}) div {_SSJ_DEN})") + 1
    ).select("doc_id", "tok", "pos", "n").localCheckpoint(eager=True)  # self-joined below
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin candidate filters on top of the prefix collision —
    # measured at sf0.1 they cut candidates 299k → ~pair-count:
    # length: sizes must be within factor τ of each other;
    # positional: the tokens at/after the colliding positions must
    # still admit the pair's minimum overlap α = ⌈τ/(1+τ)·(nx+ny)⌉
    # (integer arithmetic: (τN·(nx+ny) + τN+τD-1) div (τN+τD)).
    alpha = F.expr(
        f"(({_SSJ_NUM} * (a.n + b.n) + {_SSJ_NUM + _SSJ_DEN - 1}))"
        f" div {_SSJ_NUM + _SSJ_DEN}"
    )
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n") * _SSJ_DEN >= F.col("b.n") * _SSJ_NUM)
            & (F.col("b.n") * _SSJ_DEN >= F.col("a.n") * _SSJ_NUM)
            & (
                F.least(
                    F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
                )
                + 1
                >= alpha
            ),
        )
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("w"))
        .distinct()
    )
    # exact verify restricted to candidates: intersection size via the
    # candidate-keyed token join
    tu = toks.select(F.col("doc_id").alias("u"), "tok")
    tw = toks.select(F.col("doc_id").alias("w"), "tok")
    inter = (
        cand.join(tu, "u").join(tw, ["w", "tok"])
        .groupBy("u", "w")
        .agg(F.count("*").alias("i"))
    )
    su = sz.select(F.col("doc_id").alias("u"), F.col("n").alias("sz_u"))
    sw = sz.select(F.col("doc_id").alias("w"), F.col("n").alias("sz_w"))
    union_sz = F.col("sz_u") + F.col("sz_w") - F.col("i")
    return (
        inter.join(su, "u")
        .join(sw, "w")
        .filter(F.lit(_SSJ_DEN) * F.col("i") >= F.lit(_SSJ_NUM) * union_sz)
        .select(
            "u",
            "w",
            F.col("i").alias("inter"),
            "sz_u",
            "sz_w",
            round6(F.col("i").cast("double") / union_sz).alias("jac"),
        )
    )


# ---------------------------------------------------------------------------
# blocked fuzzy entity resolution (record linkage)
# ---------------------------------------------------------------------------

_ER_SQL = """
WITH e AS (
  SELECT DISTINCT p_name,
         string_split(p_name, ' ')[1] AS adj,
         string_split(p_name, ' ')[-1] AS noun
  FROM part
)
SELECT a.p_name AS name_a, b.p_name AS name_b, a.noun AS block_key,
       levenshtein(a.adj, b.adj) AS edit_dist
FROM e a JOIN e b
  ON a.noun = b.noun AND a.p_name < b.p_name
WHERE levenshtein(a.adj, b.adj) <= 2
"""


@register("er_fuzzy_blocked_pairs", sql=_ER_SQL)
def er_fuzzy_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution over part names: distinct name
    entities are BLOCKED on the head noun (the classic blocking key —
    candidate pairs only form inside a block, which is what makes
    record linkage subquadratic), then verified with edit distance ≤ 2
    on the modifier. The blocking is part of the operator's declared
    semantics, so the oracle applies the identical block + verify —
    grading both the blocking join and the Levenshtein verify.

    Scale: dedupe-to-entities first (the big shrink), one shuffle on
    the block key, per-block pair generation bounded by block size —
    the standard ER pipeline (Fellegi-Sunter blocking stage). A hot
    block (skewed noun) would switch to sorted-neighborhood within the
    block; levenshtein runs JVM-side (built-in), no UDF."""
    part = load_table(spark, sf_dir, "part")
    ent = (
        part.select("p_name").distinct()
        .withColumn("adj", F.split("p_name", " ").getItem(0))
        .withColumn("noun", F.element_at(F.split("p_name", " "), -1))
    )
    a = ent.select(
        F.col("p_name").alias("name_a"), F.col("adj").alias("adj_a"), F.col("noun").alias("block_key")
    )
    b = ent.select(
        F.col("p_name").alias("name_b"), F.col("adj").alias("adj_b"), F.col("noun").alias("block_key")
    )
    return (
        a.join(b, "block_key")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("adj_a", "adj_b"))
        .filter(F.col("edit_dist") <= 2)
        .select("name_a", "name_b", "block_key", "edit_dist")
    )


# ---------------------------------------------------------------------------
# event-sequence pattern counting (CEP / MATCH_RECOGNIZE shape)
# ---------------------------------------------------------------------------

_SEQ_SQL = f"""
WITH seqs AS (
  SELECT user_id,
         count(*) AS n_events,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST((length(s) - length(replace(s, 'vp', ''))) / 2 AS BIGINT) AS vp_count,
       CAST((length(s) - length(replace(s, 'cvp', ''))) / 3 AS BIGINT) AS cvp_count,
       {round6_sql("(length(s) - length(replace(s, 'vp', ''))) / 2.0"
                   " / greatest(length(s) - length(replace(s, 'v', '')), 1)")}
         AS vp_per_view
FROM seqs
"""


@register("seq_pattern_match_counts", sql=_SEQ_SQL)
def seq_pattern_match_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence pattern counting — the CEP /
    MATCH_RECOGNIZE / ClickHouse-sequenceMatch shape: each user's
    events collapse (time-ordered, ties by event_id) into a symbol
    string (c/s/e/v/p initials), and adjacency patterns are counted by
    non-overlapping substring matching: view→purchase ('vp') and
    click→view→purchase ('cvp'), plus the vp-per-view conversion rate.
    The replace-and-measure count is engine-portable and greedy
    left-to-right in both dialects.

    Scale: one shuffle (groupBy user); the symbol string is one byte
    per event, so even a power user's sequence is KB-scale — this is
    the standard "sessionize then pattern-match" reduction that keeps
    CEP out of the per-event state machine until a true streaming
    engine (applyInPandasWithState) is required. Ordering inside the
    aggregate is pinned by array_sort on (ts_us, event_id) structs."""
    ev = load_table(spark, sf_dir, "events")
    sym = F.substring("event_type", 1, 1)
    seq = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.unix_micros("ts").alias("ts_us"),
                            F.col("event_id").alias("event_id"),
                            sym.alias("sym"),
                        )
                    )
                ),
                lambda s: s["sym"],
            ),
        ).alias("s"),
    )

    def count_pat(pat: str):
        return (
            (F.length("s") - F.length(F.replace(F.col("s"), F.lit(pat))))
            / len(pat)
        ).cast("long")

    views = F.greatest(
        F.length("s") - F.length(F.replace(F.col("s"), F.lit("v"))), F.lit(1)
    )
    return seq.select(
        "user_id",
        "n_events",
        count_pat("vp").alias("vp_count"),
        count_pat("cvp").alias("cvp_count"),
        round6(
            (F.length("s") - F.length(F.replace(F.col("s"), F.lit("vp"))))
            / F.lit(2.0)
            / views
        ).alias("vp_per_view"),
    )


# ---------------------------------------------------------------------------
# MAD-based robust outlier detection
# ---------------------------------------------------------------------------

_MAD_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events
),
m AS (SELECT event_type, median(cents) AS med FROM c GROUP BY event_type),
d AS (
  SELECT c.event_type, cents, abs(cents - med) AS ad, med
  FROM c JOIN m USING (event_type)
),
md AS (SELECT event_type, median(ad) AS mad FROM d GROUP BY event_type)
SELECT d.event_type, count(*) AS n,
       min(d.med) AS med_cents, min(md.mad) AS mad_cents,
       sum(CASE WHEN ad > 5 * mad THEN 1 ELSE 0 END) AS n_outliers
FROM d JOIN md USING (event_type)
GROUP BY d.event_type
"""


@register("mad_robust_outliers", sql=_MAD_SQL)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute
    deviation (MAD) instead of stddev — the estimator that does NOT
    move when the outliers it is hunting contaminate the fit (50%
    breakdown point vs 0% for the z-score queries' mean/σ). A value is
    flagged when |x − median| > 5·MAD. Values ride integer cents;
    both engines interpolate even-count medians to exact .5 halves, so
    every comparison is float-exact.

    Scale: three scan-stage passes glued by BROADCAST joins of the
    5-row per-type statistics — the fact table shuffles only for the
    two median aggregations (percentile_approx would make those
    single-pass mergeable sketches when exactness can be traded)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    med = c.groupBy("event_type").agg(F.median("cents").alias("med"))
    d = c.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("cents") - F.col("med"))
    )
    mad = d.groupBy("event_type").agg(F.median("ad").alias("mad"))
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("med").alias("med_cents"),
            F.min("mad").alias("mad_cents"),
            F.sum(
                F.when(F.col("ad") > 5 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic bottom-k priority sample
# ---------------------------------------------------------------------------

_BK_K = 100

_BK_SQL = f"""
SELECT event_id, user_id, event_type, md5(CAST(event_id AS VARCHAR)) AS priority
FROM events
ORDER BY priority, event_id
LIMIT {_BK_K}
"""


@register("sample_bottomk_priority", sql=_BK_SQL)
def sample_bottomk_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k priority sample: every row gets priority
    md5(event_id) and the k smallest win — statistically a uniform
    without-replacement sample (each row's hash is an i.i.d. uniform
    draw), but reproducible across engines AND mergeable: bottom-k of
    a union = bottom-k of the per-partition bottom-k's, which is why
    every distributed profiler (and HLL-style distinct sketches) uses
    this shape instead of reservoir state.

    Scale: Spark plans orderBy(...).limit(k) as TakeOrderedAndProject
    — per-partition top-k heaps, one k-row merge at the driver; no
    global sort, no full shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.md5(F.col("event_id").cast("string")).alias("priority"),
        )
        .orderBy("priority", "event_id")
        .limit(_BK_K)
    )


# ---------------------------------------------------------------------------
# equi-depth histogram (optimizer statistics)
# ---------------------------------------------------------------------------

_EQD_BUCKETS = 16

_EQD_SQL = f"""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, o_orderkey
  FROM orders
),
b AS (
  SELECT cents, ntile({_EQD_BUCKETS}) OVER (ORDER BY cents, o_orderkey) AS bucket
  FROM c
)
SELECT bucket, count(*) AS n, min(cents) AS lo_cents, max(cents) AS hi_cents,
       sum(cents) AS sum_cents
FROM b GROUP BY bucket
"""


@register("histogram_equi_depth", sql=_EQD_SQL)
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of order totals — the
    optimizer statistic every engine builds for selectivity estimation
    (Spark's own ANALYZE TABLE ... FOR COLUMNS computes exactly this):
    16 buckets of equal row count with per-bucket bounds. The bucket
    assignment is ntile over a TOTAL order (cents, o_orderkey), so tie
    placement is deterministic in both engines.

    Scale: a global ntile is a single-partition sort in naive form; at
    real scale the same histogram comes from repartitionByRange (range
    exchange samples the distribution) + per-partition counting, or
    approx_percentile boundaries — this exact formulation is the
    correctness oracle those approximations are judged against; the
    graded table is |buckets| rows either way."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderkey",
    )
    b = c.withColumn(
        "bucket",
        F.ntile(_EQD_BUCKETS).over(Window.orderBy("cents", "o_orderkey")),
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
        F.sum("cents").alias("sum_cents"),
    )
