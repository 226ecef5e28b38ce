"""Round-4 batch 3: incremental batch-vs-corpus dedup (the production
ingest mode), Mann–Kendall trend testing, SAX time-series
symbolization, cross-source quantile normalization, and an LTTB-style
visual downsample — each exact-integer deterministic and oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import hashing
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# incremental dedup: new batch vs existing corpus
# ---------------------------------------------------------------------------


def _incremental_dedup_sql() -> str:
    from matt3r_data_ingestion_serverless_spark.plans.northstar import (
        JACCARD_DUP,
        _hashed_shingles_cte,
        _jaccard_sql,
        _minhash_band_structs_sql,
    )

    sig = hashing.minhash_from_hashes_sql("sh")
    return f"""
WITH {_hashed_shingles_cte()},
s AS (SELECT doc_id, sh, {sig} AS sig FROM d),
bk AS (SELECT doc_id, unnest({_minhash_band_structs_sql()}, recursive := true) FROM s),
cand AS (SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
         FROM bk b JOIN bk c ON b.band = c.band AND b.key = c.key
         WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0),
v AS (SELECT bid, cid, round({_jaccard_sql('db.sh', 'dc.sh')}, 6) AS j
      FROM cand JOIN d db ON bid = db.doc_id
                JOIN d dc ON cid = dc.doc_id),
m AS (SELECT bid, count(*) AS n, max(j) AS bj
      FROM v WHERE j >= {JACCARD_DUP} GROUP BY bid)
SELECT doc.doc_id,
       CASE WHEN m.n IS NOT NULL THEN 'drop' ELSE 'keep' END AS decision,
       CAST(coalesce(m.n, 0) AS BIGINT) AS n_corpus_matches,
       m.bj AS best_jaccard
FROM documents doc LEFT JOIN m ON doc.doc_id = m.bid
WHERE doc.doc_id % 2 = 1
"""


@register("ns_dedup_incremental", sql=_incremental_dedup_sql())
def ns_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup — the PRODUCTION mode: a new ingest batch
    (odd doc_ids) deduplicated against the EXISTING corpus (even
    doc_ids), never against itself. Batch docs LSH-banding into a
    bucket shared with a corpus doc are exact-Jaccard verified; any
    verified match ≥ τ marks the batch doc 'drop'. Emits the per-doc
    keep/drop audit with match count and best score — the ledger an
    ingest pipeline writes next to every landed batch.

    Scale: the corpus side is a PRECOMPUTED band-key index at rest
    (here recomputed because the fixture has no persisted index); the
    join shuffles on band keys — linear in batch size + touched index
    buckets, never corpus × batch. Asymmetry matters: batch-internal
    dups are deliberately NOT dropped here (that's ns_dedup_minhash_lsh
    / ns_dedup_keep_one's job on the batch alone), so the two compose
    into the full ingest flow: intra-batch dedup → corpus dedup →
    append to corpus + index.
    """
    from matt3r_data_ingestion_serverless_spark.plans.northstar import (
        JACCARD_DUP,
        _jaccard,
        _minhash_band_structs_expr,
        _pin,
        _with_hashed_shingles,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    d = _with_hashed_shingles(docs).select("doc_id", "sh")
    s = _pin(
        d.select("doc_id", "sh", hashing.minhash_from_hashes_expr("sh").alias("sig"))
    )
    bk = s.select(
        "doc_id", F.explode(_minhash_band_structs_expr("sig")).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")
    batch_bk = bk.filter(F.col("doc_id") % 2 == 1)
    corpus_bk = bk.filter(F.col("doc_id") % 2 == 0)
    cand = (
        batch_bk.alias("b")
        .join(
            corpus_bk.alias("c"),
            (F.col("b.band") == F.col("c.band")) & (F.col("b.key") == F.col("c.key")),
        )
        .select(F.col("b.doc_id").alias("bid"), F.col("c.doc_id").alias("cid"))
        .distinct()
    )
    v = (
        cand.join(s.select(F.col("doc_id").alias("bid"), F.col("sh").alias("sh_b")), "bid")
        .join(s.select(F.col("doc_id").alias("cid"), F.col("sh").alias("sh_c")), "cid")
        .select(
            "bid", F.round(_jaccard(F.col("sh_b"), F.col("sh_c")), 6).alias("j")
        )
        .filter(F.col("j") >= JACCARD_DUP)
    )
    m = v.groupBy("bid").agg(F.count("*").alias("n"), F.max("j").alias("bj"))
    batch = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id")
    return batch.join(m, batch.doc_id == m.bid, "left").select(
        "doc_id",
        F.when(F.col("n").isNotNull(), "drop").otherwise("keep").alias("decision"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_corpus_matches"),
        F.col("bj").alias("best_jaccard"),
    )


# ---------------------------------------------------------------------------
# Mann–Kendall monotonic-trend test per channel
# ---------------------------------------------------------------------------

_MK_SQL = f"""
WITH dly AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         sum(CAST(round(value, 0) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END) AS s
  FROM dly a JOIN dly b ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
),
ties AS (
  SELECT event_type, sum(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT event_type, v, count(*) AS t FROM dly GROUP BY 1, 2)
  GROUP BY 1
),
n AS (SELECT event_type, count(*) AS nd FROM dly GROUP BY 1)
SELECT n.event_type, CAST(nd AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s_stat,
       CAST(nd * (nd - 1) * (2 * nd + 5) - tie_term AS BIGINT) AS var18,
       CASE WHEN nd * (nd - 1) * (2 * nd + 5) - tie_term = 0 THEN NULL
            WHEN s > 0 THEN {round6_sql(
                "(s - 1) / sqrt(CAST(nd * (nd - 1) * (2 * nd + 5) - tie_term "
                "AS DOUBLE) / 18.0)"
            )}
            WHEN s < 0 THEN {round6_sql(
                "(s + 1) / sqrt(CAST(nd * (nd - 1) * (2 * nd + 5) - tie_term "
                "AS DOUBLE) / 18.0)"
            )}
            ELSE 0.0 END AS z_stat
FROM n JOIN pairs USING (event_type) JOIN ties USING (event_type)
"""


@register("ts_mann_kendall", _MK_SQL)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test per channel over the daily
    series: S = Σ_{{i<j}} sign(x_j − x_i), tie-corrected variance
    (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18, continuity-corrected Z — the
    nonparametric "is this drifting?" monitor paired with
    ts_theilsen_trend's slope estimate (MK tests, Theil–Sen sizes).

    Scale: the O(d²) pair scan runs on the DAILY aggregate (d = days,
    not events) after one map-side-combining shuffle — 31 days → 465
    pairs per channel; a year is ~66k pairs, trivial. S and the tie
    term stay exact int64; Z is one fixed double formula at the end.
    """
    ev = load_table(spark, sf_dir, "events")
    dly = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.round(F.col("value"), 0).cast("long")).alias("v"))
    a, b = dly.alias("a"), dly.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.v") > F.col("a.v"), 1)
                .when(F.col("b.v") < F.col("a.v"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    ties = (
        dly.groupBy("event_type", "v")
        .agg(F.count("*").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias(
                "tie_term"
            )
        )
    )
    n = dly.groupBy("event_type").agg(F.count("*").alias("nd"))
    j = n.join(pairs, "event_type").join(ties, "event_type")
    nd, s = F.col("nd"), F.col("s")
    var18 = nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term")
    sd = F.sqrt(var18.cast("double") / 18.0)
    z = (
        F.when(var18 == 0, F.lit(None).cast("double"))
        .when(s > 0, round6((s - 1) / sd))
        .when(s < 0, round6((s + 1) / sd))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        nd.cast("long").alias("n_days"),
        s.cast("long").alias("s_stat"),
        var18.cast("long").alias("var18"),
        z.alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# SAX symbolization of the daily series
# ---------------------------------------------------------------------------

_SAX_SEG_DAYS = 4  # PAA segment width in days
_SAX_SQL = f"""
WITH dly AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) AS BIGINT)
           AS di,
         sum(CAST(round(value, 0) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT event_type, count(*) AS n, sum(v) AS s,
         count(*) * sum(v * v) - sum(v) * sum(v) AS k
  FROM dly GROUP BY 1
),
seg AS (
  SELECT event_type, di // {_SAX_SEG_DAYS} AS seg, sum(v) AS s_seg,
         count(*) AS n_seg
  FROM dly GROUP BY 1, 2
),
z AS (
  SELECT s.event_type, s.seg,
         CAST(s.s_seg * g.n - g.s * s.n_seg AS DOUBLE)
           / (s.n_seg * sqrt(CAST(g.k AS DOUBLE))) AS zval
  FROM seg s JOIN g ON s.event_type = g.event_type
  WHERE g.k > 0
),
sym AS (
  SELECT event_type, seg,
         CASE WHEN zval < -0.6745 THEN 'a' WHEN zval < 0 THEN 'b'
              WHEN zval < 0.6745 THEN 'c' ELSE 'd' END AS sy
  FROM z
)
SELECT event_type,
       string_agg(sy, '' ORDER BY seg) AS sax_word,
       count(*) AS n_segments
FROM sym GROUP BY event_type
"""


@register("ts_sax_symbols", _SAX_SQL)
def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation, Lin et al. 2003): z-score
    the channel's daily series, piecewise-aggregate into 4-day
    segments, quantize each segment mean against the 4-symbol Gaussian
    breakpoints (−0.6745, 0, 0.6745) and emit the SAX word — the
    symbolic index motif/anomaly miners build over telemetry.

    Determinism: the z-scored PAA mean is algebraically rearranged so
    every sum is exact int64 — z_seg = (s_seg·n − s·n_seg)/(n_seg·√k)
    with k = n·Σv² − (Σv)² — and the only doubles are one division and
    one sqrt of exact ints, so the breakpoint comparisons can't be
    flipped by summation order in either engine. The word assembles
    with an ordered string_agg / sorted-collect_list fold.

    Scale: daily agg (one shuffle) → per-channel scalars (tiny) →
    per-segment agg; everything after the first shuffle is
    channel-count sized.
    """
    ev = load_table(spark, sf_dir, "events")
    dly = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("di"),
    ).agg(F.sum(F.round(F.col("value"), 0).cast("long")).alias("v"))
    g = dly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        (F.count("*") * F.sum(F.col("v") * F.col("v")) - F.sum("v") * F.sum("v")).alias(
            "k"
        ),
    )
    seg = dly.groupBy(
        "event_type", F.expr(f"di div {_SAX_SEG_DAYS}").alias("seg")
    ).agg(F.sum("v").alias("s_seg"), F.count("*").alias("n_seg"))
    z = (
        seg.join(g, "event_type")
        .filter(F.col("k") > 0)
        .select(
            "event_type",
            "seg",
            (
                (F.col("s_seg") * F.col("n") - F.col("s") * F.col("n_seg")).cast(
                    "double"
                )
                / (F.col("n_seg") * F.sqrt(F.col("k").cast("double")))
            ).alias("zval"),
        )
    )
    sym = z.select(
        "event_type",
        "seg",
        F.when(F.col("zval") < -0.6745, "a")
        .when(F.col("zval") < 0, "b")
        .when(F.col("zval") < 0.6745, "c")
        .otherwise("d")
        .alias("sy"),
    )
    word = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seg", "sy"))), lambda x: x["sy"]
        ),
        "",
    )
    return sym.groupBy("event_type").agg(
        word.alias("sax_word"), F.count("*").alias("n_segments")
    )


# ---------------------------------------------------------------------------
# cross-source quantile normalization (rank-bucket granularity)
# ---------------------------------------------------------------------------

_QN_BUCKETS = 20

_QN_SQL = f"""
WITH b AS (
  SELECT source, doc_id, n_chars,
         ntile({_QN_BUCKETS}) OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS bucket
  FROM documents
),
ref AS (
  SELECT bucket, sum(n_chars) AS s, count(*) AS c FROM b GROUP BY bucket
)
SELECT b.source, CAST(b.bucket AS INT) AS bucket,
       count(*) AS n_docs,
       {round6_sql("CAST(sum(b.n_chars) AS DOUBLE) / count(*)")} AS raw_mean,
       {round6_sql("CAST(max(ref.s) AS DOUBLE) / max(ref.c)")} AS normalized_value
FROM b JOIN ref ON b.bucket = ref.bucket
GROUP BY b.source, b.bucket
"""


@register("ns_quantile_normalize", _QN_SQL)
def ns_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources (bucket granularity): rank
    each source's docs into 20 length quantile buckets, then replace a
    bucket's value with the CROSS-SOURCE mean of that rank bucket — the
    distribution-alignment transform (microarray-born, now used to
    de-bias per-source length/quality distributions before mixing a
    corpus). Output: per (source, bucket) the raw mean vs the value
    every source's bucket maps to after normalization.

    Scale: ntile needs a per-source sort — one shuffle partitioned by
    source (skew-salted if one source dominates); the 20-row reference
    table broadcasts back. Tie-break on doc_id keeps bucket assignment
    a total order, reproducible across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.ntile(_QN_BUCKETS)
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("bucket"),
    )
    ref = b.groupBy("bucket").agg(F.sum("n_chars").alias("s"), F.count("*").alias("c"))
    return (
        b.join(F.broadcast(ref), "bucket")
        .groupBy("source", F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            round6(F.sum("n_chars").cast("double") / F.count("*")).alias("raw_mean"),
            round6(F.max("s").cast("double") / F.max("c")).alias("normalized_value"),
        )
    )


# ---------------------------------------------------------------------------
# LTTB-style visual downsample (bucket-anchored, fully parallel)
# ---------------------------------------------------------------------------

_LTTB_SQL = """
WITH pts AS (
  SELECT event_type, event_id, epoch_us(ts) AS t_us,
         CAST(round(value, 0) AS BIGINT) AS v,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
  FROM events
),
bkt AS (
  SELECT event_type, day, sum(v) AS s, count(*) AS n FROM pts GROUP BY 1, 2
),
nb AS (
  SELECT event_type, day, n,
         lag(s)  OVER w AS s_prev, lag(n)  OVER w AS n_prev,
         lead(s) OVER w AS s_next, lead(n) OVER w AS n_next
  FROM bkt
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
scored AS (
  SELECT p.event_type, p.day, p.event_id, p.t_us, p.v,
         abs(2 * p.v * nb.n_prev * nb.n_next
             - nb.s_prev * nb.n_next - nb.s_next * nb.n_prev) AS score,
         row_number() OVER (PARTITION BY p.event_type, p.day
                            ORDER BY abs(2 * p.v * nb.n_prev * nb.n_next
                                         - nb.s_prev * nb.n_next
                                         - nb.s_next * nb.n_prev) DESC,
                                     p.event_id) AS rn
  FROM pts p JOIN nb ON p.event_type = nb.event_type AND p.day = nb.day
  WHERE nb.s_prev IS NOT NULL AND nb.s_next IS NOT NULL
)
SELECT event_type, day, event_id, CAST(t_us AS BIGINT) AS t_us, v,
       CAST(score AS BIGINT) AS score
FROM scored WHERE rn = 1
"""


@register("ts_downsample_lttb", _LTTB_SQL)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB-flavored visual downsampling: one representative point per
    (channel, day) — the point deviating most from the straight line
    through its neighbour buckets' means. True LTTB anchors on the
    PREVIOUSLY SELECTED point, a sequential dependency no parallel
    engine should accept; anchoring on fixed bucket means (the
    standard parallel variant) keeps the selection embarrassingly
    parallel and cross-engine exact: score = |2·v·n₋·n₊ − s₋·n₊ −
    s₊·n₋| is the deviation |v − (m₋+m₊)/2| scaled by the positive
    constant 2n₋n₊ — same argmax, all int64, no division.

    Scale: bucket stats are one map-combining shuffle; neighbour means
    come from a lag/lead window over BUCKETS (days, not points); the
    scan-sized argmax per bucket reuses the same (type, day) hash. The
    first/last buckets have no neighbours and are kept whole by the
    real renderer; they are omitted here.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.round(F.col("value"), 0).cast("long").alias("v"),
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
    )
    bkt = pts.groupBy("event_type", "day").agg(
        F.sum("v").alias("s"), F.count("*").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    nb = bkt.select(
        "event_type",
        "day",
        F.lag("s").over(w).alias("s_prev"),
        F.lag("n").over(w).alias("n_prev"),
        F.lead("s").over(w).alias("s_next"),
        F.lead("n").over(w).alias("n_next"),
    ).filter(F.col("s_prev").isNotNull() & F.col("s_next").isNotNull())
    j = pts.join(nb, ["event_type", "day"])
    score = F.abs(
        2 * F.col("v") * F.col("n_prev") * F.col("n_next")
        - F.col("s_prev") * F.col("n_next")
        - F.col("s_next") * F.col("n_prev")
    )
    scored = j.select(
        "event_type", "day", "event_id", "t_us", "v", score.alias("score")
    )
    best = scored.groupBy("event_type", "day").agg(
        F.max_by(
            F.struct("event_id", "t_us", "v", "score"),
            F.struct(F.col("score"), (-F.col("event_id")).alias("nid")),
        ).alias("p")
    )
    return best.select(
        "event_type",
        "day",
        F.col("p.event_id").alias("event_id"),
        F.col("p.t_us").alias("t_us"),
        F.col("p.v").alias("v"),
        F.col("p.score").alias("score"),
    )
