"""Round-4 batch 7: tokenizer vocabulary coverage, Matryoshka
truncation recall, and hard-negative mining — the retrieval/tokenizer
evaluation tail of the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import text, vectors
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# tokenizer vocabulary coverage / OOV audit
# ---------------------------------------------------------------------------

_VOCAB_K = 500

_VOCAB_SQL = f"""
WITH toks AS (
  SELECT source, unnest({text.tokens_sql('text')}) AS term FROM documents
),
freq AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
vocab AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY c DESC, term) AS rk FROM freq
  ) WHERE rk <= {_VOCAB_K}
)
SELECT t.source,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS in_vocab,
       CAST(count(DISTINCT CASE WHEN v.term IS NULL THEN t.term END) AS BIGINT)
         AS distinct_oov,
       {round6_sql(
           "1.0 - CAST(sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END)"
           " AS DOUBLE) / count(*)"
       )} AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.term = v.term
GROUP BY t.source
"""


@register("ns_vocab_coverage", _VOCAB_SQL)
def ns_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage: freeze the top-500 corpus terms as
    the vocabulary, then report each source's out-of-vocabulary token
    rate and distinct OOV type count — the audit run before committing
    a tokenizer (high OOV on one source → UNK-flooded training text).

    Shape: the vocabulary is a rank-window over the term-frequency agg
    (tie-broken on the term string, so the cutoff is deterministic),
    then BROADCAST back onto the token stream as a left join — the
    corpus-sized side never reshuffles for the vocab probe. At 100 TB
    the frequency agg is the standard map-combining shuffle and the
    rank window runs over the vocabulary-sized table only."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(text.tokens(F.col("text"))).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count("*").alias("c"))
    vocab = (
        freq.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("term")))
        )
        .filter(F.col("rk") <= _VOCAB_K)
        .select("term", F.lit(1).alias("in_v"))
    )
    j = toks.join(F.broadcast(vocab), "term", "left")
    hit = F.col("in_v").isNotNull()
    return j.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.sum(hit.cast("int")).cast("long").alias("in_vocab"),
        F.count_distinct(F.when(~hit, F.col("term"))).cast("long").alias(
            "distinct_oov"
        ),
        round6(1.0 - F.sum(hit.cast("int")).cast("double") / F.count("*")).alias(
            "oov_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation recall (short-vector retrieval quality)
# ---------------------------------------------------------------------------

_MRL_DIMS = 16
_MRL_K = 5


def _mrl_sql() -> str:
    full_cos = f"{vectors.dot_sql('q.v', 'c.v')} / (q.nrm * c.nrm)"
    tr = f"list_slice(e.v, 1, {_MRL_DIMS})"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, {vectors.l2_norm_sql('v')} AS nrm,
             {tr.replace('e.v', 'v')} AS tv
      FROM e),
t AS (SELECT vec_id, v, nrm, tv,
             sqrt(list_reduce(list_transform(tv, x -> x * x),
                              (a, b) -> a + b)) AS tnrm
      FROM n),
q AS (SELECT * FROM t WHERE vec_id % 50 = 0),
full_rank AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY round({full_cos}, 6) DESC, c.vec_id) AS rk
  FROM q JOIN t c ON c.vec_id != q.vec_id
),
tr_rank AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY round({vectors.dot_sql('q.tv', 'c.tv')}
                          / (q.tnrm * c.tnrm), 6) DESC, c.vec_id) AS rk
  FROM q JOIN t c ON c.vec_id != q.vec_id
)
SELECT f.query_id,
       CAST(count(*) AS BIGINT) AS n_overlap,
       {round6_sql(f"CAST(count(*) AS DOUBLE) / {_MRL_K}")} AS recall_at_{_MRL_K}
FROM (SELECT query_id, match_id FROM full_rank WHERE rk <= {_MRL_K}) f
JOIN (SELECT query_id, match_id FROM tr_rank WHERE rk <= {_MRL_K}) s
  USING (query_id, match_id)
GROUP BY f.query_id
"""


@register("ns_matryoshka_recall", sql=_mrl_sql())
def ns_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation evaluation (Kusupati et al. 2022): how
    much retrieval quality survives truncating embeddings to their
    first 16 of 64 dims? Per query: top-5 overlap between full-vector
    and truncated-vector cosine rankings — the recall@5 an MRL rollout
    measures before serving short vectors (4× memory / bandwidth cut).

    Both rankings run the brute-force broadcast pattern on 6-dp-rounded
    cosines with id tie-breaks (the repo's float-order-free top-k
    idiom); only queries with overlapping hits appear (no overlap → no
    row; the oracle inner join agrees). At scale the truncated ranking
    is the cheap first pass of a two-stage retrieval cascade — same
    plan, 4× narrower scan."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    t = e.select(
        "vec_id",
        "v",
        vectors.l2_norm("v").alias("nrm"),
        F.slice(F.col("v"), 1, _MRL_DIMS).alias("tv"),
    ).withColumn(
        "tnrm",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("tv"), lambda x: x * x),
                F.lit(0.0),
                lambda a, b: a + b,
            )
        ),
    )
    q = t.filter(F.col("vec_id") % 50 == 0).select(
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
    full_cos = F.round(
        vectors.cosine("qv", "cv", F.col("qn"), F.col("cn")), 6
    )
    tr_cos = F.round(
        vectors.cosine("qtv", "ctv", F.col("qtn"), F.col("ctn")), 6
    )
    scored = pairs.select(
        "query_id", "match_id", full_cos.alias("fc"), tr_cos.alias("tc")
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("fc"), F.asc("match_id"))
    wt = Window.partitionBy("query_id").orderBy(F.desc("tc"), F.asc("match_id"))
    ranked = scored.select(
        "query_id",
        "match_id",
        F.row_number().over(wf).alias("rkf"),
        F.row_number().over(wt).alias("rkt"),
    )
    top_full = ranked.filter(F.col("rkf") <= _MRL_K).select("query_id", "match_id")
    top_tr = ranked.filter(F.col("rkt") <= _MRL_K).select("query_id", "match_id")
    overlap = top_full.join(top_tr, ["query_id", "match_id"])
    return overlap.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_overlap"),
        round6(F.count("*").cast("double") / _MRL_K).alias(f"recall_at_{_MRL_K}"),
    )


# ---------------------------------------------------------------------------
# hard-negative mining for retrieval training
# ---------------------------------------------------------------------------

_HN_POOL = 20


def _hard_negative_sql() -> str:
    from matt3r_data_ingestion_serverless_spark.plans.northstar import _emb_norm_cte

    cos = f"{vectors.dot_sql('q.v', 'c.v')} / (q.nrm * c.nrm)"
    return f"""
WITH {_emb_norm_cte()},
lbl AS (SELECT vec_id, label FROM embeddings),
t AS (SELECT n.vec_id, v, nrm, label FROM n JOIN lbl USING (vec_id)),
q AS (SELECT * FROM t WHERE vec_id % 50 = 0),
ranked AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS cand_id, c.label AS cand_label,
         round({cos}, 6) AS cs,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY round({cos}, 6) DESC, c.vec_id) AS rk
  FROM q JOIN t c ON c.vec_id != q.vec_id
),
hard AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rk) AS hn
  FROM ranked
  WHERE rk <= {_HN_POOL} AND cand_label != query_label
)
SELECT query_id, CAST(query_label AS INT) AS query_label,
       cand_id AS hard_negative_id,
       CAST(cand_label AS INT) AS negative_label,
       CAST(rk AS INT) AS rank_in_pool, cs AS cos_sim
FROM hard WHERE hn = 1
"""


@register("ns_hard_negative_mining", sql=_hard_negative_sql())
def ns_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (the contrastive-training data op): for each
    query embedding, the highest-ranked neighbour with a DIFFERENT
    label inside the top-20 pool — the near-miss that teaches a
    retriever its decision boundary (random negatives are too easy;
    BM25/ANN hard negatives are how DPR-style training sets are built).

    One ranking pass (6-dp cosine, id tie-break), then a second
    row_number over the label-mismatch survivors picks the first hard
    negative per query — queries whose entire top-20 shares their label
    yield no row (by design; the oracle agrees). At scale the pool
    comes from the IVF/LSH candidate path instead of the brute-force
    broadcast — the mining windows are unchanged."""
    from matt3r_data_ingestion_serverless_spark.plans.northstar import _emb_normed

    lbl = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    t = _emb_normed(spark, sf_dir).join(lbl, "vec_id")
    q = t.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("label").alias("query_label"),
    )
    c = t.select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("label").alias("cand_label"),
    )
    cs = F.round(vectors.cosine("qv", "cv", F.col("qn"), F.col("cn")), 6)
    ranked = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "query_label", "cand_id", "cand_label", cs.alias("cs"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("cand_id"))
            ),
        )
    )
    hard = ranked.filter(
        (F.col("rk") <= _HN_POOL) & (F.col("cand_label") != F.col("query_label"))
    ).withColumn(
        "hn", F.row_number().over(Window.partitionBy("query_id").orderBy("rk"))
    )
    return hard.filter(F.col("hn") == 1).select(
        "query_id",
        F.col("query_label").cast("int").alias("query_label"),
        F.col("cand_id").alias("hard_negative_id"),
        F.col("cand_label").cast("int").alias("negative_label"),
        F.col("rk").cast("int").alias("rank_in_pool"),
        F.col("cs").alias("cos_sim"),
    )


# ---------------------------------------------------------------------------
# multimodal plumbing: fps frame sampling + ViT patch grids
# ---------------------------------------------------------------------------

_FPS_TARGET_SAMPLES = 8
_FPS_BYTES_PER_FRAME = 100

_FPS_SQL = f"""
WITH v AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         greatest(octet_length(encode(text)) // {_FPS_BYTES_PER_FRAME}, 1)
           AS frame_count
  FROM documents
),
s AS (
  SELECT doc_id, n_bytes, frame_count,
         greatest(frame_count // {_FPS_TARGET_SAMPLES}, 1) AS stride
  FROM v
)
SELECT doc_id, CAST(i AS INT) AS sample_idx,
       CAST(i * stride AS BIGINT) AS frame_idx,
       CAST((i * stride * 1000) // 30 AS BIGINT) AS t_ms,
       CAST((i * stride * {_FPS_BYTES_PER_FRAME}) % n_bytes AS BIGINT)
         AS byte_offset
FROM s, (SELECT unnest(range(0, {_FPS_TARGET_SAMPLES})) AS i)
WHERE i * stride < frame_count
"""


@register("ns_multimodal_fps_sample", _FPS_SQL)
def ns_multimodal_fps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: derive (frame_count, stride) from blob
    metadata (the fixture has no codecs, so frame count is synthesized
    from blob size at 100 B/frame, 30 fps) and emit ≤ 8 evenly-strided
    sample points per blob — (frame index, timestamp, byte offset), the
    exact work-list a decode UDF consumes. This is the SCHEDULING half
    of video ingestion: the plan computes where to seek before any
    decoder runs, so the expensive mapInPandas decode
    (ns_multimodal_frame_features) touches only sampled offsets.

    Pure integer arithmetic + a static 8-element explode in the scan
    stage: no shuffle at all — the plan is embarrassingly parallel at
    any scale."""
    from matt3r_data_ingestion_serverless_spark.operators import multimodal

    docs = multimodal.with_blob(spread(load_table(spark, sf_dir, "documents")))
    v = docs.select(
        "doc_id",
        F.octet_length("blob").cast("long").alias("n_bytes"),
    ).withColumn(
        "frame_count",
        F.greatest(F.expr(f"n_bytes div {_FPS_BYTES_PER_FRAME}"), F.lit(1)),
    ).withColumn(
        "stride",
        F.greatest(F.expr(f"frame_count div {_FPS_TARGET_SAMPLES}"), F.lit(1)),
    )
    s = v.select(
        "doc_id",
        "n_bytes",
        "frame_count",
        "stride",
        F.explode(F.sequence(F.lit(0), F.lit(_FPS_TARGET_SAMPLES - 1))).alias("i"),
    ).filter(F.col("i") * F.col("stride") < F.col("frame_count"))
    fr = F.col("i") * F.col("stride")
    return s.select(
        "doc_id",
        F.col("i").cast("int").alias("sample_idx"),
        fr.cast("long").alias("frame_idx"),
        F.expr(f"(i * stride * 1000) div 30").cast("long").alias("t_ms"),
        ((fr * _FPS_BYTES_PER_FRAME) % F.col("n_bytes")).cast("long").alias(
            "byte_offset"
        ),
    )


_PATCH = 32

_PATCH_SQL = f"""
WITH img AS (
  SELECT doc_id,
         64 + (doc_id % 8) * 32 AS w,
         64 + (doc_id % 5) * 32 AS h
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
       CAST(py * (w // {_PATCH}) + px AS INT) AS patch_index,
       CAST(px * {_PATCH} AS INT) AS x0,
       CAST(py * {_PATCH} AS INT) AS y0,
       CAST(px * {_PATCH} + {_PATCH} AS INT) AS x1,
       CAST(py * {_PATCH} + {_PATCH} AS INT) AS y1
FROM img,
     (SELECT unnest(range(0, 16)) AS px),
     (SELECT unnest(range(0, 16)) AS py)
WHERE px < w // {_PATCH} AND py < h // {_PATCH}
"""


@register("ns_image_patch_grid", _PATCH_SQL)
def ns_image_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch-grid construction: each image (dimensions synthesized
    deterministically from doc_id — the container has no image codecs)
    expands to its row-major 32×32 patch boxes with coordinates and
    patch index — the tokenization plan a vision encoder's preprocessor
    consumes, computed relationally so patch extraction parallelizes as
    ordinary rows (crop UDF downstream, one row per patch).

    Like fps sampling, this is shuffle-free scan-stage arithmetic: the
    cross join against two tiny static ranges stays a nested-loop
    broadcast; row counts scale as pixels/patch², not files."""
    docs = load_table(spark, sf_dir, "documents")
    img = docs.select(
        "doc_id",
        (64 + (F.col("doc_id") % 8) * 32).cast("int").alias("w"),
        (64 + (F.col("doc_id") % 5) * 32).cast("int").alias("h"),
    )
    px = spark.range(16).select(F.col("id").cast("int").alias("px"))
    py = spark.range(16).select(F.col("id").cast("int").alias("py"))
    g = img.crossJoin(F.broadcast(px)).crossJoin(F.broadcast(py)).filter(
        (F.col("px") < F.expr(f"w div {_PATCH}"))
        & (F.col("py") < F.expr(f"h div {_PATCH}"))
    )
    return g.select(
        "doc_id",
        "w",
        "h",
        (F.col("py") * F.expr(f"w div {_PATCH}") + F.col("px"))
        .cast("int")
        .alias("patch_index"),
        (F.col("px") * _PATCH).cast("int").alias("x0"),
        (F.col("py") * _PATCH).cast("int").alias("y0"),
        (F.col("px") * _PATCH + _PATCH).cast("int").alias("x1"),
        (F.col("py") * _PATCH + _PATCH).cast("int").alias("y1"),
    )
