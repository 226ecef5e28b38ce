"""Round-2 batch 18 (this run): rank-biased overlap between retrieval
rankings and a varint/delta storage-size estimate.

RBO's geometric weights p^(d−1)/d are pre-quantized Python literals
(like NDCG's log discounts); varint byte lengths come from a pure
integer CASE ladder — no float anywhere (SCALE.md §13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions import vectors
from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# rank-biased overlap (RBO) between full and truncated rankings
# ---------------------------------------------------------------------------

_RBO_K = 10
_RBO_P = 0.9
_RBO_DIMS = 16
# w_d = (1-p)·p^(d-1)/d in micro-units — identical literals to both engines.
_RBO_W = [
    int(round((1 - _RBO_P) * _RBO_P ** (d - 1) / d * 1e6)) for d in range(1, _RBO_K + 1)
]


def _rbo_sql() -> str:
    w_list = "[" + ", ".join(str(w) for w in _RBO_W) + "]"
    full_cos = f"{vectors.dot_sql('q.v', 'c.v')} / (q.nrm * c.nrm)"
    tr_cos = f"{vectors.dot_sql('q.tv', 'c.tv')} / (q.tnrm * c.tnrm)"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, {vectors.l2_norm_sql('v')} AS nrm,
             list_slice(v, 1, {_RBO_DIMS}) AS tv
      FROM e),
t AS (SELECT vec_id, v, nrm, tv,
             sqrt(list_reduce(list_transform(tv, x -> x * x), (a, b) -> a + b)) AS tnrm
      FROM n),
q AS (SELECT * FROM t WHERE vec_id % 100 = 7),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         {round6_sql(full_cos)} AS fc, {round6_sql(tr_cos)} AS tc
  FROM q JOIN t c ON c.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, match_id,
         row_number() OVER (PARTITION BY query_id ORDER BY fc DESC, match_id) AS ra,
         row_number() OVER (PARTITION BY query_id ORDER BY tc DESC, match_id) AS rb
  FROM scored
  QUALIFY ra <= {_RBO_K} OR rb <= {_RBO_K}
),
depth AS (
  SELECT r.query_id, d.d,
         sum(CASE WHEN r.ra <= d.d AND r.rb <= d.d THEN 1 ELSE 0 END) AS overlap
  FROM ranked r CROSS JOIN (SELECT unnest(range(1, {_RBO_K + 1})) AS d) d
  GROUP BY r.query_id, d.d
)
SELECT query_id,
       CAST(sum(overlap * ({w_list}[d])) AS BIGINT) AS rbo_micro_num,
       CAST(max(CASE WHEN d = {_RBO_K} THEN overlap END) AS BIGINT)
         AS overlap_at_{_RBO_K},
       {round6_sql(f"CAST(sum(overlap * ({w_list}[d])) AS DOUBLE) / 1e6"
                   f" + {_RBO_P ** _RBO_K!r}"
                   f" * CAST(max(CASE WHEN d = {_RBO_K} THEN overlap END) AS DOUBLE)"
                   f" / {_RBO_K}")} AS rbo_ext
FROM depth GROUP BY query_id
"""


@register("retrieval_rbo_topk", _rbo_sql())
def retrieval_rbo_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between the full-vector
    and truncated-vector rankings, extrapolated at depth 10 — the
    top-weighted list-similarity metric that completes the ranking-eval
    family (recall overlap = ns_matryoshka_recall, graded gain =
    retrieval_ndcg_at_k, fusion = retrieval_rrf_fusion). Per-depth
    overlaps are exact integers; the geometric weights (1−p)p^(d−1)/d
    are pre-quantized micro-unit literals shared by both dialects, so
    the weighted sum is int64 and only the final extrapolation term
    touches a double. The depth grid is a 10-row cross join AFTER the
    rankings are truncated to their top-10s."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    t = e.select(
        "vec_id",
        "v",
        vectors.l2_norm("v").alias("nrm"),
        F.slice(F.col("v"), 1, _RBO_DIMS).alias("tv"),
    ).withColumn(
        "tnrm",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("tv"), lambda x: x * x), F.lit(0.0), lambda a, b: a + b
            )
        ),
    )
    q = t.filter(F.col("vec_id") % 100 == 7).select(
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
    scored = pairs.select(
        "query_id",
        "match_id",
        round6(vectors.cosine("qv", "cv", F.col("qn"), F.col("cn"))).alias("fc"),
        round6(vectors.cosine("qtv", "ctv", F.col("qtn"), F.col("ctn"))).alias(
            "tc"
        ),
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("fc"), F.asc("match_id"))
    wb = Window.partitionBy("query_id").orderBy(F.desc("tc"), F.asc("match_id"))
    ranked = scored.select(
        "query_id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    ).filter((F.col("ra") <= _RBO_K) | (F.col("rb") <= _RBO_K))
    depth = (
        ranked.crossJoin(
            F.broadcast(
                ranked.sparkSession.range(1, _RBO_K + 1).select(
                    F.col("id").cast("int").alias("d")
                )
            )
        )
        .groupBy("query_id", "d")
        .agg(
            F.sum(
                F.when((F.col("ra") <= F.col("d")) & (F.col("rb") <= F.col("d")), 1).otherwise(
                    0
                )
            ).alias("overlap")
        )
    )
    wlit = F.array(*[F.lit(w) for w in _RBO_W])
    s = depth.groupBy("query_id").agg(
        F.sum(F.col("overlap") * F.element_at(wlit, F.col("d"))).alias("num"),
        F.max(F.when(F.col("d") == _RBO_K, F.col("overlap"))).alias("ok"),
    )
    rbo = F.col("num").cast("double") / 1e6 + (_RBO_P**_RBO_K) * F.col("ok").cast(
        "double"
    ) / _RBO_K
    return s.select(
        "query_id",
        F.col("num").cast("long").alias("rbo_micro_num"),
        F.col("ok").cast("long").alias(f"overlap_at_{_RBO_K}"),
        round6(rbo).alias("rbo_ext"),
    )


# ---------------------------------------------------------------------------
# varint + delta encoding size estimate for the timestamp column
# ---------------------------------------------------------------------------


def _varint_len_sql(zz: str) -> str:
    # thresholds stop at 128^8 = 2^56 (timestamps' zigzag deltas are far
    # smaller); the ELSE arm absorbs the 9/10-byte tail identically in
    # both dialects and avoids the 2^63 literal int64 cannot hold.
    cases = " ".join(
        f"WHEN {zz} < {1 << (7 * k)} THEN {k}" for k in range(1, 9)
    )
    return f"CASE {cases} ELSE 9 END"


_VARINT_SQL = f"""
WITH d AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS delta
  FROM events
),
z AS (
  SELECT event_type,
         CASE WHEN delta >= 0 THEN 2 * delta ELSE -2 * delta - 1 END AS zz
  FROM d WHERE delta IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_deltas,
       CAST(count(*) * 8 AS BIGINT) AS raw_bytes,
       CAST(sum({_varint_len_sql('zz')}) AS BIGINT) AS varint_bytes,
       {round6_sql("1.0 - CAST(sum(" + _varint_len_sql('zz') + ") AS DOUBLE)"
                   " / (count(*) * 8)")} AS savings_ratio
FROM z GROUP BY event_type
"""


@register("varint_delta_size_estimate", _VARINT_SQL)
def varint_delta_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-engineering audit: how many bytes would the timestamp
    column cost under delta + zigzag + varint encoding (the Parquet
    DELTA_BINARY_PACKED / protobuf family) vs raw int64? Per-stream
    sorted deltas zigzag to unsigned and the varint byte count is a
    pure integer CASE ladder over powers of 128 — no log2, no float —
    so the byte totals are engine-exact. The 8× raw baseline and the
    savings ratio quantify why time-ordered layout matters at 100 TB:
    encoding efficiency is a SORT-ORDER property, and this query is
    the audit that justifies the layout job."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    zz = F.when(F.col("delta") >= 0, 2 * F.col("delta")).otherwise(
        -2 * F.col("delta") - 1
    )
    vlen = F.lit(9)
    for k in range(8, 0, -1):
        vlen = F.when(zz < (1 << (7 * k)), k).otherwise(vlen)
    z = d.select("event_type", vlen.alias("vlen"))
    return z.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_deltas"),
        (F.count("*") * 8).cast("long").alias("raw_bytes"),
        F.sum("vlen").cast("long").alias("varint_bytes"),
        round6(
            1.0 - F.sum("vlen").cast("double") / (F.count("*") * 8)
        ).alias("savings_ratio"),
    )
