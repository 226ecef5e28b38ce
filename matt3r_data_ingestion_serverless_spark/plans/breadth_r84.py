"""Round-4 batch 12: Shapley-value attribution, exact 1-D Wasserstein
drift, CUPED variance reduction, and the IVF recall curve.

Four operator families for the experimentation / drift / retrieval-
evaluation surface: coalition-game channel attribution over touchset
subsets (the data-driven successor to last-touch), the exact earth-
mover distance between two value distributions (the drift metric PSI
approximates), CUPED covariate adjustment (the industry-standard
experiment variance reducer), and recall@k as a function of IVF nprobe
(the ANN quality/cost dial measured against the brute-force oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Shapley-value channel attribution
# ---------------------------------------------------------------------------

_CHANNELS = ("click", "error", "signup", "view")  # bit i = 1 << i
_N_CH = len(_CHANNELS)


def _shapley_pairs() -> list[tuple[str, int, int, float]]:
    """(channel, mask_without, mask_with, weight) for every channel ×
    subset-not-containing-it; weight = |S|!(n−1−|S|)!/n! — the exact
    Shapley coalition weights (floats are identical literals in both
    dialects)."""
    rows = []
    for i, ch in enumerate(_CHANNELS):
        bit = 1 << i
        for s in range(1 << _N_CH):
            if s & bit:
                continue
            size = bin(s).count("1")
            w = (
                math.factorial(size)
                * math.factorial(_N_CH - 1 - size)
                / math.factorial(_N_CH)
            )
            rows.append((ch, s, s | bit, w))
    return rows


def _shapley_sql() -> str:
    bits = " ".join(
        f"WHEN '{ch}' THEN {1 << i}" for i, ch in enumerate(_CHANNELS)
    )
    pair_rows = ", ".join(
        f"('{ch}', {m0}, {m1}, {w!r})" for ch, m0, m1, w in _shapley_pairs()
    )
    return f"""
WITH fp AS (
  SELECT user_id, min(CASE WHEN event_type = 'purchase' THEN ts END) AS fpts
  FROM events GROUP BY 1
),
tt AS (
  SELECT DISTINCT e.user_id, e.event_type
  FROM events e JOIN fp USING (user_id)
  WHERE e.event_type != 'purchase' AND (fp.fpts IS NULL OR e.ts < fp.fpts)
),
um AS (
  SELECT fp.user_id,
         coalesce(sum(CASE t.event_type {bits} END), 0) AS mask,
         CASE WHEN fp.fpts IS NULL THEN 0 ELSE 1 END AS conv
  FROM fp LEFT JOIN tt t USING (user_id)
  GROUP BY fp.user_id, fp.fpts
),
stats AS (SELECT mask, count(*) AS n_users, sum(conv) AS n_conv FROM um GROUP BY 1),
v AS (
  SELECT r.range AS mask,
         coalesce(CAST(s.n_conv AS DOUBLE) / s.n_users, 0.0) AS v
  FROM range({1 << _N_CH}) r LEFT JOIN stats s ON s.mask = r.range
),
pairs(channel, m0, m1, w) AS (VALUES {pair_rows})
SELECT p.channel, {round6_sql('sum(p.w * (vw.v - vo.v))')} AS shapley_r
FROM pairs p JOIN v vw ON vw.mask = p.m1 JOIN v vo ON vo.mask = p.m0
GROUP BY p.channel
"""


@register("attribution_shapley_subsets", sql=_shapley_sql())
def attribution_shapley_subsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution: each user's touchset is the
    set of channels (non-purchase event types) seen STRICTLY BEFORE
    their first purchase (all channels for non-converters); the
    characteristic function v(S) is the conversion rate of users whose
    touchset is exactly S, and each channel's credit is the exact
    Shapley sum Σ |S|!(n−1−|S|)!/n!·(v(S∪i)−v(S)) — the coalition-game
    attribution that last-touch/position-based heuristics approximate.

    Scale: the data-heavy part is ONE distinct + groupBy(user) to build
    touchset bitmasks and ONE groupBy(mask) for v — everything after
    runs on the constant-size 2ⁿ subset lattice (16 rows) joined
    against a 32-row literal coalition table. With n channels the
    lattice is 2ⁿ: the standard sampled-permutation estimator replaces
    the literal table when n grows, with the identical mask machinery."""
    ev = load_table(spark, sf_dir, "events")
    fp = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fpts")
    )
    tt = (
        ev.join(fp, "user_id")
        .filter(
            (F.col("event_type") != "purchase")
            & (F.col("fpts").isNull() | (F.col("ts") < F.col("fpts")))
        )
        .select("user_id", "event_type")
        .distinct()
    )
    mask_bits = F.coalesce(
        F.sum(
            F.when(F.col("event_type") == _CHANNELS[0], 1)
            .when(F.col("event_type") == _CHANNELS[1], 2)
            .when(F.col("event_type") == _CHANNELS[2], 4)
            .when(F.col("event_type") == _CHANNELS[3], 8)
        ),
        F.lit(0),
    )
    um = (
        fp.join(tt, "user_id", "left")
        .groupBy("user_id", "fpts")
        .agg(mask_bits.alias("mask"))
        .select(
            "mask", F.when(F.col("fpts").isNull(), 0).otherwise(1).alias("conv")
        )
    )
    stats = um.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("conv").alias("n_conv")
    )
    v = (
        spark.range(1 << _N_CH)
        .select(F.col("id").alias("mask"))
        .join(stats, "mask", "left")
        .select(
            "mask",
            F.coalesce(
                F.col("n_conv").cast("double") / F.col("n_users"), F.lit(0.0)
            ).alias("v"),
        )
    )
    pairs = spark.createDataFrame(
        _shapley_pairs(), "channel string, m0 int, m1 int, w double"
    )
    vw = v.select(F.col("mask").alias("m1"), F.col("v").alias("v1"))
    vo = v.select(F.col("mask").alias("m0"), F.col("v").alias("v0"))
    return (
        pairs.join(F.broadcast(vw), "m1")
        .join(F.broadcast(vo), "m0")
        .groupBy("channel")
        .agg(round6(F.sum(F.col("w") * (F.col("v1") - F.col("v0")))).alias("shapley_r"))
    )


# ---------------------------------------------------------------------------
# exact 1-D Wasserstein (earth mover) distance
# ---------------------------------------------------------------------------

_W1_A, _W1_B = "click", "view"
_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

_W1_SQL = f"""
WITH x AS (
  SELECT {_CENTS} AS c,
         CASE WHEN event_type = '{_W1_A}' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = '{_W1_B}' THEN 1 ELSE 0 END AS ib
  FROM events
  WHERE event_type IN ('{_W1_A}', '{_W1_B}') AND value IS NOT NULL
),
g AS (SELECT c, sum(ia) AS na_c, sum(ib) AS nb_c FROM x GROUP BY c),
tot AS (SELECT sum(na_c) AS na, sum(nb_c) AS nb FROM g),
run AS (
  SELECT c,
         sum(na_c) OVER (ORDER BY c) AS cum_a,
         sum(nb_c) OVER (ORDER BY c) AS cum_b,
         lead(c) OVER (ORDER BY c) AS next_c
  FROM g
)
SELECT tot.na, tot.nb,
       (SELECT count(*) FROM g) AS n_support,
       {round6_sql(
           "sum(abs(CAST(run.cum_a AS DOUBLE) / tot.na"
           " - CAST(run.cum_b AS DOUBLE) / tot.nb)"
           " * (run.next_c - run.c)) / 100"
       )} AS w1_r
FROM run, tot
WHERE run.next_c IS NOT NULL
GROUP BY tot.na, tot.nb
"""


@register("drift_wasserstein_1d", sql=_W1_SQL)
def drift_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover) distance between the
    'click' and 'view' value distributions: W₁ = ∫|F_a − F_b| dx over
    the cent-grid support — the drift metric PSI bins approximate,
    with units of the measured value (here: currency) and no binning
    choices. Values quantize to exact integer cents first, so every
    CDF step is a rational of integer counts.

    Scale: one scan → groupBy(cent) collapses the data to the support
    grid (bounded by the value range, NOT the row count); the ordered
    CDF sweep then runs over support points only — the single-partition
    window sees thousands of rows at any data scale. That aggregate-
    below-window shape is the same one interval_peak_concurrency
    pins."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_W1_A, _W1_B) & F.col("value").isNotNull()
    )
    x = ev.select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        F.when(F.col("event_type") == _W1_A, 1).otherwise(0).alias("ia"),
        F.when(F.col("event_type") == _W1_B, 1).otherwise(0).alias("ib"),
    )
    g = x.groupBy("c").agg(F.sum("ia").alias("na_c"), F.sum("ib").alias("nb_c"))
    tot = g.agg(
        F.sum("na_c").alias("na"),
        F.sum("nb_c").alias("nb"),
        F.count(F.lit(1)).alias("n_support"),
    )
    wo = Window.orderBy("c")
    run = g.select(
        "c",
        F.sum("na_c").over(wo).alias("cum_a"),
        F.sum("nb_c").over(wo).alias("cum_b"),
        F.lead("c").over(wo).alias("next_c"),
    ).filter(F.col("next_c").isNotNull())
    return (
        run.join(F.broadcast(tot))
        .groupBy("na", "nb", "n_support")
        .agg(
            round6(
                F.sum(
                    F.abs(
                        F.col("cum_a").cast("double") / F.col("na")
                        - F.col("cum_b").cast("double") / F.col("nb")
                    )
                    * (F.col("next_c") - F.col("c"))
                )
                / 100
            ).alias("w1_r")
        )
        .select("na", "nb", "n_support", "w1_r")
    )


# ---------------------------------------------------------------------------
# CUPED covariate adjustment
# ---------------------------------------------------------------------------

_CUPED_SPLIT = "2024-01-16 00:00:00"

_CUPED_SQL = f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS variant,
         sum(CASE WHEN ts <  TIMESTAMP '{_CUPED_SPLIT}' THEN {_CENTS} ELSE 0 END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}' THEN {_CENTS} ELSE 0 END) AS y
  FROM events GROUP BY 1, 2
),
pool AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM per_user
),
th AS (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS theta,
         CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy)
           / ((n * sxx - sx * sx) * CAST(n * syy - sy * sy AS DOUBLE)) AS rho2,
         CAST(sx AS DOUBLE) / n AS mx_pool
  FROM pool
),
pv AS (
  SELECT variant, count(*) AS n_users,
         CAST(sum(y) AS DOUBLE) / count(*) AS my,
         CAST(sum(x) AS DOUBLE) / count(*) AS mx
  FROM per_user GROUP BY variant
)
SELECT pv.variant, pv.n_users,
       {round6_sql('pv.my / 100')} AS mean_y_r,
       {round6_sql('(pv.my - th.theta * (pv.mx - th.mx_pool)) / 100')} AS mean_y_adj_r,
       {round6_sql('th.theta')} AS theta_r,
       {round6_sql('th.rho2')} AS rho2_r
FROM pv, th
"""


@register("ab_cuped_adjustment", sql=_CUPED_SQL)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED covariate adjustment (Deng et al.): per-user pre-period
    spend X (first half of the month) adjusts the experiment-period
    outcome Y via θ = cov(X,Y)/var(X) pooled across variants —
    Ŷ_adj = Ȳ_v − θ(X̄_v − X̄). ρ² is the variance-reduction fraction
    the covariate buys. The standard trick that lets an A/B test reach
    significance with ~1/(1−ρ²)× less traffic.

    Scale: one groupBy(user) builds (x, y) in exact integer cents; θ,
    ρ², and the variant means all derive from five pooled integer sums
    (single-row aggregates — map-side combine, no second scan of the
    raw data), so every double is an identical expression over exact
    integers in both engines."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id", (F.col("user_id") % 2).alias("variant")).agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0)).alias("y"),
    )
    pool = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    th = pool.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("theta"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            )
        ).alias("rho2"),
        (F.col("sx").cast("double") / F.col("n")).alias("mx_pool"),
    )
    pv = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("my"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mx"),
    )
    return pv.join(F.broadcast(th)).select(
        "variant",
        "n_users",
        round6(F.col("my") / 100).alias("mean_y_r"),
        round6(
            (F.col("my") - F.col("theta") * (F.col("mx") - F.col("mx_pool"))) / 100
        ).alias("mean_y_adj_r"),
        round6(F.col("theta")).alias("theta_r"),
        round6(F.col("rho2")).alias("rho2_r"),
    )


# ---------------------------------------------------------------------------
# IVF recall curve
# ---------------------------------------------------------------------------

_NPROBES = (1, 2, 4)
_TOPK = 5


def _recall_curve_sql() -> str:
    from matt3r_data_ingestion_serverless_spark.plans.northstar import (
        _ann_ivf_sql,
        _ann_topk_sql,
    )

    branches = []
    for p in _NPROBES:
        branches.append(
            f"""
  SELECT {p} AS nprobe,
         count(DISTINCT b.query_id) AS n_queries,
         {round6_sql(
             f"CAST(count(i.match_id) AS DOUBLE)"
             f" / (count(DISTINCT b.query_id) * {_TOPK})"
         )} AS recall_r
  FROM brute b LEFT JOIN (SELECT * FROM ({_ann_ivf_sql(nprobe=p).strip()})) i
    ON i.query_id = b.query_id AND i.match_id = b.match_id
"""
        )
    return f"""
WITH brute AS (SELECT * FROM ({_ann_topk_sql().strip()}))
{" UNION ALL ".join(branches)}
"""


@register("ns_ivf_recall_curve", sql=_recall_curve_sql())
def ns_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF index as a function of nprobe (1, 2, 4)
    against the brute-force top-5 — the quality/cost dial every ANN
    deployment tunes (each +1 nprobe scans one more cell, ~1/k more of
    the corpus). Recall is hits/(queries·k), a ratio of exact integers,
    so the value is bit-stable across engines.

    Scale: the brute side is the existing broadcast-queries plan. The
    corpus-side probe join is paid ONCE for the whole curve: every
    corpus vector lives in exactly one IVF cell, so the nprobe=p
    candidate set is exactly ``probe_rn <= p`` of the nprobe=max(_NPROBES)
    candidate set (see _ivf_scored). The pinned candidate table is
    (queries × probed-cell sizes) rows — top-candidate-sized, never
    corpus-sized — and each curve point is a window + top-k join over
    it."""
    from matt3r_data_ingestion_serverless_spark.plans.northstar import (
        _ivf_scored,
        ns_ann_cosine_topk,
    )

    brute = (
        ns_ann_cosine_topk(spark, sf_dir)
        .select("query_id", "match_id")
        .localCheckpoint(eager=True)
    )
    scored = _ivf_scored(spark, sf_dir, nprobe=max(_NPROBES)).localCheckpoint(
        eager=True
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    out = None
    for p in _NPROBES:
        ivf = (
            scored.filter(F.col("probe_rn") <= p)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _TOPK)
            .select("query_id", F.col("match_id").alias("ivf_match"))
        )
        hits = brute.join(
            ivf,
            (brute.query_id == ivf.query_id)
            & (brute.match_id == ivf.ivf_match),
            "left",
        ).select(brute.query_id, "ivf_match")
        row = hits.agg(
            F.lit(p).alias("nprobe"),
            F.countDistinct("query_id").alias("n_queries"),
            round6(
                F.count("ivf_match").cast("double")
                / (F.countDistinct("query_id") * _TOPK)
            ).alias("recall_r"),
        )
        out = row if out is None else out.union(row)
    return out
