"""Round-2 batch 27 (this run): Markov-chain stationary distribution
with entropy rate, in pure integer micro-arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

_MK_ITERS = 3


def _mk_step_sql(k: int) -> str:
    p = k - 1
    return f"""
pi{k} AS (
  SELECT t.to_t AS state, sum((pi{p}.v * t.c) // t.r) AS v
  FROM t JOIN pi{p} ON pi{p}.state = t.from_t
  GROUP BY t.to_t
)"""


_MARKOV_SQL_HEAD = """
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
  FROM events GROUP BY user_id
),
bi AS (
  SELECT unnest(list_transform(range(1, len(types)),
                               i -> {'f': types[i], 't': types[i + 1]})) AS pair
  FROM seq WHERE len(types) >= 2
),
cnt AS (
  SELECT pair.f AS from_t, pair.t AS to_t, count(*) AS c
  FROM bi GROUP BY pair.f, pair.t
),
rs AS (SELECT from_t, sum(c) AS r FROM cnt GROUP BY from_t),
t AS (SELECT c.from_t, c.to_t, c.c, rs.r FROM cnt c JOIN rs USING (from_t)),
states AS (SELECT DISTINCT from_t AS state FROM cnt),
ns AS (SELECT count(*) AS k FROM states),
pi0 AS (SELECT state, 1000000 // (SELECT k FROM ns) AS v FROM states),
"""


def _markov_sql() -> str:
    steps = ",".join(_mk_step_sql(k) for k in range(1, _MK_ITERS + 1))
    return (
        _MARKOV_SQL_HEAD
        + steps
        + f""",
h AS (
  SELECT t.from_t AS state,
         sum(t.c * CAST(floor(abs(ln(CAST(t.c AS DOUBLE) / t.r)) * 1e6 + 0.5) AS BIGINT))
           // max(t.r) AS h_micro
  FROM t GROUP BY t.from_t
)
SELECT s.state,
       CAST(rs.r AS BIGINT) AS n_transitions_out,
       CAST(p.v AS BIGINT) AS stationary_micro,
       CAST(h.h_micro AS BIGINT) AS row_entropy_micro,
       CAST((p.v * h.h_micro) // 1000000 AS BIGINT) AS entropy_contrib_micro
FROM states s
JOIN pi{_MK_ITERS} p ON p.state = s.state
JOIN rs ON rs.from_t = s.state
JOIN h ON h.state = s.state
"""
    )


@register("markov_stationary_dist", _markov_sql())
def markov_stationary_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the global event-type Markov chain
    (3 power iterations of π ← πP from uniform) with each state's
    transition entropy and its π-weighted contribution — Σ of the last
    column is the chain's entropy rate, the process-level complement
    to event_transition_matrix (the P estimate) and
    user_transition_entropy (per-user mixing). Every iteration step is
    (π_i·c_ij) // r_i — TRUE integer division per term, summed as
    int64 — so the distribution is engine-exact without any float
    linear algebra (same discipline as HITS); row entropies quantize
    ln per cell before one integer division. The chain is 5×5 — the
    iterations are broadcast-trivial; the only data-scale pass is the
    bigram count."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ).alias("types")
    )
    bi = seq.filter(F.size("types") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("types") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("types"), i).alias("f"),
                    F.element_at(F.col("types"), i + 1).alias("t"),
                ),
            )
        ).alias("pair")
    )
    cnt = bi.groupBy(
        F.col("pair.f").alias("from_t"), F.col("pair.t").alias("to_t")
    ).agg(F.count("*").alias("c"))
    rs = cnt.groupBy("from_t").agg(F.sum("c").alias("r"))
    t = cnt.join(rs, "from_t").localCheckpoint(eager=True)
    states = t.select(F.col("from_t").alias("state")).distinct()
    k = states.count()
    pi = states.select("state", F.lit(1000000 // k).cast("long").alias("v"))
    for _ in range(_MK_ITERS):
        pi = (
            t.join(pi, t.from_t == pi.state)
            .select(F.col("to_t").alias("state"), F.expr("(v * c) div r").alias("term"))
            .groupBy("state")
            .agg(F.sum("term").alias("v"))
        )
    h = t.groupBy(F.col("from_t").alias("state")).agg(
        F.expr(
            "sum(c * cast(floor(abs(ln(cast(c as double) / r)) * 1e6 + 0.5) as bigint))"
            " div max(r)"
        ).alias("h_micro")
    )
    return (
        states.join(pi, "state")
        .join(rs.withColumnRenamed("from_t", "state"), "state")
        .join(h, "state")
        .select(
            "state",
            F.col("r").cast("long").alias("n_transitions_out"),
            F.col("v").cast("long").alias("stationary_micro"),
            F.col("h_micro").cast("long").alias("row_entropy_micro"),
            F.expr("(v * h_micro) div 1000000").cast("long").alias("entropy_contrib_micro"),
        )
    )
