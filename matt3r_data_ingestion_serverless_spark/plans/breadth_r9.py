"""Round-4 batch 5: geofence transition detection, monotonic-counter
rollover correction, and a banded inequality self-join — telemetry
operators the reference's pipeline family (stationary intervals, AP
transitions) naturally grows into, plus the band-join optimization
pattern for inequality predicates at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# geofence enter/exit transitions over the synthetic GPS track
# ---------------------------------------------------------------------------

# rectangle fence in the synthetic coordinate field used by
# geo_haversine_path / geo_grid_density (telemetry.py): lat ∈ 49.x,
# lon ∈ [-123, -121)
_FENCE = (49.2, 49.6, -122.5, -121.5)  # lat_min, lat_max, lon_min, lon_max

_GEOFENCE_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         49.0 + (event_id % 1000) / 1000.0 AS lat,
         -123.0 + (user_id % 1000) / 500.0 + (event_id % 97) / 970.0 AS lon
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lat >= {_FENCE[0]} AND lat < {_FENCE[1]}
               AND lon >= {_FENCE[2]} AND lon < {_FENCE[3]}
              THEN 1 ELSE 0 END AS inside
  FROM pts
),
lagged AS (
  SELECT *, lag(inside) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_inside
  FROM flagged
)
SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us, event_id,
       CASE WHEN inside = 1 THEN 'enter' ELSE 'exit' END AS kind
FROM lagged
WHERE prev_inside IS NOT NULL AND inside != prev_inside
"""


@register("geo_geofence_transitions", _GEOFENCE_SQL)
def geo_geofence_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence enter/exit detection: flag each GPS point as in/out of a
    rectangular fence, then emit the boundary crossings via the same
    lag-transition scan as the reference's autopilot events
    (infer_autopilot_states.py:78-88, W1) — state is a containment bit
    instead of an enum. The standard automotive/fleet geofencing
    primitive (depot arrival, zone billing).

    Determinism: the synthetic lat/lon derive from integer ids with one
    fixed double expression, so the half-open fence comparisons agree
    across engines (same IEEE ops, same result). One window shuffle per
    device; at scale the fence test is codegen scan-stage work and
    polygon fences swap in a winding-number expression without changing
    the plan shape."""
    ev = load_table(spark, sf_dir, "events")
    lat = F.lit(49.0) + (F.col("event_id") % 1000) / 1000.0
    lon = (
        F.lit(-123.0)
        + (F.col("user_id") % 1000) / 500.0
        + (F.col("event_id") % 97) / 970.0
    )
    inside = (
        (lat >= _FENCE[0]) & (lat < _FENCE[1]) & (lon >= _FENCE[2]) & (lon < _FENCE[3])
    ).cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id", inside.alias("inside")
    ).withColumn("prev_inside", F.lag("inside").over(w))
    return flagged.filter(
        F.col("prev_inside").isNotNull() & (F.col("inside") != F.col("prev_inside"))
    ).select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        F.when(F.col("inside") == 1, "enter").otherwise("exit").alias("kind"),
    )


# ---------------------------------------------------------------------------
# monotonic-counter rollover correction (odometer/energy meters)
# ---------------------------------------------------------------------------

_ROLLOVER_SQL = """
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100, 0) AS BIGINT) % 100000 AS ctr
  FROM events WHERE event_type = 'view'
),
d AS (
  SELECT user_id, ctr,
         ctr - lag(ctr) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS delta
  FROM c
)
SELECT user_id,
       count(*) AS n_samples,
       CAST(sum(CASE WHEN delta IS NULL THEN 0
                     WHEN delta >= 0 THEN delta
                     ELSE delta + 100000 END) AS BIGINT) AS total_delta,
       CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rollovers
FROM d GROUP BY user_id
"""


@register("counter_rollover_totals", _ROLLOVER_SQL)
def counter_rollover_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter recovery: a bounded counter channel (odometer,
    CAN energy meter — synthesized here as cents mod 100 000) rolls
    over to 0 at its modulus; the true consumed total is Σ of
    per-sample deltas with negative deltas corrected by +modulus. The
    standard meter-reading reconstruction every vehicle/IoT pipeline
    runs — one lag window per device and one hash agg, both on the
    same device hash (one shuffle).

    The reference's decoders emit exactly such bounded raw channels
    (12-bit speed, 16-bit time offsets — parse_canserver_filtered_log
    .py:250-252 handles the offset counter's wrap implicitly by
    re-sync); this operator is the analytic-side generalization."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    ctr = (F.round(F.col("value") * 100, 0).cast("long") % 100000).alias("ctr")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select("user_id", "ts", "event_id", ctr).withColumn(
        "delta", F.col("ctr") - F.lag("ctr").over(w)
    )
    corrected = (
        F.when(F.col("delta").isNull(), 0)
        .when(F.col("delta") >= 0, F.col("delta"))
        .otherwise(F.col("delta") + 100000)
    )
    return d.groupBy("user_id").agg(
        F.count("*").alias("n_samples"),
        F.sum(corrected).cast("long").alias("total_delta"),
        # NULL-safe: a user with exactly ONE sample has only a NULL
        # delta, and sum((delta<0).cast) over an all-NULL group is NULL
        # while the oracle's CASE sums 0 — such singleton users first
        # appear at sf10's user count (found by the round-9 sf10 sweep)
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rollovers"),
    )


# ---------------------------------------------------------------------------
# banded inequality self-join (|price_a − price_b| ≤ band)
# ---------------------------------------------------------------------------

_BAND_CENTS = 100  # $1

# The oracle uses the same 3-bucket equi-join decomposition as the
# Spark plan (hash-joinable, O(n·density)) rather than the plain
# BETWEEN θ-join: DuckDB's IEJoin picks TWO of the three inequality
# conditions as its sort pair and happened to pick (cents <=, k >) —
# materializing ~n²/4 candidate pairs before the band filter, which
# turned the sf1 oracle (1.5M orders) into an hours-long grind. The
# decomposition is trivially equivalent: every |Δcents| <= 100 pair
# shares a bucket within ±1 of cents div 100, and the exact band +
# key-order predicates are re-applied after the equi-join.
_BAND_SQL = f"""
WITH o AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
a AS (
  SELECT k, st, cents,
         unnest([cents // {_BAND_CENTS} - 1,
                 cents // {_BAND_CENTS},
                 cents // {_BAND_CENTS} + 1]) AS bucket
  FROM o
),
b AS (SELECT k AS kb, st AS stb, cents AS cents_b,
             cents // {_BAND_CENTS} AS bucket FROM o)
SELECT a.st AS status_a, b.stb AS status_b,
       count(*) AS n_pairs,
       CAST(min(abs(a.cents - b.cents_b)) AS BIGINT) AS min_diff,
       CAST(max(abs(a.cents - b.cents_b)) AS BIGINT) AS max_diff
FROM a JOIN b USING (bucket)
WHERE b.kb > a.k AND abs(a.cents - b.cents_b) <= {_BAND_CENTS}
GROUP BY 1, 2
"""


@register("price_band_pairs", _BAND_SQL)
def price_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded inequality join: all order pairs priced within $1 of each
    other (near-identical-amount detection — the duplicate-payment /
    split-transaction audit), summarized per status pair.

    Spark-first BAND JOIN optimization: a raw inequality join is a
    cartesian product (Spark has no IEJoin). Quantize the band width
    into buckets (cents div 100), replicate each left row into its
    bucket ± 1 via a 3-element explode, EQUI-join on the bucket hash,
    then apply the exact band predicate — O(n·density) work on a hash
    join the engine can shuffle-partition, the relational twin of the
    LSH band trick. The oracle states the plain BETWEEN join (DuckDB
    plans an IEJoin for it).

    At 100 TB the bucket key shards uniformly (prices are spread), and
    the ×3 replication is the entire overhead — versus an unplannable
    θ-join."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    a = o.select(
        "k",
        "st",
        "cents",
        F.explode(
            F.array(
                F.expr(f"cents div {_BAND_CENTS} - 1"),
                F.expr(f"cents div {_BAND_CENTS}"),
                F.expr(f"cents div {_BAND_CENTS} + 1"),
            )
        ).alias("bucket"),
    )
    b = o.select(
        F.col("k").alias("kb"),
        F.col("st").alias("stb"),
        F.col("cents").alias("cents_b"),
        F.expr(f"cents div {_BAND_CENTS}").alias("bucket"),
    )
    pairs = a.join(b, "bucket").filter(
        (F.col("kb") > F.col("k"))
        & (F.abs(F.col("cents") - F.col("cents_b")) <= _BAND_CENTS)
    )
    diff = F.abs(F.col("cents") - F.col("cents_b"))
    return pairs.groupBy(
        F.col("st").alias("status_a"), F.col("stb").alias("status_b")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.min(diff).cast("long").alias("min_diff"),
        F.max(diff).cast("long").alias("max_diff"),
    )
