"""Round-4 batch 10: FIFO lot matching via cumulative-range alignment
and PSI population-drift monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# FIFO lot matching (inventory/cost-basis allocation)
# ---------------------------------------------------------------------------

_FIFO_MAX_PART = 200

_FIFO_SQL = f"""
WITH li AS (
  SELECT l_partkey AS part, l_orderkey AS k, l_linenumber AS ln,
         l_shipdate AS t,
         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS fl
  FROM lineitem WHERE l_partkey <= {_FIFO_MAX_PART}
),
buys AS (
  SELECT part, k, ln, qty,
         coalesce(sum(qty) OVER (PARTITION BY part ORDER BY t, k, ln
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
         sum(qty) OVER (PARTITION BY part ORDER BY t, k, ln
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM li WHERE fl = 'N'
),
sells AS (
  SELECT part, k, ln, qty,
         coalesce(sum(qty) OVER (PARTITION BY part ORDER BY t, k, ln
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
         sum(qty) OVER (PARTITION BY part ORDER BY t, k, ln
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM li WHERE fl = 'R'
)
SELECT b.part,
       b.k AS buy_order, b.ln AS buy_line,
       s.k AS sell_order, s.ln AS sell_line,
       CAST(least(b.hi, s.hi) - greatest(b.lo, s.lo) AS BIGINT) AS qty_matched
FROM buys b JOIN sells s
  ON b.part = s.part AND b.lo < s.hi AND s.lo < b.hi
"""


@register("fifo_lot_matching", _FIFO_SQL)
def fifo_lot_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — the inventory/cost-basis allocation problem
    (match each consumption against supply lots in arrival order):
    treated RELATIONALLY by putting buys ('N' lines) and sells ('R'
    lines) on the same per-part CUMULATIVE-UNITS axis — lot i occupies
    units [lo, hi) of supply, sale j occupies [lo, hi) of demand, and a
    (lot, sale) pair matches exactly where the intervals overlap:
    qty = min(hi_b, hi_s) − max(lo_b, lo_s). No loops, no recursion —
    the classic row-by-row ledger walk becomes two prefix-sum windows
    and one range join (bucket-banded at scale, as price_band_pairs).

    Everything is exact int64 units; ordering (shipdate, order, line)
    is total, so lot boundaries are engine-identical. Per-part demand
    can exceed supply (or vice versa) — the unmatched tail simply has
    no overlapping counterpart, faithful to a real allocation ledger.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") <= _FIFO_MAX_PART)
        .select(
            F.col("l_partkey").alias("part"),
            F.col("l_orderkey").alias("k"),
            F.col("l_linenumber").alias("ln"),
            F.col("l_shipdate").alias("t"),
            F.col("l_quantity").cast("long").alias("qty"),
            F.col("l_returnflag").alias("fl"),
        )
    )
    w_hi = (
        Window.partitionBy("part")
        .orderBy("t", "k", "ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lo = (
        Window.partitionBy("part")
        .orderBy("t", "k", "ln")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def ranges(fl: str) -> DataFrame:
        return li.filter(F.col("fl") == fl).select(
            "part",
            "k",
            "ln",
            "qty",
            F.coalesce(F.sum("qty").over(w_lo), F.lit(0)).alias("lo"),
            F.sum("qty").over(w_hi).alias("hi"),
        )

    b = ranges("N").select(
        "part",
        F.col("k").alias("buy_order"),
        F.col("ln").alias("buy_line"),
        F.col("lo").alias("blo"),
        F.col("hi").alias("bhi"),
    )
    s = ranges("R").select(
        "part",
        F.col("k").alias("sell_order"),
        F.col("ln").alias("sell_line"),
        F.col("lo").alias("slo"),
        F.col("hi").alias("shi"),
    )
    j = b.join(s, "part").filter(
        (F.col("blo") < F.col("shi")) & (F.col("slo") < F.col("bhi"))
    )
    qty = F.least("bhi", "shi") - F.greatest("blo", "slo")
    return j.select(
        "part",
        "buy_order",
        "buy_line",
        "sell_order",
        "sell_line",
        qty.cast("long").alias("qty_matched"),
    )


# ---------------------------------------------------------------------------
# PSI population-drift monitor
# ---------------------------------------------------------------------------

_PSI_BINS = 10

_PSI_SQL = f"""
WITH t AS (
  SELECT CASE WHEN month(o_orderdate) <= 6 THEN 'base' ELSE 'current' END AS period,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
-- fixed equal-width bins over the BASE period's [min, max]
edges AS (
  SELECT min(cents) AS lo, max(cents) AS hi FROM t WHERE period = 'base'
),
binned AS (
  SELECT period,
         least(greatest(CAST(floor((cents - lo) * {_PSI_BINS}.0
                                   / (hi - lo + 1)) AS INT), 0),
               {_PSI_BINS - 1}) AS bin
  FROM t, edges
),
counts AS (
  SELECT bin,
         sum(CASE WHEN period = 'base' THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN period = 'current' THEN 1 ELSE 0 END) AS nc
  FROM binned GROUP BY bin
),
tot AS (
  SELECT sum(nb) AS tb, sum(nc) AS tc FROM counts
)
SELECT CAST(bin AS INT) AS bin,
       CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_current,
       {round6_sql("CAST(nb AS DOUBLE) / tb")} AS p_base,
       {round6_sql("CAST(nc AS DOUBLE) / tc")} AS p_current,
       CASE WHEN nb > 0 AND nc > 0 THEN {round6_sql(
           "(CAST(nc AS DOUBLE) / tc - CAST(nb AS DOUBLE) / tb)"
           " * ln((CAST(nc AS DOUBLE) / tc) / (CAST(nb AS DOUBLE) / tb))"
       )} END AS psi_contrib
FROM counts, tot
"""


@register("drift_psi_bins", _PSI_SQL)
def drift_psi_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index monitor: bin the base period's order
    values into 10 equal-width bins (edges FROZEN on the base period —
    the defining PSI discipline), then per bin the base/current shares
    and the PSI contribution (p_c − p_b)·ln(p_c/p_b) — the model-ops
    drift alarm (rule of thumb: Σ > 0.25 = retrain).

    Emitted per-bin (the Σ is one trivial client-side sum) so every
    double derives from exact int counts with a fixed formula — a
    scalar Σ of 10 logs would fold in engine order. Bins degenerate
    (nb or nc = 0) yield NULL contribution, surfaced rather than
    epsilon-fudged. One scan, one 10-row agg, broadcast edge row."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        F.when(F.month("o_orderdate") <= 6, "base").otherwise("current").alias(
            "period"
        ),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    edges = t.filter(F.col("period") == "base").agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    binned = t.crossJoin(F.broadcast(edges)).select(
        "period",
        F.least(
            F.greatest(
                F.floor(
                    (F.col("cents") - F.col("lo"))
                    * float(_PSI_BINS)
                    / (F.col("hi") - F.col("lo") + 1)
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum((F.col("period") == "base").cast("int")).alias("nb"),
        F.sum((F.col("period") == "current").cast("int")).alias("nc"),
    )
    tot = counts.agg(F.sum("nb").alias("tb"), F.sum("nc").alias("tc"))
    j = counts.crossJoin(F.broadcast(tot))
    pb = F.col("nb").cast("double") / F.col("tb")
    pc = F.col("nc").cast("double") / F.col("tc")
    return j.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("nb").cast("long").alias("n_base"),
        F.col("nc").cast("long").alias("n_current"),
        round6(pb).alias("p_base"),
        round6(pc).alias("p_current"),
        F.when(
            (F.col("nb") > 0) & (F.col("nc") > 0),
            round6((pc - pb) * F.log(pc / pb)),
        ).alias("psi_contrib"),
    )
