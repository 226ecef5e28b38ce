"""Time-series join operators Spark lacks natively (SURVEY §7.2 custom
operators): as-of join and interval coalescing, built as compositions
of existing DataFrame ops — no UDF, no cross join.

As-of join (union + last-observation window) is THE scalable pattern:
tag both sides, union, and carry the right side's latest values forward
with ``last(ignorenulls)`` over (key, ts). One shuffle on the key, one
sort within partitions — versus the naive per-left-row subquery
(O(n·m)) or an inequality join (planned as broadcast-nested-loop).
At 100 TB both inputs shuffle once on the join key and stream through
a single window; skewed keys split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` on the same key (left-join semantics: no
    prior right row → NULLs). ``tolerance_s`` optionally voids matches
    older than the tolerance (pandas.merge_asof semantics).

    Implementation: union the tagged sides ordered by (ts, side) —
    right rows sort before left rows at equal timestamps so an exact-ts
    match counts as "at or before" — then carry right values forward
    with last(ignorenulls) and keep only left rows."""
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(key), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"), *right_cols
    )
    # the key stays real on BOTH sides (it drives the window partition);
    # only the non-key payload columns are null-padded
    left_payload = [c for c in left.columns if c != key]
    unified = lt.select(
        F.col(key),
        *left_payload,
        "_ts",
        "_side",
        *[F.lit(None).cast(rt.schema[c].dataType).alias(c) for c in right_cols],
    ).unionByName(
        rt.select(
            F.col(key),
            *[
                F.lit(None).cast(lt.schema[c].dataType).alias(c)
                for c in left_payload
            ],
            "_ts",
            "_side",
            *right_cols,
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL-tag the carry struct by side: only right rows contribute;
    # left rows carry the previous value. Left rows with no preceding
    # right row see a NULL struct (left-join semantics).
    right_struct = F.when(
        F.col("_side") == 0, F.struct(F.col("_ts").alias("_rts"), *right_cols)
    )
    carried = unified.select(
        F.col(key),
        *left_payload,
        "_ts",
        "_side",
        F.last(right_struct, ignorenulls=True).over(w).alias("_m"),
    )
    out = carried.filter(F.col("_side") == 1)
    matched = F.col("_m")
    if tolerance_s is not None:
        in_tol = (
            F.col("_ts").cast("double") - matched["_rts"].cast("double")
        ) <= tolerance_s
        matched = F.when(matched.isNotNull() & in_tol, F.col("_m"))
    return out.select(
        F.col(key),
        *left_payload,
        matched["_rts"].alias("asof_ts"),
        *[matched[c].alias(c) for c in right_cols],
    )


def coalesce_intervals(
    intervals: DataFrame, *, key: str, start: str, end: str
) -> DataFrame:
    """Merge overlapping/touching [start, end] intervals per key
    (SURVEY §2.6 J2's daily interval-list merge, generalized): an
    interval starts a new group iff its start exceeds the running max
    end of all earlier intervals. One shuffle on the key; the running
    max and the group aggregation reuse the same partitioning."""
    w = (
        Window.partitionBy(key)
        .orderBy(start, end)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = intervals.withColumn(
        "_new",
        F.when(F.col(start) > F.max(end).over(w), 1).otherwise(
            F.when(F.max(end).over(w).isNull(), 1).otherwise(0)
        ),
    )
    wg = (
        Window.partitionBy(key)
        .orderBy(start, end)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = flagged.withColumn("_grp", F.sum("_new").over(wg))
    return grouped.groupBy(key, "_grp").agg(
        F.min(start).alias(start),
        F.max(end).alias(end),
        F.count("*").alias("n_merged"),
    ).drop("_grp")
