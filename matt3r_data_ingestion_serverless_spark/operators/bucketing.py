"""Bucketed-table co-location (SURVEY §7.2 M6; SCALE.md §2).

Writing both sides of a recurring fact-fact join bucketed on the join
key pre-pays the shuffle ONCE at write time: Spark's bucket scan
reports the hash partitioning to the planner, so the join runs with
zero Exchange on either side (verified by test_bucketing's plan
assertion). At 100 TB this converts every lineitem⋈orders-shaped query
from two full-table shuffles into a local zipper join.

Bucketed writes require the table catalog (saveAsTable) — bucket
metadata lives in the metastore, not in the parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.
    Sorting within buckets additionally removes the join's Sort nodes
    (sort-merge join reads pre-sorted runs)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def n_exchanges(spark: SparkSession, df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (test/diagnostic
    helper: 0 on a co-located bucket join)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
