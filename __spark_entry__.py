"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in
``matt3r_data_ingestion_serverless_spark.plans`` — one entry per
operator from SURVEY.md §2 plus the north-star extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: W2 zero-run sessionization (the reference's
    stationary-state inference, infer_stationary_states.py:81-106) over
    the sf0.001 events table."""
    from matt3r_data_ingestion_serverless_spark.plans import all_queries

    fn, _ = all_queries()["w2_stationary_intervals"]
    return fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from matt3r_data_ingestion_serverless_spark.plans import all_queries

    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from matt3r_data_ingestion_serverless_spark.plans import all_queries

    return {name: sql for name, (_fn, sql) in all_queries().items() if sql is not None}
