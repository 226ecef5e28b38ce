"""Parquet table loaders for the driver-generated test tables.

Columnar parquet scans give Catalyst predicate pushdown + column
pruning for free (vs. the reference's whole-object S3 GET + json.loads,
infer_stationary_states.py:55-57).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) read as epoch-nanos long (see session.py conf);
        # truncate to µs with integer division — matches DuckDB's ns→µs cast.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to full parallelism before a CPU-bound
    stage (text hashing, vector folds). Small local files arrive as ONE
    scan partition (file size < maxPartitionBytes), serializing the
    whole pipeline; one tiny round-robin shuffle unlocks every core. At
    production scale scans already have ≥ cores partitions and this is
    a no-op — the gate makes the trade explicit, not ambient."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
