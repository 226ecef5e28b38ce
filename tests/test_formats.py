"""Source/sink format breadth: the engine's tables round-trip through
CSV, JSON-lines, and ORC with schema preserved and values intact.

The reference's only interchange format is ad-hoc JSON documents
(parse_canserver_filtered_log.py:350); a Spark-native engine gets the
full format matrix from the DataSource API — these tests pin that the
schema contract survives each round trip (header/schema inference for
CSV, line-delimited JSON, ORC's native types)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _agg(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum("user_id").alias("s"),
        F.round(F.sum("value"), 4).alias("v"),
    ).collect()[0]


@pytest.fixture()
def events(spark):
    # project to sink-friendly types; ts as epoch micros keeps every
    # format lossless (CSV has no native timestamp precision contract)
    return load_table(spark, SF_SMOKE, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_roundtrip_preserves_rows(spark, events, fmt, tmp_path):
    path = str(tmp_path / f"events_{fmt}")
    writer = events.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.format(fmt).save(path)

    reader = spark.read
    if fmt == "csv":
        # production path: explicit schema, no inference scan
        reader = reader.option("header", True).schema(events.schema)
    back = reader.format(fmt).load(path)

    assert set(back.columns) == set(events.columns)
    assert _agg(back) == _agg(events)


def test_csv_schema_applied_not_inferred(spark, events, tmp_path):
    """Explicit-schema CSV read must keep integer types (inference would
    widen or misread) — the at-scale contract: never pay the inference
    scan, never accept a drifted schema."""
    path = str(tmp_path / "events_csv_schema")
    events.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).schema(events.schema).csv(path)
    assert dict(back.dtypes) == dict(events.dtypes)


def test_dynamic_partition_overwrite(spark, events, tmp_path):
    """Dynamic partitionOverwriteMode: rewriting one date's data must
    leave sibling partitions untouched (static mode would truncate the
    whole table) — the partition-scoped rewrite contract the upsert
    sink (operators/merge.py) relies on."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "dyn_overwrite")
    part = events.withColumn(
        "day", F.to_date(F.timestamp_micros(F.col("ts_us")))
    )
    part.write.partitionBy("day").mode("overwrite").parquet(path)
    total = spark.read.parquet(path).count()
    days = [r.day for r in spark.read.parquet(path).select("day").distinct().collect()]
    assert len(days) >= 2

    target_day = sorted(days)[0]
    one_day = part.filter(F.col("day") == F.lit(target_day))
    n_day = one_day.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # rewrite JUST that partition (e.g. a corrected re-ingest)
        one_day.write.partitionBy("day").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = spark.read.parquet(path)
    assert after.count() == total  # siblings intact, target replaced 1:1
    assert after.filter(F.col("day") == F.lit(target_day)).count() == n_day
