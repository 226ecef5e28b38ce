"""Engine observability: df.observe() named metrics — the runtime
row-count/sum audit hooks a production pipeline attaches to every
stage boundary (and the mechanism behind Delta-style expectation
checks). Verifies metrics are collected for batch plans without a
second pass over the data."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_observe_collects_audit_metrics_in_one_pass(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    obs = Observation("ingest_audit")
    audited = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_cents"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
    )
    out = audited.filter(F.col("event_type") == "view").count()
    m = obs.get
    rows = ev.count()
    assert m["n_rows"] == rows  # observed BEFORE the filter
    assert out < rows
    exact = ev.select(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("s"),
        F.count(F.when(F.col("value") < 0, 1)).alias("neg"),
    ).collect()[0]
    assert m["sum_cents"] == exact.s
    assert m["n_negative"] == exact.neg


def test_observe_on_flagship_query(spark):
    """The flagship W2 plan carries an observation on its scan — the
    shape every silver-layer job uses to publish per-run counts to a
    metrics sink without a second scan."""
    from matt3r_data_ingestion_serverless_spark.operators.stationary import (
        stationary_intervals,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    obs = Observation("w2_audit")
    speed = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("device_id"),
        "ts",
        F.when(F.col("value") < 200, 0.0).otherwise(F.col("value")).alias("speed"),
    )
    audited = speed.observe(obs, F.count(F.lit(1)).alias("n_samples"))
    n_intervals = stationary_intervals(audited).count()
    assert obs.get["n_samples"] == speed.count()
    assert n_intervals >= 0
