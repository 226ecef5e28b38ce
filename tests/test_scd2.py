"""SCD Type-2 apply (operators/scd2.py) — history-preserving dimension
versioning, the lakehouse generalization of the reference's
overwrite-in-place gold merge (infer_stationary_states.py:108-124)."""

from __future__ import annotations

from matt3r_data_ingestion_serverless_spark.operators.scd2 import OPEN_END, scd2_apply


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _dim(spark):
    return spark.createDataFrame(
        [(1, "GOLD", "2020-01-01"), (2, "SILVER", "2020-01-01"), (3, "GOLD", "2021-06-01")],
        "k int, tier string, valid_from string",
    )


def test_scd2_unchanged_rows_stay_open(spark):
    upd = spark.createDataFrame([(1, "GOLD")], "k int, tier string")  # no-op value
    out = scd2_apply(_dim(spark), upd, "k", ["tier"], "2022-01-01")
    assert _rows(out) == {
        (1, "GOLD", "2020-01-01", OPEN_END, True),
        (2, "SILVER", "2020-01-01", OPEN_END, True),
        (3, "GOLD", "2021-06-01", OPEN_END, True),
    }


def test_scd2_change_closes_old_and_opens_new(spark):
    upd = spark.createDataFrame([(2, "GOLD")], "k int, tier string")
    out = scd2_apply(_dim(spark), upd, "k", ["tier"], "2022-01-01")
    assert _rows(out.filter("k = 2")) == {
        (2, "SILVER", "2020-01-01", "2022-01-01", False),
        (2, "GOLD", "2022-01-01", OPEN_END, True),
    }
    # untouched keys unaffected
    assert _rows(out.filter("k = 1")) == {(1, "GOLD", "2020-01-01", OPEN_END, True)}


def test_scd2_new_key_inserts_open_version(spark):
    upd = spark.createDataFrame([(9, "BRONZE")], "k int, tier string")
    out = scd2_apply(_dim(spark), upd, "k", ["tier"], "2022-01-01")
    assert _rows(out.filter("k = 9")) == {(9, "BRONZE", "2022-01-01", OPEN_END, True)}
    assert out.count() == 4


def test_scd2_is_idempotent_on_reapply(spark):
    """Re-applying the same batch to the CURRENT slice changes nothing —
    the at-least-once delivery property every sink in this repo keeps."""
    upd = spark.createDataFrame([(2, "GOLD")], "k int, tier string")
    once = scd2_apply(_dim(spark), upd, "k", ["tier"], "2022-01-01")
    current = once.filter("is_current").drop("is_current", "valid_to")
    again = scd2_apply(current, upd, "k", ["tier"], "2022-01-01")
    assert _rows(again) == _rows(
        once.filter("is_current")
    ), "reapply must be a no-op on the open slice"
