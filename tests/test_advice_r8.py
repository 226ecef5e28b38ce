"""Pins for the four r07 ADVICE items.

1. zorder2_scaled uses exact integer (decimal) division — no double
   rounding misplacing rows near bucket edges at key spans > ~2^37.
2. _footer_key_intervals (the source_intervals fast path feeder) falls
   back to the scan path when a footer reports null keys.
3. (docstring-only: spearman_rank_corr wording — no behavior pin)
4. files_scanned accepts a version parameter and agrees with the
   version-pinned scan.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.zorder import (
    zorder2_py,
    zorder2_scaled,
)
from matt3r_data_ingestion_serverless_spark.plans.breadth_r6 import (
    _footer_key_intervals,
)


def _py_scaled(x: int, lo: int, hi: int, bits: int = 16) -> int:
    """Exact-integer reference for the affine bucket scale."""
    return (x - lo) * ((1 << bits) - 1) // max(hi - lo, 1)


def test_zorder2_scaled_exact_at_huge_spans(spark):
    """Double division misplaces edge keys once (x-lo)*(2^16-1) needs
    more than a double's 53-bit mantissa (spans above ~2^37). The
    decimal path must match the exact Python integer result at a 2^55
    span, including values adjacent to bucket boundaries."""
    lo, hi = 0, 1 << 55
    bucket = (hi - lo) // ((1 << 16) - 1)
    probes = []
    for edge in (1, 7, 1000, 32767, 65534):
        base = edge * bucket
        probes += [base - 1, base, base + 1]
    probes += [lo, hi, hi - 1]
    df = spark.createDataFrame([(v, v) for v in probes], "a long, b long")
    rows = df.withColumn(
        "z", zorder2_scaled(F.col("a"), lo, hi, F.col("b"), lo, hi)
    ).collect()
    for r in rows:
        sa = _py_scaled(r.a, lo, hi)
        assert r.z == zorder2_py(sa, sa), (r.a, sa, r.z)


def test_zorder2_scaled_matches_python_small_span(spark):
    """Regression guard: the decimal rewrite keeps the small-span
    results identical to the exact integer formula."""
    lo, hi = 3, 1003
    vals = [3, 4, 250, 500, 999, 1002, 1003]
    df = spark.createDataFrame([(v, 1003 + 3 - v) for v in vals], "a long, b long")
    rows = df.withColumn(
        "z", zorder2_scaled(F.col("a"), lo, hi, F.col("b"), lo, hi)
    ).collect()
    for r in rows:
        assert r.z == zorder2_py(_py_scaled(r.a, lo, hi), _py_scaled(r.b, lo, hi))


def test_footer_intervals_refuse_null_keys(spark, tmp_path):
    """A null key is invisible to parquet footer min/max, so an
    interval cover built from footers is INCOMPLETE for null-key rows —
    the fast path must return None (scan fallback) instead of a cover
    that would let a stale null-key row survive a merge untouched."""
    p = str(tmp_path / "null_keys")
    os.makedirs(p)
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, None, 5], type=pa.int64())}),
        os.path.join(p, "part-0.parquet"),
    )
    bdf = spark.read.parquet(p)
    assert _footer_key_intervals(bdf, "o_orderkey") is None


def test_footer_intervals_cover_non_null_batch(spark, tmp_path):
    p = str(tmp_path / "clean_keys")
    os.makedirs(p)
    pq.write_table(
        pa.table({"o_orderkey": pa.array([4, 9, 2], type=pa.int64())}),
        os.path.join(p, "part-0.parquet"),
    )
    bdf = spark.read.parquet(p)
    assert _footer_key_intervals(bdf, "o_orderkey") == [(2, 9)]


def test_files_scanned_respects_version(spark, tmp_path):
    """files_scanned(bounds, version) must count against the pinned
    snapshot's manifest, matching what scan(bounds, version) opens."""
    from matt3r_data_ingestion_serverless_spark.operators.lakehouse import (
        LakehouseTable,
    )

    root = str(tmp_path / "tbl")
    v0 = spark.range(0, 100).withColumnRenamed("id", "k")
    tbl = LakehouseTable.create(v0, root, stats_cols=["k"])
    tbl.merge(spark.range(1000, 1100).withColumnRenamed("id", "k"), ["k"])
    bounds = {"k": (1000, 1099)}
    hit_now, total_now = tbl.files_scanned(bounds)
    hit_v1, total_v1 = tbl.files_scanned(bounds, version=1)
    assert hit_now >= 1
    assert hit_v1 == 0  # version 1 predates the appended key range
    assert total_v1 < total_now
    assert tbl.scan(bounds, version=1).count() == 0
    assert tbl.scan(bounds).count() == 100
