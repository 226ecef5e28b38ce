"""Round-7 lakehouse hardening (ADVICE r06): the bucketed plain write
must never record a manifest that disagrees with the bytes on disk.

The exact-slot fast path assumes one file per non-empty bucket with
file part-index == bucket id. ADVICE r06 found the guard only covered
the MISSING-index half of a routing divergence; a COLLISION — a task
emitting more than one file, e.g. because the (user-supplied) session
sets spark.sql.files.maxRecordsPerFile — silently orphaned the extra
files: the manifest listed one file with the full bucket row count and
read() returned a fraction of the rows.
"""

from __future__ import annotations

import pytest

from matt3r_data_ingestion_serverless_spark.operators import lakehouse as lh
from matt3r_data_ingestion_serverless_spark.operators.lakehouse import LakehouseTable


@pytest.fixture
def max_records_10(spark):
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "10")
    yield
    spark.conf.set("spark.sql.files.maxRecordsPerFile", old)


def _hundred(spark):
    return spark.createDataFrame(
        [(i, 0, float(i)) for i in range(1, 101)], "id int, seq int, v double"
    )


def test_bucketed_create_survives_max_records_per_file(
    spark, tmp_path, max_records_10
):
    """ADVICE r06 high repro: maxRecordsPerFile=10 makes every bucket
    task emit multiple part files sharing one part index. Pre-fix the
    manifest said rows=100 while read() returned ~30; now the collision
    guard routes the commit through the per-file harvest and every row
    survives."""
    t = LakehouseTable.create_bucketed(
        _hundred(spark),
        str(tmp_path / "b"),
        key="id",
        boundaries=[26, 51, 76],
        stats_cols=["id"],
        keys=["id"],
        version_col="seq",
    )
    man = t.manifest()
    assert man["rows"] == 100
    assert t.read().count() == 100
    # the manifest must list every file on disk (harvest path), and the
    # per-file row counts must sum to the total — no orphans
    assert sum(e["rows"] for e in man["file_list"]) == 100
    assert len(man["file_list"]) > 4  # >1 file per bucket proves the split
    # stats still usable for pruning: key 30 found via its span
    t.merge(
        spark.createDataFrame([(30, 1, 999.0)], "id int, seq int, v double"),
        ["id"],
        version_col="seq",
    )
    assert t.read().filter("id = 30").first().v == 999.0
    assert t.read().count() == 100


def test_bucketed_merge_rewrite_survives_max_records_per_file(
    spark, tmp_path, max_records_10
):
    """Same collision inside merge()'s bucketed rewrite path."""
    t = LakehouseTable.create(_hundred(spark), str(tmp_path / "t"), stats_cols=["id"])
    src = spark.createDataFrame(
        [(i, 1, float(-i)) for i in range(1, 101, 2)], "id int, seq int, v double"
    )
    t.merge(src, ["id"], version_col="seq")
    assert t.read().count() == 100
    assert t.read().filter("id = 51").first().v == -51.0
    man = t.manifest()
    assert sum(e["rows"] for e in man["file_list"]) == 100


def test_bucketed_write_orphan_file_at_empty_bucket_falls_back(
    spark, tmp_path, monkeypatch
):
    """ADVICE r06 low (symmetry): a part file at an index whose bucket
    is EMPTY (another bucket's rows routed onto it) must also trip the
    harvest fallback — the old per-index loop skipped empty buckets and
    never saw the orphan."""
    real = lh._hash_slots

    def swapped(n):
        out = list(real(n))
        if n >= 2:  # route bucket 0's rows onto partition 1's slot
            out[0] = out[1]
        return out

    monkeypatch.setattr(lh, "_hash_slots", swapped)
    lh._HASH_SLOT_MEMO.clear()
    try:
        # bucket 1 (ids 26..50) stays empty; bucket 0 lands on index 1
        df = spark.createDataFrame(
            [(i, 0, float(i)) for i in list(range(1, 26)) + list(range(51, 101))],
            "id int, seq int, v double",
        )
        t = LakehouseTable.create_bucketed(
            df,
            str(tmp_path / "o"),
            key="id",
            boundaries=[26, 51, 76],
            stats_cols=["id"],
        )
        man = t.manifest()
        assert man["rows"] == 75
        assert t.read().count() == 75
        assert sum(e["rows"] for e in man["file_list"]) == 75
    finally:
        lh._HASH_SLOT_MEMO.clear()
