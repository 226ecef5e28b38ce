"""operators/lakehouse.py: manifest commits, key-range merge pruning,
snapshot time travel, file-skipping scans (VERDICT r02 next-step 3)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.operators.lakehouse import LakehouseTable
from matt3r_data_ingestion_serverless_spark.operators.merge import merge_plan


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="lh_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _base(spark):
    rows = [(k, k % 10, float(k) * 1.5, "O") for k in range(1, 401)]
    return spark.createDataFrame(
        rows, "k BIGINT, grp BIGINT, price DOUBLE, status STRING"
    ).repartitionByRange(8, "k")


def _batch(spark):
    # keys 1..40 (updates), 1000..1009 (inserts), grp==3 rows are deletes
    rows = [(k, k % 10, float(k) * 2.0, "U") for k in range(1, 41)] + [
        (k, k % 10, float(k), "I") for k in range(1000, 1010)
    ]
    return spark.createDataFrame(rows, "k BIGINT, grp BIGINT, price DOUBLE, status STRING")


def test_create_read_roundtrip(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    assert tbl.current_version() == 1
    assert tbl.read().count() == 400
    assert sorted(r.k for r in tbl.read().collect()) == list(range(1, 401))


def test_merge_matches_unpruned_merge_plan(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl.merge(
        _batch(spark),
        keys=["k"],
        update_cols=["price", "status"],
        delete_condition=F.col("grp") == 3,
    )
    got = {(r.k, r.grp, r.price, r.status) for r in tbl.read().collect()}
    want = {
        (r.k, r.grp, r.price, r.status)
        for r in merge_plan(
            _base(spark),
            _batch(spark),
            ["k"],
            update_cols=["price", "status"],
            delete_condition=F.col("grp") == 3,
        ).collect()
    }
    assert got == want


def test_merge_prunes_disjoint_files_by_reference(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    v1_files = {f["path"] for f in tbl.manifest(1)["file_list"]}
    tbl.merge(_batch(spark), keys=["k"], update_cols=["price", "status"])
    pruned, total = tbl.last_merge_pruned
    assert pruned > 0, "contiguous batch must skip disjoint files"
    # pruned files appear in v2 UNCHANGED — carried by reference
    v2_files = {f["path"] for f in tbl.manifest(2)["file_list"]}
    assert len(v1_files & v2_files) == pruned
    assert total == len(v1_files)


def test_time_travel_snapshot_immutable(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl.merge(
        _batch(spark),
        keys=["k"],
        update_cols=["price", "status"],
        delete_condition=F.col("grp") == 3,
    )
    v1 = tbl.read(version=1)
    assert v1.count() == 400
    assert v1.filter(F.col("status") != "O").count() == 0
    assert tbl.read().filter(F.col("status") == "U").count() > 0


def test_merge_idempotent_redelivery(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    kw = dict(keys=["k"], update_cols=["price", "status"], delete_condition=F.col("grp") == 3)
    tbl.merge(_batch(spark), **kw)
    once = sorted((r.k, r.price, r.status) for r in tbl.read().collect())
    tbl.merge(_batch(spark), **kw)
    assert sorted((r.k, r.price, r.status) for r in tbl.read().collect()) == once


def test_scan_skips_files_and_loses_no_rows(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    hit, total = tbl.files_scanned({"k": (1, 50)})
    assert hit < total, "range-clustered table must skip files"
    got = sorted(
        r.k for r in tbl.scan({"k": (1, 50)}).filter(F.col("k").between(1, 50)).collect()
    )
    assert got == list(range(1, 51))


def test_crashed_commit_leaves_table_readable(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    # simulate a writer that died after writing data files but before
    # publishing: drop orphan files + a .tmp manifest into place
    orphan = os.path.join(root, "data", "commit-99-dead")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("not parquet")
    with open(os.path.join(root, "_manifest", "v2.json.tmp-999"), "w") as f:
        f.write("{")
    assert tbl.current_version() == 1
    assert tbl.read().count() == 400


def test_schema_evolution_on_read(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    evolved = _batch(spark).withColumn("tag", F.concat(F.lit("t"), F.col("k")))
    tbl.merge(evolved, keys=["k"], update_cols=["price", "status", "tag"], evolve_schema=True)
    out = tbl.read()
    assert "tag" in out.columns
    # rows living in untouched (never-rewritten) files project tag=null
    nulls = out.filter(F.col("tag").isNull()).count()
    touched = out.filter(F.col("tag").isNotNull()).count()
    assert touched == _batch(spark).count()
    assert nulls == 400 - 40  # every base row the batch didn't touch
    # v1 time travel still reads with the OLD schema
    assert "tag" not in tbl.read(version=1).columns


def test_compact_reduces_files_preserves_rows(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    before = sorted(r.k for r in tbl.read().collect())
    tbl.compact(target_files=2)
    man = tbl.manifest()
    assert man["operation"] == "compact" and man["files"] <= 2
    assert sorted(r.k for r in tbl.read().collect()) == before
    # prior snapshot untouched
    assert tbl.read(version=1).count() == 400


def test_commit_path_reads_no_parquet_footers(spark, root, monkeypatch):
    """VERDICT r03 next-step 1: stats are harvested by Spark tasks, so
    the create/merge/compact commit path must never open a parquet
    footer on the driver."""
    import pyarrow.parquet as pq

    def boom(*a, **kw):  # noqa: ANN002
        raise AssertionError("driver-side parquet footer read on commit path")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl.merge(_batch(spark), keys=["k"], update_cols=["price", "status"])
    tbl.compact(target_files=2)
    assert tbl.read().count() == 410
    # stats still harvested: pruning continues to work
    hit, total = tbl.files_scanned({"k": (1, 50)})
    assert 0 < hit


def test_commit_conflict_raises_not_overwrites(spark, root):
    from matt3r_data_ingestion_serverless_spark.operators.lakehouse import (
        CommitConflictError,
    )

    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    other = LakehouseTable(spark, root)
    files = tbl.manifest(1)["file_list"]
    other._commit(2, "merge", files, schema_json=tbl.manifest()["schema_json"])
    with pytest.raises(CommitConflictError):
        tbl._commit(2, "merge", files, schema_json=tbl.manifest(2)["schema_json"])
    # the winner's manifest is intact and CURRENT points at it
    assert tbl.current_version() == 2
    assert tbl.manifest(2)["operation"] == "merge"


def test_concurrent_merges_both_survive(spark, root, monkeypatch):
    """VERDICT r03 next-step 2: two interleaved writers — the loser
    retries against the fresh snapshot, so BOTH commits land."""
    tbl_a = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl_b = LakehouseTable(spark, root)
    batch_a = spark.createDataFrame(
        [(k, k % 10, float(k) * 3.0, "A") for k in range(1, 21)],
        "k BIGINT, grp BIGINT, price DOUBLE, status STRING",
    )
    batch_b = spark.createDataFrame(
        [(k, k % 10, float(k), "B") for k in range(2000, 2010)],
        "k BIGINT, grp BIGINT, price DOUBLE, status STRING",
    )
    orig_commit = LakehouseTable._commit
    raced = {"done": False}

    def racing_commit(self, version, operation, files, schema_json=None):
        # just before writer A publishes its merge, writer B's whole
        # merge lands — A's put-if-absent must fail and A must retry
        if self is tbl_a and operation == "merge" and not raced["done"]:
            raced["done"] = True
            tbl_b.merge(batch_b, keys=["k"], update_cols=["price", "status"])
        return orig_commit(self, version, operation, files, schema_json=schema_json)

    monkeypatch.setattr(LakehouseTable, "_commit", racing_commit)
    tbl_a.merge(batch_a, keys=["k"], update_cols=["price", "status"])
    assert raced["done"]
    assert tbl_a.current_version() == 3  # create + B's merge + A's merge
    out = {r.k: (r.price, r.status) for r in tbl_a.read().collect()}
    assert out[1] == (3.0, "A")  # A's update survived
    assert out[2000] == (2000.0, "B")  # B's insert survived
    assert len(out) == 410
    assert [m["operation"] for m in tbl_a.history()] == ["create", "merge", "merge"]


def test_merge_no_hit_insert_false_is_noop(spark, root):
    """ADVICE r03: when pruning eliminates every target file and
    insert=False, no source row may sneak in as an insert — and the
    committed schema must stay the table's."""
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    disjoint = spark.createDataFrame(
        [(k, float(k), "X") for k in range(5000, 5010)],
        "k BIGINT, price DOUBLE, status STRING",  # narrower: no grp
    )
    tbl.merge(disjoint, keys=["k"], update_cols=["price", "status"], insert=False)
    assert tbl.current_version() == 2  # merge committed (as a no-op)
    out = tbl.read()
    assert out.count() == 400
    assert out.filter(F.col("k") >= 5000).count() == 0
    assert set(out.columns) == {"k", "grp", "price", "status"}


def test_merge_narrow_source_keeps_table_schema(spark, root):
    """ADVICE r03: a source batch lacking snapshot columns must not
    narrow the committed schema."""
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    narrow = spark.createDataFrame(
        [(k, float(k) * 9.0) for k in range(1, 11)], "k BIGINT, price DOUBLE"
    )
    tbl.merge(narrow, keys=["k"], update_cols=["price"])
    out = tbl.read()
    assert set(out.columns) == {"k", "grp", "price", "status"}
    rows = {r.k: (r.grp, r.price, r.status) for r in out.collect()}
    assert rows[1] == (1, 9.0, "O")  # updated price, untouched grp/status
    assert rows[300] == (0, 450.0, "O")  # untouched row fully intact


def test_history_and_read_after_vacuum(spark, root):
    """ADVICE r03: vacuum must not break history(); time travel into
    the reclaimed range raises a clear error, not FileNotFoundError."""
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl.merge(_batch(spark), keys=["k"], update_cols=["price", "status"])
    tbl.compact(target_files=2)
    tbl.vacuum(retain_versions=1)
    assert [m["version"] for m in tbl.history()] == [3]
    with pytest.raises(ValueError, match="vacuumed"):
        tbl.read(version=1)
    assert tbl.read().count() == 410


def test_vacuum_drops_only_unreferenced_files(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl.merge(_batch(spark), keys=["k"], update_cols=["price", "status"])
    tbl.compact(target_files=2)
    rows_before = sorted((r.k, r.price) for r in tbl.read().collect())
    dropped = tbl.vacuum(retain_versions=1)
    assert dropped, "superseded files must be reclaimed"
    # current snapshot fully intact after vacuum
    assert sorted((r.k, r.price) for r in tbl.read().collect()) == rows_before
    for rel in dropped:
        assert not os.path.exists(os.path.join(root, rel))


# -- merge-on-read equality deletes (round 4) --------------------------------


def test_delete_where_rewrites_no_data_files(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    before = [f["path"] for f in tbl.manifest()["file_list"]]
    tbl.delete_where(F.col("grp") == 3, keys=["k"])
    man = tbl.manifest()
    assert [f["path"] for f in man["file_list"]] == before
    assert man["delete_list"] and man["delete_keys"] == ["k"]
    assert tbl.read().count() == 360
    assert tbl.read().filter(F.col("grp") == 3).count() == 0
    # scans apply the tombstones too
    assert tbl.scan({"k": (1, 50)}).filter(F.col("grp") == 3).count() == 0


def test_delete_time_travel_preserves_predelete_snapshot(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl.delete_where(F.col("grp") == 3, keys=["k"])
    assert tbl.read(version=1).count() == 400
    assert tbl.read(version=2).count() == 360


def test_compact_materializes_deletes(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl.delete_where(F.col("grp") == 3, keys=["k"])
    tbl.compact(target_files=2)
    man = tbl.manifest()
    assert not man["delete_list"]
    assert man["rows"] == 360
    assert tbl.read().count() == 360


def test_merge_raises_on_unmaterialized_deletes(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl.delete_where(F.col("grp") == 3, keys=["k"])
    with pytest.raises(ValueError, match="compact"):
        tbl.merge(_batch(spark), keys=["k"])
    tbl.compact(target_files=2)
    tbl.merge(_batch(spark), keys=["k"])  # clean after materialization
    assert tbl.read().filter(F.col("status") == "I").count() == 10


def test_deletes_stack_and_vacuum_keeps_live_tombstones(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    tbl.delete_where(F.col("grp") == 3, keys=["k"])
    tbl.delete_where(F.col("grp") == 7, keys=["k"])
    assert tbl.read().count() == 320
    dropped = tbl.vacuum(retain_versions=1)
    # the current snapshot still references both tombstones: readable
    assert tbl.read().count() == 320
    live = {d["path"] for d in tbl.manifest()["delete_list"]}
    assert live and not (live & set(dropped))
    for rel in live:
        assert os.path.exists(os.path.join(root, rel))


# -- write-audit-publish (round 4) --------------------------------------------


def test_stage_invisible_until_publish(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    extra = spark.createDataFrame(
        [(k, k % 10, float(k), "S") for k in range(2000, 2050)],
        "k BIGINT, grp BIGINT, price DOUBLE, status STRING",
    )
    token = tbl.stage_append(extra)
    assert tbl.read().count() == 400  # main untouched
    assert tbl.current_version() == 1
    assert tbl.read_staged(token).count() == 450  # audit sees the union
    tbl.publish(token)
    assert tbl.current_version() == 2
    assert tbl.read().count() == 450
    assert tbl.manifest()["operation"] == "append"


def test_publish_retries_past_conflicting_commit(spark, root):
    tbl = LakehouseTable.create(_base(spark), root, stats_cols=["k"])
    extra = spark.createDataFrame(
        [(3000, 0, 1.0, "S")], "k BIGINT, grp BIGINT, price DOUBLE, status STRING"
    )
    token = tbl.stage_append(extra)
    # another writer lands v2 first
    tbl.merge(_batch(spark), keys=["k"])
    assert tbl.current_version() == 2
    tbl.publish(token)  # must retry onto v3, not clobber v2
    assert tbl.current_version() == 3
    got = tbl.read()
    assert got.filter(F.col("k") == 3000).count() == 1
    assert got.filter(F.col("status") == "I").count() == 10  # merge survived
