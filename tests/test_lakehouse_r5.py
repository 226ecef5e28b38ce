"""Round-5 lakehouse hardening (the four ADVICE r04 findings):

1. stacked delete_where calls with DIFFERENT key columns each anti-join
   with their own tombstone schema (previously: union of mismatched
   tombstones → null-key join → deleted rows resurrected);
2. publish() validates the staged schema against the table schema
   (extra / retyped columns fail the publish instead of silently
   dropping on read);
3. abandoned WAP stages are reclaimable: abort_staged() and the
   age-gated vacuum sweep;
4. delete_where tombstones NULL keys (null-safe anti-join) and records
   accurate per-file row counts with the key columns on each entry.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.operators.lakehouse import LakehouseTable


def _mk(spark, tmp_path, rows=None):
    rows = rows or [(i, "x" if i % 3 == 0 else "y", float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id int, cat string, v double")
    return LakehouseTable.create(df, str(tmp_path / "t"))


def test_stacked_deletes_with_different_keys(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where(F.col("cat") == "x", ["cat"])  # ids 3,6,9,12,15,18
    t.delete_where(F.col("id") == 5, ["id"])
    got = sorted(r.id for r in t.read().collect())
    want = [i for i in range(1, 21) if i % 3 != 0 and i != 5]
    assert got == want
    # each tombstone entry carries its own keys
    man = t.manifest()
    keysets = sorted(tuple(e["keys"]) for e in man["delete_list"])
    assert keysets == [("cat",), ("id",)]


def test_delete_where_tombstones_null_keys(spark, tmp_path):
    rows = [(1, "a", 1.0), (2, None, 2.0), (3, None, 3.0), (4, "b", 4.0)]
    t = _mk(spark, tmp_path, rows)
    t.delete_where(F.col("cat").isNull(), ["cat"])
    got = sorted(r.id for r in t.read().collect())
    assert got == [1, 4]
    assert t.last_delete_rows == 1  # one distinct (NULL) key row


def test_delete_list_rows_are_per_file(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where(F.col("id") <= 4, ["id"])
    entries = [e for e in t.manifest()["delete_list"]]
    assert sum(e["rows"] for e in entries) == 4
    for e in entries:
        assert e["rows"] > 0  # no global-count stamping


def test_publish_rejects_extra_columns(spark, tmp_path):
    t = _mk(spark, tmp_path)
    bad = spark.createDataFrame(
        [(99, "z", 9.0, "surprise")], "id int, cat string, v double, extra string"
    )
    token = t.stage_append(bad)
    with pytest.raises(ValueError, match="extra"):
        t.publish(token)
    t.abort_staged(token)


def test_publish_rejects_retyped_columns(spark, tmp_path):
    t = _mk(spark, tmp_path)
    bad = spark.createDataFrame([(99, "z", "9.0")], "id int, cat string, v string")
    token = t.stage_append(bad)
    with pytest.raises(ValueError, match="retyped"):
        t.publish(token)
    t.abort_staged(token)


def test_publish_allows_missing_columns(spark, tmp_path):
    """A staged df LACKING table columns is fine — read() projects the
    missing columns as null under the snapshot schema."""
    t = _mk(spark, tmp_path)
    ok = spark.createDataFrame([(99, "z")], "id int, cat string")
    t.publish(t.stage_append(ok))
    row = t.read().filter(F.col("id") == 99).collect()[0]
    assert row.v is None


def test_abort_staged_removes_descriptor_and_data(spark, tmp_path):
    t = _mk(spark, tmp_path)
    token = t.stage_append(spark.createDataFrame([(99, "z", 9.0)], "id int, cat string, v double"))
    desc = os.path.join(t._mdir, f"{token}.json")
    data = os.path.join(t.path, "data", token)
    assert os.path.exists(desc) and os.path.isdir(data)
    t.abort_staged(token)
    assert not os.path.exists(desc) and not os.path.exists(data)
    t.abort_staged(token)  # idempotent


def test_vacuum_sweeps_abandoned_stages(spark, tmp_path):
    t = _mk(spark, tmp_path)
    token = t.stage_append(spark.createDataFrame([(99, "z", 9.0)], "id int, cat string, v double"))
    time.sleep(0.05)
    # default vacuum never touches stages
    t.vacuum(retain_versions=1)
    assert os.path.exists(os.path.join(t._mdir, f"{token}.json"))
    # an age-gated sweep with a generous horizon keeps the fresh stage
    dropped = t.vacuum(retain_versions=1, sweep_staged_older_than_s=3600)
    assert os.path.exists(os.path.join(t._mdir, f"{token}.json"))
    # ... and reclaims it once it is older than the horizon
    dropped = t.vacuum(retain_versions=1, sweep_staged_older_than_s=0.01)
    assert not os.path.exists(os.path.join(t._mdir, f"{token}.json"))
    assert not os.path.exists(os.path.join(t.path, "data", token))
    assert any(token in p for p in dropped)


def test_version_col_merge_latest_wins_any_order(spark, tmp_path):
    """Out-of-order CDC apply: deliver seq 3, then seq 1, then seq 2 —
    final state must still be the seq-3 image per key (a late lower-seq
    batch can never clobber newer state)."""
    sch = "k int, seq int, v string"
    t = LakehouseTable.create_bucketed(
        spark.createDataFrame([(1, 3, "newest"), (2, 3, "n2")], sch),
        str(tmp_path / "t"),
        key="k",
        boundaries=[2],
        stats_cols=["k"],
    )
    t.merge(spark.createDataFrame([(1, 1, "oldest"), (3, 1, "o3")], sch), ["k"], version_col="seq")
    t.merge(spark.createDataFrame([(1, 2, "mid"), (3, 2, "m3")], sch), ["k"], version_col="seq")
    got = {r.k: (r.seq, r.v) for r in t.read().collect()}
    assert got == {1: (3, "newest"), 2: (3, "n2"), 3: (2, "m3")}


def test_cdc_batch_reads_only_touched_files(spark, tmp_path):
    """The VERDICT r04 next-step-2 gate: a key-local CDC batch's state
    read must list FEWER files than the table holds (O(touched), not
    O(state)); merge() records the split as last_merge_pruned."""
    sch = "k int, seq int, v string"
    base = spark.createDataFrame([(i, 1, f"v{i}") for i in range(1, 401)], sch)
    t = LakehouseTable.create_bucketed(
        base, str(tmp_path / "t"), key="k", boundaries=[101, 201, 301], stats_cols=["k"]
    )
    assert t.manifest()["files"] == 4
    # batch touches only the low-key range → 3 of 4 files carried by
    # reference
    batch = spark.createDataFrame([(i, 2, "upd") for i in range(1, 50)], sch)
    t.merge(batch, ["k"], version_col="seq")
    read_files, carried = t.last_merge_pruned[1] - t.last_merge_pruned[0], t.last_merge_pruned[0]
    assert carried == 3 and read_files == 1, t.last_merge_pruned
    # untouched files are the SAME file objects (by-reference carry)
    man = t.manifest()
    assert man["files"] == 4
    got = {r.k: r.v for r in t.read().collect()}
    assert got[10] == "upd" and got[399] == "v399" and len(got) == 400
    # and the rewritten file kept its key-range-disjoint bucketing, so
    # the NEXT low-key batch prunes just as hard
    t.merge(
        spark.createDataFrame([(i, 3, "upd2") for i in range(1, 50)], sch),
        ["k"],
        version_col="seq",
    )
    assert t.last_merge_pruned[0] == 3, t.last_merge_pruned


def test_legacy_manifest_delete_keys_still_read(spark, tmp_path):
    """Entries written before per-file keys (no 'keys' field) fall back
    to the manifest-level delete_keys."""
    t = _mk(spark, tmp_path)
    t.delete_where(F.col("id") == 7, ["id"])
    man_path = t._manifest_path(t.current_version())
    with open(man_path) as f:
        man = json.load(f)
    for e in man["delete_list"]:
        e.pop("keys")
    os.remove(man_path)
    with open(man_path, "w") as f:
        json.dump(man, f)
    assert sorted(r.id for r in t.read().collect()) == [
        i for i in range(1, 21) if i != 7
    ]
