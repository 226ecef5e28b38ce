"""Round-6 lakehouse hardening (the four ADVICE r05 findings):

1. version_col merge dedupes the SOURCE batch in the no-hit branch (and
   create_bucketed dedupes its seed batch) — a micro-batch carrying an
   insert AND an update for the same brand-new key lands as one row;
2. _apply_deletes raises on a tombstone group that resolves to an empty
   key tuple instead of anti-joining on lit(True) (which would silently
   delete every row);
3. vacuum's staged sweep never reclaims a stage whose files a live
   manifest references (the publish-committed-but-descriptor-not-yet-
   removed race);
4. version_col merge validates the source schema against the table
   schema (extra / retyped columns raise, mirroring publish()).
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.operators.lakehouse import LakehouseTable


def _seed(spark, tmp_path, rows=None):
    rows = rows or [(i, 0, float(i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "id int, seq int, v double")
    return LakehouseTable.create(df, str(tmp_path / "t"), stats_cols=["id"])


# -- ADVICE r05 #1: latest-wins inside a single batch ----------------------


def test_version_merge_no_hit_batch_dedupes(spark, tmp_path):
    t = _seed(spark, tmp_path)
    # keys 100/101 are brand-new (pruning → no hit) and each arrives
    # TWICE in one batch: an insert generation and an update generation
    src = spark.createDataFrame(
        [(100, 1, 1.0), (100, 2, 2.0), (101, 1, 3.0), (101, 3, 4.0)],
        "id int, seq int, v double",
    )
    t.merge(src, ["id"], version_col="seq")
    got = {r.id: (r.seq, r.v) for r in t.read().filter("id >= 100").collect()}
    assert got == {100: (2, 2.0), 101: (3, 4.0)}
    assert t.read().filter("id >= 100").count() == 2  # no duplicate rows


def test_create_bucketed_seed_batch_dedupes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (2, 1, 3.0), (9, 5, 9.0)],
        "id int, seq int, v double",
    )
    t = LakehouseTable.create_bucketed(
        df,
        str(tmp_path / "t"),
        key="id",
        boundaries=[5],
        stats_cols=["id"],
        keys=["id"],
        version_col="seq",
    )
    got = {r.id: r.seq for r in t.read().collect()}
    assert got == {1: 2, 2: 1, 9: 5}


# -- ADVICE r05 #4: version_col merge never silently narrows ---------------


def test_version_merge_rejects_extra_and_retyped_columns(spark, tmp_path):
    t = _seed(spark, tmp_path)
    extra = spark.createDataFrame(
        [(1, 9, 1.0, "x")], "id int, seq int, v double, junk string"
    )
    with pytest.raises(ValueError, match="extra columns \\['junk'\\]"):
        t.merge(extra, ["id"], version_col="seq")
    retyped = spark.createDataFrame([(1, 9, 1)], "id int, seq int, v int")
    with pytest.raises(ValueError, match="retyped columns \\['v'\\]"):
        t.merge(retyped, ["id"], version_col="seq")
    # table untouched by the failed merges
    assert t.current_version() == 1
    assert t.read().count() == 8


# -- ADVICE r05 #2: empty-key tombstone group fails loudly -----------------


def test_apply_deletes_raises_on_empty_key_tuple(spark, tmp_path):
    t = _seed(spark, tmp_path)
    t.delete_where(F.col("id") == 3, ["id"])
    # corrupt the manifest the way a malformed/legacy writer would:
    # strip the per-entry keys and the manifest-level delete_keys
    mpath = t._manifest_path(t.current_version())
    man = json.load(open(mpath))
    for e in man["delete_list"]:
        e.pop("keys", None)
    man.pop("delete_keys", None)
    with open(mpath, "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="empty key tuple"):
        t.read().collect()


# -- ADVICE r05 #3: staged sweep vs concurrent publish ---------------------


def test_vacuum_staged_sweep_spares_published_stage(spark, tmp_path):
    t = _seed(spark, tmp_path)
    token = t.stage_append(
        spark.createDataFrame([(50, 0, 50.0)], "id int, seq int, v double")
    )
    desc_path = os.path.join(t._mdir, f"{token}.json")
    # simulate the race window: publish() has committed the manifest
    # referencing the staged files but has NOT yet removed the
    # descriptor — replay publish's commit step by hand
    desc = t._staged(token)
    man = t.manifest()
    t._commit(
        man["version"] + 1,
        "append",
        man["file_list"] + desc["files"],
        schema_json=man.get("schema_json"),
    )
    assert os.path.exists(desc_path)  # descriptor still present
    old = time.time() - 3600
    os.utime(desc_path, (old, old))  # aged well past the sweep horizon
    dropped = t.vacuum(retain_versions=10, sweep_staged_older_than_s=60)
    staged_rel = {f["path"] for f in desc["files"]}
    assert not (set(dropped) & staged_rel)
    # the committed snapshot still reads the staged rows
    assert t.read().filter("id = 50").count() == 1
    for rel in staged_rel:
        assert os.path.exists(os.path.join(t.path, rel))


def test_vacuum_staged_sweep_still_reclaims_abandoned_stage(spark, tmp_path):
    t = _seed(spark, tmp_path)
    token = t.stage_append(
        spark.createDataFrame([(60, 0, 60.0)], "id int, seq int, v double")
    )
    desc_path = os.path.join(t._mdir, f"{token}.json")
    old = time.time() - 3600
    os.utime(desc_path, (old, old))
    dropped = t.vacuum(retain_versions=10, sweep_staged_older_than_s=60)
    assert dropped  # the abandoned stage's files were reclaimed
    assert not os.path.exists(desc_path)
    assert t.read().filter("id = 60").count() == 0


# -- bucketed write: exact slot routing (plain write, no partitionBy) ------


def test_murmur3_slots_match_spark_hash_partitioning(spark):
    """_hash_slots' pure-Python murmur3 must agree with the JVM
    Murmur3Hash expression (seed 42) that repartition(n, col) uses —
    the whole slot-routing scheme rests on this equality."""
    from matt3r_data_ingestion_serverless_spark.operators.lakehouse import (
        _hash_slots,
        _murmur3_int32,
        _pmod,
    )

    vals = list(range(0, 64)) + [2**31 - 1, -1, -2**31, 123456789]
    rows = spark.createDataFrame([(v,) for v in vals], "i int").select(
        "i", F.hash("i").alias("h"), F.pmod(F.hash("i"), F.lit(7)).alias("p")
    ).collect()
    for r in rows:
        assert _murmur3_int32(r.i) == r.h
        assert _pmod(_murmur3_int32(r.i), 7) == r.p
    for n in (1, 2, 4, 8, 16):
        slots = _hash_slots(n)
        assert len(set(slots)) == n
        assert [_pmod(_murmur3_int32(j), n) for j in slots] == list(range(n))


def test_bucketed_write_one_file_per_bucket_part_index(spark, tmp_path):
    """The plain-write bucketed layout: exactly one parquet file per
    non-empty bucket, file part-index == bucket id, manifest stats keep
    the per-file key ranges disjoint, and read() round-trips."""
    rows = [(i, 0, float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id int, seq int, v double")
    t = LakehouseTable.create_bucketed(
        df,
        str(tmp_path / "b"),
        key="id",
        boundaries=[26, 51, 76],
        stats_cols=["id"],
        keys=["id"],
        version_col="seq",
    )
    man = t.manifest()
    assert len(man["file_list"]) == 4
    seen_ranges = []
    for b, entry in enumerate(sorted(man["file_list"], key=lambda e: e["path"])):
        name = os.path.basename(entry["path"])
        assert name.startswith(f"part-{b:05d}-")  # slot routing held
        assert "_pbkt" not in entry["path"]  # plain write, no partition dirs
        seen_ranges.append(tuple(entry["stats"]["id"]))
    assert seen_ranges == [(1, 25), (26, 50), (51, 75), (76, 100)]
    assert t.read().count() == 100
    # merge keeps the layout: touch one bucket, others carried by reference
    src = spark.createDataFrame([(30, 1, 999.0)], "id int, seq int, v double")
    t.merge(src, ["id"], version_col="seq")
    assert t.last_merge_pruned == (3, 4)
    assert t.read().filter("id = 30").first().v == 999.0
    assert t.read().count() == 100


def test_compact_preserves_range_pruning(spark, tmp_path):
    """Compaction must not blind _touched_files: after compact(), the
    rewritten files stay range-disjoint on the stat key, so a key-local
    merge still prunes to a strict subset (a hash repartition layout
    would give every file the full keyspace and touch all of them)."""
    t = _seed(spark, tmp_path, rows=[(i, 0, float(i)) for i in range(1, 201)])
    t.compact(target_files=4)
    man = t.manifest()
    assert len(man["file_list"]) == 4
    spans = sorted(tuple(e["stats"]["id"]) for e in man["file_list"])
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a < lo_b  # disjoint, ascending
    src = spark.createDataFrame([(3, 1, 999.0)], "id int, seq int, v double")
    t.merge(src, ["id"])
    pruned, total = t.last_merge_pruned
    assert total == 4 and pruned == 3  # only the low-range file touched
    assert t.read().count() == 200
    assert t.read().filter("id = 3").first().v == 999.0


def test_compact_degenerate_key_extent_single_bucket(spark, tmp_path):
    """All rows share one key value: interpolation yields no valid split
    points, compaction degrades to a single bucket file, content intact."""
    t = _seed(spark, tmp_path, rows=[(7, 0, float(i)) for i in range(50)])
    t.compact(target_files=4)
    man = t.manifest()
    assert len(man["file_list"]) == 1
    assert man["rows"] == 50
    assert t.read().count() == 50


def test_compact_float_and_negative_keys(spark, tmp_path):
    """Float stat key spanning negative values: boundaries interpolate in
    float space and the rewritten files stay range-disjoint."""
    rows = [(i, 0, -100.0 + 7.5 * i) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id int, seq int, v double")
    t = LakehouseTable.create(df, str(tmp_path / "t"), stats_cols=["v"])
    t.compact(target_files=4)
    man = t.manifest()
    assert len(man["file_list"]) == 4
    spans = sorted(tuple(e["stats"]["v"]) for e in man["file_list"])
    for (_, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a < lo_b
    assert t.read().count() == 100


def test_plain_merge_preserves_range_pruning(spark, tmp_path):
    """The non-version merge flavor must also rewrite touched files
    range-disjoint: after a key-local merge into a range-clustered
    table, a SECOND key-local merge still prunes to a strict subset."""
    t = _seed(spark, tmp_path, rows=[(i, 0, float(i)) for i in range(1, 201)])
    t.compact(target_files=4)  # range-clustered baseline
    t.merge(
        spark.createDataFrame([(5, 1, 501.0)], "id int, seq int, v double"),
        ["id"],
    )
    man = t.manifest()
    spans = sorted(tuple(e["stats"]["id"]) for e in man["file_list"])
    for (_, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a < lo_b  # still disjoint after the plain merge
    t.merge(
        spark.createDataFrame([(190, 1, 901.0)], "id int, seq int, v double"),
        ["id"],
    )
    pruned, total = t.last_merge_pruned
    assert pruned == total - 1  # only the high-range file touched
    assert t.read().filter("id = 5").first().v == 501.0
    assert t.read().filter("id = 190").first().v == 901.0
    assert t.read().count() == 200


def test_merge_with_overlapping_legacy_layout_dedup_boundaries(spark, tmp_path):
    """A table created from an arbitrary (overlapping-range) layout can
    feed the bucketed merge writer duplicate split points — the CASE
    bucket assignment must still produce disjoint, content-complete
    files (duplicate boundaries just leave some bucket ids empty)."""
    df = spark.createDataFrame(
        [(i, 0, float(i)) for i in range(1, 101)], "id int, seq int, v double"
    ).repartition(4)  # hash layout: every file spans ~the full key range
    t = LakehouseTable.create(df, str(tmp_path / "t"), stats_cols=["id"])
    man0 = t.manifest()
    assert len(man0["file_list"]) == 4
    lows = sorted(e["stats"]["id"][0] for e in man0["file_list"])
    assert lows[0] == lows[1] or lows[-1] - lows[0] < 50  # overlapping spans
    src = spark.createDataFrame([(50, 1, 999.0)], "id int, seq int, v double")
    t.merge(src, ["id"])  # touches all files; rewrite goes bucketed
    assert t.read().count() == 100
    assert t.read().filter("id = 50").first().v == 999.0
    man1 = t.manifest()
    spans = sorted(tuple(e["stats"]["id"]) for e in man1["file_list"])
    for (_, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a < lo_b  # rewritten files are range-disjoint
    # and a follow-up key-local merge prunes against the repaired layout
    t.merge(spark.createDataFrame([(99, 2, 1.0)], "id int, seq int, v double"), ["id"])
    pruned, total = t.last_merge_pruned
    assert pruned >= 1


def test_bucketed_write_falls_back_to_harvest_on_bad_routing(spark, tmp_path, monkeypatch):
    """If slot routing ever diverges (engine hash change), buckets
    collide into shared files and the missing-part-index check must
    route the commit through the stats harvest — correctness never
    rests on the fast path."""
    from matt3r_data_ingestion_serverless_spark.operators import lakehouse as lh

    monkeypatch.setattr(lh, "_hash_slots", lambda n: [0] * n)  # all buckets → one task
    df = spark.createDataFrame(
        [(i, 0, float(i)) for i in range(1, 101)], "id int, seq int, v double"
    )
    t = lh.LakehouseTable.create_bucketed(
        df,
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
    # harvest stats are per actual file, so pruning stays CORRECT
    # (conservative): a merge still sees every key inside some span
    src = spark.createDataFrame([(30, 1, 999.0)], "id int, seq int, v double")
    t.merge(src, ["id"], version_col="seq")
    assert t.read().filter("id = 30").first().v == 999.0
    assert t.read().count() == 100
