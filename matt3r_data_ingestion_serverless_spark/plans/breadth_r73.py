"""Round-4 batch: lakehouse optimistic concurrency, vacuum lifecycle,
and WHEN-MATCHED-only merge — grading the VERDICT r03 punch-list items
(concurrent-writer commit protocol, vacuum retention) and the ADVICE
r03 insert=False fast-path fix on the oracle-checked path.

Reference parity: the reference's merge never detects a lost update —
its overlap check + last-write-wins S3 PUT
(parse_canserver_filtered_log.py:327-344) is exactly the race the
put-if-absent commit in operators/lakehouse.py closes.
"""

from __future__ import annotations

import shutil
import types

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6_sql
from matt3r_data_ingestion_serverless_spark.operators.lakehouse import LakehouseTable
from matt3r_data_ingestion_serverless_spark.plans.breadth_r69 import (
    _MERGED_SQL,
    _batch_df,
    _build_table,
    _final_select,
)
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# j12: two concurrent writers — both commits must survive
# ---------------------------------------------------------------------------

_J12_SQL = f"""
WITH cut AS (
  SELECT CAST(floor(max(o_orderkey) / 10) AS BIGINT) AS c FROM orders
), t AS (
  SELECT o_orderkey AS k, o_custkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 4 <> 3
), s AS (
  SELECT o_orderkey AS k, o_custkey,
         o_totalprice + 1000.0 AS o_totalprice,
         'U' AS o_orderstatus,
         (o_custkey % 7 = 0) AS del
  FROM orders, cut WHERE o_orderkey <= cut.c
), m AS (
  SELECT coalesce(t.k, s.k) AS k,
         coalesce(t.o_custkey, s.o_custkey) AS o_custkey,
         CASE WHEN s.k IS NULL THEN t.o_totalprice ELSE s.o_totalprice END AS o_totalprice,
         CASE WHEN s.k IS NULL THEN t.o_orderstatus ELSE s.o_orderstatus END AS o_orderstatus,
         s.k IS NOT NULL AND s.del AS del
  FROM t FULL JOIN s ON t.k = s.k
  WHERE s.k IS NULL OR NOT s.del
), b AS (
  SELECT o_orderkey AS k, o_custkey, o_totalprice, 'N' AS o_orderstatus
  FROM orders, cut WHERE o_orderkey % 4 = 3 AND o_orderkey > cut.c * 8
)
SELECT k, o_custkey, {round6_sql('o_totalprice')} AS total_r, o_orderstatus FROM m
UNION ALL
SELECT k, o_custkey, {round6_sql('o_totalprice')} AS total_r, o_orderstatus FROM b
"""


def _writer_b_batch(spark: SparkSession, sf_dir: str, cut: int) -> DataFrame:
    """Pure inserts, key-disjoint from writer A's decile batch: the
    high-key tail of the keys the base table excludes."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") % 4 == 3) & (F.col("o_orderkey") > cut * 8))
        .select(
            F.col("o_orderkey").alias("k"),
            "o_custkey",
            "o_totalprice",
            F.lit("N").alias("o_orderstatus"),
        )
    )


@register("j12_lakehouse_concurrent_merge", sql=_J12_SQL)
def j12_lakehouse_concurrent_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic concurrency on the graded path: writer A's merge is
    interrupted at the instant before it publishes by writer B's whole
    merge (a second handle on the same table) committing first. A's
    put-if-absent ``os.link`` fails with :class:`CommitConflictError`,
    A reclaims its orphaned attempt, re-reads the FRESH snapshot,
    recomputes the touched-file set, and retries — so the final table
    contains BOTH writers' changes as versions 2 and 3 (the Delta/
    Iceberg commit-conflict contract; the pre-fix ``os.rename`` would
    have silently erased B's commit). The batches are key-disjoint, so
    the outcome is order-independent and the oracle is the one-shot
    composition of both merges over the base.

    Scale: conflict resolution costs one manifest re-read plus a replay
    of the LOSER's batch-sized work — never a table rewrite; winners
    pay nothing."""
    tbl_a, root, cut = _build_table(spark, sf_dir)
    tbl_b = LakehouseTable(spark, root)
    try:
        batch_b = _writer_b_batch(spark, sf_dir, cut)
        fired = {"done": False}
        orig_commit = tbl_a._commit

        def racing_commit(self, version, operation, files, schema_json=None):
            if operation == "merge" and not fired["done"]:
                fired["done"] = True
                tbl_b.merge(batch_b, keys=["k"])
            return orig_commit(version, operation, files, schema_json=schema_json)

        tbl_a._commit = types.MethodType(racing_commit, tbl_a)
        tbl_a.merge(
            _batch_df(spark, sf_dir, cut),
            keys=["k"],
            update_cols=["o_totalprice", "o_orderstatus"],
            delete_condition=F.col("o_custkey") % 7 == 0,
        )
        assert fired["done"] and tbl_a.current_version() == 3
        assert [m["operation"] for m in tbl_a.history()] == ["create", "merge", "merge"]
        return _final_select(tbl_a.read()).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# j13: vacuum retention — current snapshot intact, horizon enforced
# ---------------------------------------------------------------------------


@register("j13_lakehouse_vacuum", sql=_MERGED_SQL)
def j13_lakehouse_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM on the graded path: merge → compact → vacuum(retain 1)
    reclaims every data file referenced only by the create/merge
    snapshots, then the graded rows are the post-vacuum CURRENT read —
    same oracle as the merge itself, proving vacuum never touches live
    files. Time travel past the horizon raises a clear 'vacuumed'
    error (asserted here) and history() starts at the horizon instead
    of crashing — the retention contract every lakehouse documents.

    Scale: vacuum is manifest-diff + file deletes — O(files reclaimed)
    metadata ops, no data read."""
    tbl, root, cut = _build_table(spark, sf_dir)
    try:
        tbl.merge(
            _batch_df(spark, sf_dir, cut),
            keys=["k"],
            update_cols=["o_totalprice", "o_orderstatus"],
            delete_condition=F.col("o_custkey") % 7 == 0,
        )
        tbl.compact(target_files=4)
        dropped = tbl.vacuum(retain_versions=1)
        assert dropped, "superseded create/merge files must be reclaimed"
        assert [m["version"] for m in tbl.history()] == [3]
        try:
            tbl.read(version=1)
            raise AssertionError("time travel past the vacuum horizon must raise")
        except ValueError as e:
            assert "vacuumed" in str(e)
        return _final_select(tbl.read()).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# j14: WHEN-MATCHED-only merge (insert=False) with full pruning
# ---------------------------------------------------------------------------


@register(
    "j14_lakehouse_matched_only_merge",
    sql=f"""
SELECT o_orderkey AS k, o_custkey,
       {round6_sql('o_totalprice')} AS total_r, o_orderstatus
FROM orders WHERE o_orderkey % 4 <> 3
""",
)
def j14_lakehouse_matched_only_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with insert=False whose batch is key-disjoint from the
    whole table: manifest pruning eliminates every target file, and the
    WHEN-MATCHED-only contract means NO source row may appear — the
    committed snapshot is byte-identical to the base (the ADVICE r03
    fast-path fix: pre-fix, the no-hit branch inserted the whole batch
    regardless of ``insert``). The batch also carries a column the
    table lacks, proving the committed schema stays the TABLE's instead
    of narrowing/widening to the source's. The oracle is the untouched
    base table."""
    tbl, root, cut = _build_table(spark, sf_dir)
    try:
        mx = cut * 10
        disjoint = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") <= cut)
            .select(
                (F.col("o_orderkey") + 10 * mx).alias("k"),  # beyond every stat range
                "o_custkey",
                F.lit(0.0).alias("o_totalprice"),
                F.lit("Z").alias("o_orderstatus"),
                F.lit("extra").alias("not_a_table_column"),
            )
        )
        tbl.merge(
            disjoint,
            keys=["k"],
            update_cols=["o_totalprice", "o_orderstatus"],
            insert=False,
        )
        assert tbl.current_version() == 2
        pruned, total = tbl.last_merge_pruned
        assert pruned == total, "disjoint batch must prune every file"
        return _final_select(tbl.read()).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
