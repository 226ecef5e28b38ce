"""Idempotent dedupe-upsert sink (SURVEY.md §2.6 J1–J3, §2.8 T3/T4).

The reference merges each new batch into previously-written hourly/daily
JSON files with ordered-concat logic that SKIPS the write on overlap
(parse_canserver_filtered_log.py:327-344, infer_stationary_states.py:117-133)
— and its existence check can never fire on its own output (the
`.parquet`-name vs `.json`-sink quirk, :328 vs :348). We implement the
*intended* semantics: target ∪ batch, deduplicated on the logical key —
re-delivering any batch (SQS at-least-once, serverless.yml:179-204) is
a no-op.

Scale stance: never rewrite the whole table. With
``partitionOverwriteMode=dynamic`` only the partitions present in the
incoming batch are read back, merged, and overwritten — at 100 TB a
batch touches a handful of (device, date, hour) partitions, so the
merge cost is proportional to the batch, not the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_parquet(
    batch_df: DataFrame,
    target_dir: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """Merge ``batch_df`` into the parquet table at ``target_dir``,
    deduplicating on ``keys`` (first writer wins — union puts existing
    rows first so re-delivered rows never replace committed ones)."""
    spark = batch_df.sparkSession
    partition_cols = list(partition_cols or [])
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    if _table_exists(spark, target_dir):
        old = spark.read.parquet(target_dir)
        if partition_cols:
            # read back only the partitions the batch touches: a
            # broadcast semi-join against the batch's distinct partition
            # values → partition pruning on the parquet scan.
            touched = batch_df.select(*partition_cols).distinct()
            old = old.join(F.broadcast(touched), on=partition_cols, how="left_semi")
        # first-writer-wins must be deterministic: dropDuplicates keeps an
        # arbitrary row, so rank committed rows (_src=0) ahead of the batch.
        merged = (
            old.withColumn("_src", F.lit(0))
            .unionByName(batch_df.withColumn("_src", F.lit(1)))
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(*keys).orderBy("_src")
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_src", "_rn")
        )
    else:
        merged = batch_df.dropDuplicates(keys)

    writer = merged.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(target_dir)


def _table_exists(spark: SparkSession, path: str) -> bool:
    if not os.path.exists(path):
        return False
    # a dir with no committed parquet part files is "absent"
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def foreach_batch_upsert(target_dir: str, keys: list[str], partition_cols: list[str] | None = None):
    """Adapter for ``writeStream.foreachBatch`` — the streaming sink that
    replaces the reference's per-file S3 merge round-trip."""

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        upsert_parquet(batch_df, target_dir, keys, partition_cols)

    return _sink
