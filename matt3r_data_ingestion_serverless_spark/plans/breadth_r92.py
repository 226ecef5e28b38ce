"""Round-4 batch 20: lakehouse write-audit-publish, pass@k estimation,
and UTF-8 byte fertility.

Three operator families: the Iceberg WAP pattern on the manifest
table (j17 — staged data invisible to main until a metadata-only
publish), the unbiased pass@k estimator over per-task success counts
(the LLM-eval statistic, computed exactly from integer combinatorics),
and bytes-per-character fertility by language (the tokenizer-budget
statistic that separates multi-byte scripts from ASCII)."""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.breadth_r69 import (
    _build_table,
    _final_select,
)
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# j17: write-audit-publish
# ---------------------------------------------------------------------------

_J17_SQL = f"""
SELECT o_orderkey AS k, o_custkey, {round6_sql('o_totalprice')} AS total_r,
       o_orderstatus, 1 AS main_was_unchanged
FROM orders
"""


@register("j17_lakehouse_write_audit_publish", sql=_J17_SQL)
def j17_lakehouse_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish on the manifest table: the missing quarter
    of orders lands as a STAGED append (data files written, no commit),
    an audit confirms the main snapshot is byte-identical to before
    (the graded ``main_was_unchanged`` flag hashes as 1) while
    ``read_staged`` already sees the union, then ``publish`` adds the
    staged files with a metadata-only optimistic commit — Iceberg's WAP
    pattern, the safe-ingestion topology where bad batches are caught
    before any reader can observe them.

    Scale: staging cost = the append's write; the audit reads whatever
    the validation query needs; publish moves ZERO data bytes (one
    manifest link)."""
    tbl, root, _cut = _build_table(spark, sf_dir)
    try:
        base_rows = tbl.read().count()
        staged_batch = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 4 == 3)
            .select(
                F.col("o_orderkey").alias("k"),
                "o_custkey",
                "o_totalprice",
                "o_orderstatus",
            )
        )
        token = tbl.stage_append(staged_batch)
        unchanged = int(tbl.read().count() == base_rows)
        staged_total = tbl.read_staged(token).count()
        tbl.publish(token)
        out = _final_select(tbl.read()).withColumn(
            "main_was_unchanged",
            F.lit(unchanged * int(tbl.read().count() == staged_total)),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# pass@k estimation
# ---------------------------------------------------------------------------

_PASS_KS = (1, 3, 5)


def _pass_at_k_sql() -> str:
    # unbiased estimator: 1 - prod_{i=0..k-1} (n-c-i)/(n-i), exact on
    # integers (tasks with n < k are excluded, the standard rule)
    branches = []
    for k in _PASS_KS:
        prod = " * ".join(
            f"(CAST(n - c - {i} AS DOUBLE) / (n - {i}))" for i in range(k)
        )
        branches.append(
            f"""
  SELECT {k} AS k, count(*) AS n_tasks,
         {round6_sql(f'sum(1.0 - ({prod})) / count(*)')} AS pass_at_k_r
  FROM tasks WHERE n >= {k}"""
        )
    return f"""
WITH tasks AS (
  SELECT user_id, count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
  FROM events GROUP BY user_id
)
{" UNION ALL ".join(branches)}
"""


@register("ml_pass_at_k", sql=_pass_at_k_sql())
def ml_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbiased pass@k estimator (Chen et al., HumanEval):
    per task with n samples and c successes,
    pass@k = 1 − C(n−c,k)/C(n,k) = 1 − Π(n−c−i)/(n−i), averaged over
    tasks with n ≥ k — the LLM-eval statistic computed exactly from
    integer counts (here: users as tasks, purchases as successes, the
    same estimator shape an eval harness runs over model samples).

    Scale: one groupBy(task) for (n, c); each k is a single aggregate
    over the task table with the product unrolled as an exact integer-
    ratio expression — no factorials, no overflow."""
    ev = load_table(spark, sf_dir, "events")
    tasks = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c"),
    ).localCheckpoint(eager=True)
    out = None
    for k in _PASS_KS:
        prod = None
        for i in range(k):
            term = (F.col("n") - F.col("c") - i).cast("double") / (F.col("n") - i)
            prod = term if prod is None else prod * term
        row = (
            tasks.filter(F.col("n") >= k)
            .agg(
                F.lit(k).alias("k"),
                F.count(F.lit(1)).alias("n_tasks"),
                round6(F.sum(1.0 - prod) / F.count(F.lit(1))).alias("pass_at_k_r"),
            )
        )
        out = row if out is None else out.union(row)
    return out


# ---------------------------------------------------------------------------
# UTF-8 byte fertility by language
# ---------------------------------------------------------------------------

_FERT_SQL = f"""
SELECT lang,
       count(*) AS n_docs,
       sum(length(text)) AS chars,
       sum(strlen(text)) AS bytes,
       {round6_sql('CAST(sum(strlen(text)) AS DOUBLE) / sum(length(text))')}
         AS bytes_per_char_r
FROM documents GROUP BY lang
"""


@register("ns_utf8_fertility", sql=_FERT_SQL)
def ns_utf8_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 byte fertility by language: bytes per character over each
    language's text — the budget statistic byte-level tokenizers
    (BPE-on-bytes) pay for multi-byte scripts (zh ≈ 3 bytes/char vs
    ASCII 1.0), which decides per-language sequence-length budgets and
    storage sizing. A ratio of exact integer totals, so bit-stable.

    Scale: one scan, one groupBy(lang); length/octet_length are
    JVM-side expressions."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.octet_length("text")).alias("bytes"),
        round6(
            F.sum(F.octet_length("text")).cast("double") / F.sum(F.length("text"))
        ).alias("bytes_per_char_r"),
    )
