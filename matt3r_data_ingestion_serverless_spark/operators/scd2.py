"""Slowly-changing-dimension Type 2 apply: version dimension rows on
attribute change, keeping full history with validity intervals.

The reference's gold layer overwrites daily event documents in place
(infer_stationary_states.py:108-124 re-merges and rewrites the day
file); an SCD2 apply is the lakehouse-native generalization: instead of
losing the previous value, close it out and append the new version.

Scale: one shuffle join of dimension × update batch on the business
key. Update batches are typically ≪ dimension (daily deltas), so the
join broadcasts; history growth is append-only — no rewrite of
untouched rows at 100 TB (pair with a partition-scoped MERGE sink,
operators/merge.py, for the physical write).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_date: str | Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to a current-state dimension, emitting SCD2
    history rows: unchanged rows stay open; changed rows get a closed-out
    old version plus an open new version; brand-new keys insert open.

    `dim` must carry `valid_from` (existing history load) and the attr
    columns; `updates` carries the key + new attr values.
    """
    eff = F.lit(effective_date) if isinstance(effective_date, str) else effective_date
    upd = updates.select(
        F.col(key), *[F.col(a).alias(f"__new_{a}") for a in attrs]
    ).withColumn("__eff", eff)

    # full-outer cannot broadcast (needs both unmatched sides) — it
    # shuffles on the business key; at 100 TB pair with bucketed dim
    # storage on `key` so only the delta side moves.
    joined = dim.join(upd, key, "full_outer")
    changed = F.coalesce(
        reduce_or([F.col(a).eqNullSafe(F.col(f"__new_{a}")) == F.lit(False) for a in attrs]),
        F.lit(False),
    ) & F.col("__eff").isNotNull() & F.col(valid_from).isNotNull()
    new_key = F.col(valid_from).isNull()  # insert: key only in updates

    base_cols = [c for c in dim.columns if c not in (valid_from, valid_to)]
    # old version: attrs as-is; closed out when changed
    old_version = joined.filter(~new_key).select(
        *base_cols,
        F.col(valid_from),
        F.when(changed, F.col("__eff")).otherwise(F.lit(OPEN_END)).alias(valid_to),
        (~changed).alias("is_current"),
    )
    # new version for changed + inserted keys
    new_version = joined.filter(changed | new_key).select(
        *[
            F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
            if c in attrs
            else F.col(c)
            for c in base_cols
        ],
        F.col("__eff").alias(valid_from),
        F.lit(OPEN_END).alias(valid_to),
        F.lit(True).alias("is_current"),
    )
    return old_version.unionByName(new_version)


def reduce_or(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out
