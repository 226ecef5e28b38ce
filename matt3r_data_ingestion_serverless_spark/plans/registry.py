"""Registry mapping query name → (spark_fn, oracle_sql | None).

spark_fn: Callable[[SparkSession, str], DataFrame]   (sf_dir second)
oracle_sql: equivalent DuckDB SQL over views named after the tables.

Rules enforced by convention here (driver compares by column NAME then
value hash):
- every computed column is aliased identically in both dialects;
- no raw timestamp outputs — epoch micros (bigint) or formatted strings;
- doubles rounded (round(x, 6)) in BOTH dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = (fn, sql.strip() if sql else None)
        return fn

    return deco


def all_queries() -> dict[str, tuple[SparkQuery, str | None]]:
    return dict(QUERIES)
