"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
tables and compares: row count, column names, and order-insensitive
values (floats rounded to 6 decimals — matches the registry convention
that both dialects already round, so residual diffs indicate a real
mismatch).
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return 0.0 if r == 0 else r  # -0.0 → 0.0
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (bytearray, memoryview)):
        return bytes(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])

    def sort_key(row):
        return tuple((v is None, "" if v is None else str(v)) for v in row)

    s_norm = sorted((tuple(_norm(r[i]) for i in order) for r in spark_rows), key=sort_key)
    d_norm = sorted((tuple(_norm(r[i]) for i in dorder) for r in duck_rows), key=sort_key)
    if s_norm != d_norm:
        # hoist the membership sets OUT of the comprehensions: inside
        # the `if` they were rebuilt per row — a 150k-row mismatch spun
        # for 40+ minutes (found when the sf10 sweep hit its first
        # value diff) instead of milliseconds
        d_set = set(map(tuple, d_norm))
        s_set = set(map(tuple, s_norm))
        only_s = [r for r in s_norm if r not in d_set][:3]
        only_d = [r for r in d_norm if r not in s_set][:3]
        problems.append(f"values differ; spark-only sample={only_s} duck-only sample={only_d}")
    return problems
