"""Standalone replica of the driver's correctness gate.

Builds a PLAIN SparkSession (none of session.py's confs — exactly like
the driver's verify harness) and runs every registered query at sf0.01
against its DuckDB oracle. Round 1 failed precisely because our queries
assumed builder-time confs; this script catches that class of bug.

Run: python tests/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    # Plain session: only master + memory, NO custom confs.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import importlib

    entry = importlib.import_module("__spark_entry__")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    from tests.oracle_harness import compare, duckdb_con

    con = duckdb_con(sf_dir)
    results: dict[str, str] = {}
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            sql = oracles.get(name)
            if sql is None:
                n = df.count()
                results[name] = f"rows_only:{n}"
                continue
            problems = compare(df, con, sql)
            results[name] = "OK" if not problems else "MISMATCH: " + " | ".join(problems)
        except Exception:
            results[name] = "ERR: " + traceback.format_exc().splitlines()[-1]
    bad = {k: v for k, v in results.items() if v != "OK" and not v.startswith("rows_only")}
    print(json.dumps(results, indent=1))
    print(f"\n{len(results) - len(bad)}/{len(results)} clean; {len(bad)} problems")
    for k, v in bad.items():
        print(f"  {k}: {v}")
    # smoke-check entry() too
    try:
        n = entry.entry(spark).count()
        print(f"entry(): {n} rows")
    except Exception:
        traceback.print_exc()
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
