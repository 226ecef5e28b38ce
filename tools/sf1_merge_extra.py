"""Grade a few extra queries at sf1 and merge them into an existing
CORRECTNESS_sf1.json (used when new queries land after a long sweep —
re-running the full ~230-query sweep for 4 names wastes hours).

Usage: python tools/sf1_merge_extra.py name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1data")
OUT = os.path.join(os.path.dirname(SF1), "CORRECTNESS_sf1.json")


def main() -> None:
    names = sys.argv[1:]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("sf1-merge-extra")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import importlib

    entry = importlib.import_module("__spark_entry__")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    from tests.oracle_harness import compare, duckdb_con

    con = duckdb_con(SF1)
    doc = json.load(open(OUT))
    if os.path.exists(OUT + ".inc"):  # recover a crashed/killed run
        doc["queries"].update(json.load(open(OUT + ".inc")))
    names = [n for n in names if n not in doc["queries"]]  # resume
    for qi, name in enumerate(names):
        if qi and qi % 20 == 0:
            # a long-lived DuckDB connection accumulates buffers across
            # hundreds of oracle runs and eventually OOMs the whole
            # process (r08: 163 queries poisoned past one OOM) —
            # recycle it periodically
            con.close()
            con = duckdb_con(SF1)
        try:
            df = queries[name](spark, SF1)
            sql = oracles.get(name)
            problems = compare(df, con, sql)
            rows = (
                con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
                if not problems
                else None
            )
            doc["queries"][name] = {
                "status": "OK" if not problems else "MISMATCH: " + " | ".join(problems),
                "spark_rows": rows,
            }
        except Exception:
            doc["queries"][name] = {
                "status": "ERR: " + traceback.format_exc().splitlines()[-1],
                "spark_rows": None,
            }
        print(name, doc["queries"][name], flush=True)
        with open(OUT + ".inc", "w") as f:  # incremental checkpoint
            json.dump(doc["queries"], f)
        spark.catalog.clearCache()
    res = doc["queries"]
    doc["summary"] = {
        "queries": len(res),
        "ok": sum(v["status"] == "OK" for v in res.values()),
        "vacuous_zero_rows": sorted(k for k, v in res.items() if v["spark_rows"] == 0),
        "not_ok": sorted(k for k, v in res.items() if v["status"] != "OK"),
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["summary"]))
    spark.stop()


if __name__ == "__main__":
    main()
