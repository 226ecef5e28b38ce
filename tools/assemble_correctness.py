"""Assemble the committed correctness artifacts from driver_sim runs.

Usage:
  python tools/assemble_correctness.py full OUT.json sf001.json sf01.json
  python tools/assemble_correctness.py sf1 OUT.json sf1_raw.json counts.json

driver_sim prints a JSON object followed by a human trailer; raw_decode
strips it. The "full" form records both SF sweeps plus a summary; the
"sf1" form merges per-query Spark row counts (the non-vacuousness
proof) into each entry.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    dec = json.JSONDecoder()
    obj, _ = dec.raw_decode(open(path).read())
    return obj


def main() -> None:
    mode, out = sys.argv[1], sys.argv[2]
    if mode == "full":
        a, b = _load(sys.argv[3]), _load(sys.argv[4])
        doc = {
            "sf0.01": a,
            "sf0.1": b,
            "summary": {
                "queries": len(a),
                "sf0.01_ok": sum(v == "OK" for v in a.values()),
                "sf0.1_ok": sum(v == "OK" for v in b.values()),
                "rows_only": sum(
                    v.startswith("rows_only") for v in a.values()
                ),
                "mismatch_or_err": sorted(
                    k
                    for d in (a, b)
                    for k, v in d.items()
                    if v != "OK" and not v.startswith("rows_only")
                ),
            },
        }
    else:
        res, counts = _load(sys.argv[3]), json.load(open(sys.argv[4]))
        doc = {
            "sf_dir": ".sf1data (tools/gen_sf1.py, seed 4242)",
            "queries": {
                k: {"status": v, "spark_rows": counts.get(k)}
                for k, v in sorted(res.items())
            },
            "summary": {
                "queries": len(res),
                "ok": sum(v == "OK" for v in res.values()),
                "vacuous_zero_rows": sorted(
                    k for k, c in counts.items() if c == 0
                ),
            },
        }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(out, doc["summary"])


if __name__ == "__main__":
    main()
