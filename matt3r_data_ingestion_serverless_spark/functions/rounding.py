"""Cross-engine-stable rounding (SCALE.md §7 determinism rules).

`round(x, 6)` is NOT portable for arbitrary doubles: Spark rounds the
shortest decimal repr of the double (BigDecimal.valueOf) while DuckDB
rounds the binary value, so the same IEEE double can round differently
within an ulp of .5 at the rounding digit (two sf0.1 divergences in
round 2 traced to exactly this). The fix is one explicit formula —
sign(x)·floor(|x|·1e6 + 0.5)/1e6 — evaluated identically by both
engines. Use it whenever the value being rounded is an arbitrary
quotient/fold of doubles; plain round() stays fine for values with
≤ round-digit decimal precision (e.g. cents/100).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round6(col: Column) -> Column:
    return F.signum(col) * F.floor(F.abs(col) * 1e6 + 0.5) / 1e6


def round6_sql(expr: str) -> str:
    return (
        f"sign({expr}) * floor(abs({expr}) * 1e6 + 0.5) / 1e6"
    )
