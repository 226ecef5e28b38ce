"""Vector/embedding column functions for similarity search and
embedding-based near-dup detection (SURVEY §7.2 M5 north-star).

All pure Catalyst higher-order functions (zip_with/aggregate — JVM-side,
whole-stage-codegen'd); each has an exact DuckDB twin for the oracle.

Embeddings arrive as ``array<float>``; every function casts to double
FIRST so Spark and DuckDB accumulate in the same precision. Summation is
a left-to-right fold in both engines, and all comparisons downstream
round to 6 decimals, so residual last-ulp drift cannot flip a result.

Scale stance (100 TB): dot/norm are per-row O(d) map-side work — no
shuffle. The quadratic part of similarity search is handled by the
callers (LSH bucketing / broadcast query sets), not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SRP_BAND_BITS = 8  # sign-random-projection band width
SRP_BANDS = 4  # bands 0..3 → uses the first 32 dims as hyperplanes


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def _dot_expr_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right fold of elementwise products.

    Pass SQL-string column references where possible: the Column-lambda
    builder costs ~0.05 s of py4j round-trips per plan construction
    (billed to every timed bench sample and to the driver at any scale);
    the parsed-string twin builds the identical expression in ~2 ms."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_expr_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"


def l2_norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(f"sqrt({_dot_expr_sql(a, a)})")
    return F.sqrt(dot(a, a))


def l2_norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(
    a: Column | str, b: Column | str, norm_a: Column, norm_b: Column
) -> Column:
    """Cosine from a precomputed-norm pair (norms are computed once per
    row before any pair join, never inside the join)."""
    return dot(a, b) / (norm_a * norm_b)


def srp_band_keys(vec: Column) -> Column:
    """Sign-random-projection LSH bucket keys: SRP_BANDS structs of
    (band, key) where key is the sign pattern of SRP_BAND_BITS
    consecutive dimensions (axis-aligned hyperplanes — deterministic and
    engine-portable; a seeded random rotation would be strictly better
    for adversarial inputs, same plumbing).

    Two vectors land in the same bucket of band b iff their signs agree
    on all 8 of that band's dims: P = (1 - theta/pi)^8 per band.
    """
    if isinstance(vec, str):
        parts = ", ".join(
            f"named_struct('band', {b}, 'key', concat_ws('', "
            f"transform(slice({vec}, {b * SRP_BAND_BITS + 1}, {SRP_BAND_BITS}), "
            f"x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END)))"
            for b in range(SRP_BANDS)
        )
        return F.expr(f"array({parts})")
    keys = []
    for b in range(SRP_BANDS):
        band = F.slice(vec, b * SRP_BAND_BITS + 1, SRP_BAND_BITS)
        bits = F.concat_ws(
            "",
            F.transform(band, lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0"))),
        )
        keys.append(F.struct(F.lit(b).alias("band"), bits.alias("key")))
    return F.array(*keys)


def srp_band_keys_sql(vec: str) -> str:
    parts = []
    for b in range(SRP_BANDS):
        band = f"list_slice({vec}, {b * SRP_BAND_BITS + 1}, {(b + 1) * SRP_BAND_BITS})"
        bits = f"array_to_string(list_transform({band}, x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
        parts.append(f"{{'band': {b}, 'key': {bits}}}")
    return "[" + ", ".join(parts) + "]"
