"""Deterministic cross-engine hashing primitives for the dedup /
fingerprinting operators.

Everything here must produce BIT-IDENTICAL values in Spark and in the
DuckDB oracle, so the base hash is md5 (same algorithm everywhere):

    H(s) = int(md5(s)[:15 hex], 16)       — 60 bits, fits a signed long
    Spark:  conv(substr(md5(s),1,15),16,10)::long
    DuckDB: try_cast('0x' || substr(md5(s),1,15) AS BIGINT)

MinHash uses the classic affine family h_i(x) = (a_i·H(x)+b_i) mod P
with fixed odd multipliers — P = 2^61-1 keeps a_i·H < 2^63 overflow?
no: a_i ≤ 2·N_HASHES+1 (small), H < 2^60, so a_i·H < 2^66 — would
overflow; therefore H is first reduced mod P32 (2^31-1) and the affine
step stays well inside int64. Collision risk at 2^31 over ~10^2 tokens
per doc is negligible for LSH bucketing (verified pairs are re-checked
with exact Jaccard anyway).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1 (Mersenne)
N_MINHASHES = 16
SIMHASH_BITS = 32

MINHASH_A = [2 * i + 1 for i in range(N_MINHASHES)]
MINHASH_B = [i * i + 7 for i in range(N_MINHASHES)]


def md5_hash64(col: Column) -> Column:
    """60-bit integer hash of a string, identical across engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash64_sql(expr: str) -> str:
    return f"try_cast(concat('0x', substr(md5({expr}),1,15)) AS BIGINT)"


def minhash_signature(tokens: Column) -> Column:
    """Array of N_MINHASHES min-hashes over a token array (SURVEY §7.2
    M5: shingle→minhash). Pure higher-order functions — JVM-side."""
    def affine(a: int, b: int):
        # closure factory: PySpark introspects lambda arity, so default
        # args (lambda t, a=a) would mis-bind the higher-order function
        return lambda t: (F.lit(a) * (md5_hash64(t) % P31) + F.lit(b)) % P31

    sigs = [
        F.array_min(F.transform(tokens, affine(a, b)))
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    return F.array(*sigs)


def minhash_signature_sql(tokens_expr: str) -> str:
    parts = [
        f"list_min(list_transform({tokens_expr}, t -> ({a} * ({md5_hash64_sql('t')} % {P31}) + {b}) % {P31}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    return "[" + ", ".join(parts) + "]"


def token_hashes(tokens: Column) -> Column:
    """Hash each token ONCE; the simhash bit accumulators fold over this
    integer array (md5 is the expensive step — never re-hash per bit)."""
    return F.transform(tokens, md5_hash64)


def token_hashes_sql(tokens_expr: str) -> str:
    return f"list_transform({tokens_expr}, t -> {md5_hash64_sql('t')})"


def simhash_fingerprint(hashes: Column) -> Column:
    """SimHash over a pre-hashed token array: per-bit ±1 sums, then
    fingerprint = Σ 2^j·[sum_j > 0]."""
    def bit_sum(j: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(1 << j)) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    fp = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sum_j = F.aggregate(hashes, F.lit(0).cast("long"), bit_sum(j))
        fp = fp + F.when(sum_j > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return fp


def simhash_fingerprint_sql(hashes_expr: str) -> str:
    terms = []
    for j in range(SIMHASH_BITS):
        sum_j = (
            f"list_sum(list_transform({hashes_expr}, "
            f"h -> CASE WHEN (h & {1 << j}) != 0 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {sum_j} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
