"""Z-order (Morton) interleave as a pure column expression — the
clustering key behind multi-dimensional file skipping (Delta's
OPTIMIZE ZORDER BY / Iceberg's sort-order z-curves).

Range-clustering a table on ONE key gives file-level min/max pruning on
that key only; any predicate on a second key scans everything. Writing
files clustered by the z-value of (a, b) bounds EVERY file's extent in
BOTH dimensions (a z-curve segment spans a bounded rectangle), so a
2-D box predicate prunes on both columns from the same one-column
manifest stats the lakehouse already keeps.

The interleave is the classic shift-or-mask bit spread — five bitwise
ops per operand, all JVM-side inside whole-stage codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# masks that spread a 16-bit value across 32 bits (0b01 pattern)
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(x: Column) -> Column:
    """Spread the low 16 bits of ``x`` so bit i lands at position 2i."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder2(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints, ``a``'s bits at odd
    positions, ``b``'s at even — callers pre-scale values into
    [0, 2**bits). ``bits`` <= 16 (32-bit z-value, exact in a long)."""
    if not 1 <= bits <= 16:
        raise ValueError("zorder2 supports 1..16 bits per dimension")
    am = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    bm = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    return F.shiftleft(_spread16(am), 1).bitwiseOR(_spread16(bm))


def _scale_exact(x: Column, lo: int, hi: int, n: int) -> Column:
    """floor((x - lo) * n / (hi - lo)) with EXACT integer arithmetic.

    Spark's ``/`` is double division, whose 53-bit mantissa misplaces
    rows near bucket edges once (x - lo) * n needs > 2^53 — i.e. key
    spans above ~2^37 for 16-bit buckets. Instead compute in
    decimal(38,0): subtract the remainder (pmod) so the numerator is an
    exact multiple of the span, making the quotient an exact integer —
    correct for any key span a long can hold.
    """
    span = max(hi - lo, 1)
    qn = (x.cast("decimal(38,0)") - F.lit(lo)) * F.lit(n)
    return ((qn - F.pmod(qn, F.lit(span))) / F.lit(span)).cast("long")


def zorder2_scaled(
    a: Column, a_lo: int, a_hi: int, b: Column, b_lo: int, b_hi: int, bits: int = 16
) -> Column:
    """zorder2 over raw key ranges: affine-scale each key into
    [0, 2**bits) via exact decimal integer division (see
    ``_scale_exact`` — no double rounding, any long key span)."""
    n = (1 << bits) - 1
    sa = _scale_exact(a, a_lo, a_hi, n)
    sb = _scale_exact(b, b_lo, b_hi, n)
    return zorder2(sa, sb, bits)


def zorder2_py(a: int, b: int, bits: int = 16) -> int:
    """Driver-side twin (tests + split-point planning)."""
    z = 0
    for i in range(bits):
        z |= ((b >> i) & 1) << (2 * i)
        z |= ((a >> i) & 1) << (2 * i + 1)
    return z
