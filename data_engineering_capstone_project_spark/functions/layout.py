"""Data-layout clustering keys.

Morton (Z-order) interleaving — the clustering key behind
multi-dimensional data skipping (Delta/Iceberg ``OPTIMIZE ZORDER BY``):
interleave the bits of two bounded bucket ids so that rows close in
EITHER dimension land close in the one-dimensional sort order, giving
files whose min/max zone maps stay narrow on BOTH columns at once.

Expressed as pure integer arithmetic (``(x div 2^i) mod 2``) rather
than engine bit-intrinsics, so the exact same formula runs on Spark
(Catalyst, whole-stage codegen) and in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_interleave(a: Column, b: Column, bits: int = 4) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1 —
    a 2·bits-bit Z-order code. Callers must pre-bucket inputs into
    [0, 2^bits); values outside simply alias (their high bits are
    ignored), which is fine for a clustering key but documented so a
    zone-map audit buckets FIRST."""
    code = F.lit(0)
    for i in range(bits):
        abit = F.floor(a / F.lit(2**i)) % F.lit(2)
        bbit = F.floor(b / F.lit(2**i)) % F.lit(2)
        code = code + abit * F.lit(2 ** (2 * i)) + bbit * F.lit(2 ** (2 * i + 1))
    return code.cast("bigint")


def morton_interleave_sql(a: str, b: str, bits: int = 4) -> str:
    """The identical formula as ANSI SQL text for the DuckDB oracle
    (``//`` floor-division on non-negative ints == F.floor(x / 2^i))."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} // {2**i}) % 2) * {2 ** (2 * i)}")
        terms.append(f"(({b} // {2**i}) % 2) * {2 ** (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
