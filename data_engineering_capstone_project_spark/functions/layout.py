"""Oracle-side twin of the Z-order clustering key.

The ENGINE's Morton key builder is ``sources.writers.zorder_key``
(shiftleft/bitwiseOR Catalyst expression, used by
``write_zorder_clustered`` and the ``zorder_zone_map`` audit). This
module holds its ANSI-SQL twin for DuckDB oracles: the same bit
interleave written as plain integer arithmetic
(``(x div 2^i) mod 2``), because oracle SQL must be a literal string
the comparator can run unmodified. Equivalence between the two forms
— and against a canonical Python bitwise reference — is pinned for
the full input grid in tests/test_functions.py, so the audit's Spark
side and oracle side cannot drift apart silently.
"""

from __future__ import annotations


def morton_interleave_sql(a: str, b: str, bits: int = 4) -> str:
    """``zorder_key([a, b], bits)`` as ANSI SQL text: bit i of ``a``
    lands at position 2i, bit i of ``b`` at 2i+1 (zorder_key places
    column j's bit b at b·n+j — identical for n=2). Inputs must be
    pre-bucketed into [0, 2^bits); ``//`` floor-division on
    non-negative ints matches the shiftright exactly."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} // {2**i}) % 2) * {2 ** (2 * i)}")
        terms.append(f"(({b} // {2**i}) % 2) * {2 ** (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
