"""Skew-mitigation helpers for hot join keys.

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``, on by
default in this engine's session factory) handles most sort-merge skew
at runtime; ``salted_join`` is the explicit tool for the cases AQE
can't fix — a hash/broadcast-ineligible join where one key carries a
disproportionate share of a 100 TB fact (the classic "null key" or
"power user" hot spot).

Mechanics: the skewed side gets a deterministic salt in [0, salts)
hashed from disambiguating columns; the other side is replicated once
per salt value. The join key becomes (key, salt), so the hot key's
rows spread over ``salts`` reducers instead of one. Replication
multiplies the small side by ``salts`` — keep it the dimension side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salts: int, by: list[str]) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, salts) from hash(``by``).
    Deterministic (xxhash64, no RNG) so retries/recomputes agree."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in by]), F.lit(salts))
    )


def replicate_salts(df: DataFrame, salts: int) -> DataFrame:
    """Cross the frame with salt ids 0..salts-1 (row count × salts)."""
    return df.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salts - 1)))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    salt_by: list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``salts``
    partitions. ``salt_by`` are skewed-side columns that distinguish
    rows within a hot key (e.g. the fact's line number); ``other`` is
    replicated ``salts`` times. Result equals ``skewed.join(other, on,
    how)`` exactly, for how in inner/left — other join types would see
    the replicated rows (right/full: unmatched other-side rows appear
    once per salt; anti: semantics break entirely), so they are
    rejected."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "replication of the other side breaks right/full/semi/anti"
        )
    keys = [on] if isinstance(on, str) else list(on)
    s = with_salt(skewed, salts, by=salt_by)
    o = replicate_salts(other, salts)
    return s.join(o, keys + ["_salt"], how).drop("_salt")
