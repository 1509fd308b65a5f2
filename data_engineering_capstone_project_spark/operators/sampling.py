"""Deterministic sampling/splitting for training-data pipelines.

A 100 TB corpus can't store row-level split assignments, and RNG-based
sampling isn't reproducible across engines, retries, or re-reads. Both
operators here derive the decision from a HASH of the row's own id, so
the same row always lands on the same side — on any engine (md5 is
engine-portable, making the split oracle-checkable), after any
recompute, with no shuffle and no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from md5 of the id. Uses 8 hex
    chars (32 bits) so bucket probabilities are uniform to ~2e-8."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % buckets
    ).cast("int")


def deterministic_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    split_col: str = "split",
) -> DataFrame:
    """Append 'train'/'test' decided by hash bucket < train_pct. Pure
    projection: no shuffle, no RNG, stable under retry and across
    engines."""
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        split_col, F.when(b < train_pct, "train").otherwise("test")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling via sampleBy (Bernoulli per row; seeded so
    one Spark run is reproducible, but NOT portable across engines —
    use deterministic_split when the assignment itself must be stable).
    """
    return df.sampleBy(strata_col, fractions, seed)
