"""Surrogate-key generation (SURVEY.md §2.9 D6).

The reference's ``gen_uuid`` UDF (data_preparation.py:87) is
non-deterministic: every recompute of the plan (retry, cache eviction,
second action) yields different ids -- a real correctness bug once a
table is read twice. Default here is a deterministic key: sha2 over the
concatenated business key, stable across retries, executors, and runs,
and computable without any shuffle or driver coordination at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "\x1f"  # ASCII unit separator; keeps ("a","bc") != ("ab","c")
_NULL = "\x00"  # encodes NULL distinctly from empty string


def surrogate_key(*cols: Column) -> Column:
    """Deterministic 64-hex-char key from the business key columns.

    NULL components are encoded distinctly from empty strings so the key
    is total."""
    parts = [F.coalesce(c.cast("string"), F.lit(_NULL)) for c in cols]
    return F.sha2(F.concat_ws(_SEP, *parts), 256)


def random_uuid() -> Column:
    """Bug-for-bug twin of the reference's gen_uuid (uuid4 string).
    Materialize-once only: write the column to storage before any second
    read, or ids will differ between reads."""
    return F.expr("uuid()")
