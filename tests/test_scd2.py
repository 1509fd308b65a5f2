"""SCD Type 2 lifecycle: version history, idempotency, new keys."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.scd import (
    scd2_apply,
    scd2_init,
)

KEYS = ["cust_id"]
ATTRS = ["city", "segment"]


def _snapshot(spark, rows):
    return spark.createDataFrame(
        rows, "cust_id long, city string, segment string, effective_date date"
    )


def _by_version(df):
    return {
        (r.cust_id, r.valid_from): (r.city, r.segment, r.valid_to, r.is_current)
        for r in df.collect()
    }


def test_scd2_lifecycle(spark):
    d1, d2, d3 = date(2024, 1, 1), date(2024, 2, 1), date(2024, 3, 1)
    dim = scd2_init(
        _snapshot(spark, [(1, "Oslo", "A", d1), (2, "Lima", "B", d1)]),
        KEYS, ATTRS,
    )

    # Batch 2: key 1 changes city, key 3 is new, key 2 unchanged.
    dim = scd2_apply(
        dim,
        _snapshot(spark, [(1, "Bergen", "A", d2), (2, "Lima", "B", d2),
                          (3, "Quito", "C", d2)]),
        KEYS, ATTRS,
    )
    got = _by_version(dim)
    assert got == {
        (1, d1): ("Oslo", "A", d2, False),     # closed out
        (1, d2): ("Bergen", "A", None, True),  # new open version
        (2, d1): ("Lima", "B", None, True),    # untouched (no new version)
        (3, d2): ("Quito", "C", None, True),   # new key
    }

    # Re-applying the identical snapshot is a no-op (idempotent).
    again = scd2_apply(
        dim,
        _snapshot(spark, [(1, "Bergen", "A", d2), (2, "Lima", "B", d2),
                          (3, "Quito", "C", d2)]),
        KEYS, ATTRS,
    )
    assert _by_version(again) == got

    # Batch 3: key 1 changes again -> three versions, one open.
    dim = scd2_apply(
        dim, _snapshot(spark, [(1, "Tromso", "A", d3)]), KEYS, ATTRS
    )
    v1 = sorted(
        (r.valid_from, r.valid_to, r.is_current)
        for r in dim.filter(F.col("cust_id") == 1).collect()
    )
    assert v1 == [(d1, d2, False), (d2, d3, False), (d3, None, True)]


def test_scd2_null_attr_transitions(spark):
    """NULL-safe change detection: NULL->value and value->NULL are
    changes; NULL->NULL is not."""
    d1, d2 = date(2024, 1, 1), date(2024, 2, 1)
    dim = scd2_init(
        _snapshot(spark, [(1, None, "A", d1), (2, None, "B", d1)]),
        KEYS, ATTRS,
    )
    dim = scd2_apply(
        dim,
        _snapshot(spark, [(1, "Oslo", "A", d2), (2, None, "B", d2)]),
        KEYS, ATTRS,
    )
    got = _by_version(dim)
    assert got[(1, d1)] == (None, "A", d2, False)
    assert got[(1, d2)] == ("Oslo", "A", None, True)
    assert got[(2, d1)] == (None, "B", None, True)  # NULL==NULL: no-op


def test_scd2_null_effective_date_still_processed(spark):
    """Side-presence detection must not key off data-column NULLness:
    an update row with a NULL effective date is still an update."""
    from datetime import date

    d1 = date(2024, 1, 1)
    dim = scd2_init(_snapshot(spark, [(1, "Oslo", "A", d1)]), KEYS, ATTRS)
    dim = scd2_apply(
        dim, _snapshot(spark, [(1, "Bergen", "A", None)]), KEYS, ATTRS
    )
    got = _by_version(dim)
    assert got[(1, d1)] == ("Oslo", "A", None, False)   # closed (to NULL)
    assert got[(1, None)] == ("Bergen", "A", None, True)  # new open version
