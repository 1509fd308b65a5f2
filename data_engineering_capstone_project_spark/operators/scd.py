"""Slowly-Changing-Dimension Type 2 merge — versioned dimension rows
with (valid_from, valid_to, is_current) lineage.

The reference's star schema full-refreshes its dimensions (REPLACE
loads, dag_immigration.py:191-331), which silently loses history the
moment an attribute changes; SCD2 is the standard warehouse answer and
the missing piece between our row-level merge (writers.py
merge_upsert_partitioned) and a real dimension lifecycle.

Set-based, one logical pass: the change detection is a single equi-join
of the incoming snapshot against the OPEN versions on the business key
(one shuffle, partial-agg-friendly), and the output is a union of
 closed-out rows, new versions, and untouched rows. No windows, no
driver loops — at 100 TB the cost is one join on the key plus a
write of the (small) dimension table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_attr_differs(attr_cols: Sequence[str]) -> Column:
    """NULL-safe inequality across the tracked attributes."""
    cond = F.lit(False)
    for a in attr_cols:
        cond = cond | ~F.col(f"cur.{a}").eqNullSafe(F.col(f"upd.{a}"))
    return cond


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply a snapshot of ``updates`` (business key + attributes +
    effective date) to an SCD2 ``current`` table.

    * unchanged keys (all tracked attributes NULL-safe-equal): no-op —
      re-applying the same snapshot is IDEMPOTENT.
    * changed keys: the open version is closed (valid_to :=
      effective date, is_current := false) and a new open version is
      appended.
    * new keys: a new open version is appended.
    * historical (already-closed) rows pass through untouched.

    ``current`` may be empty but must carry the SCD columns; initialize
    with ``scd2_init``. Updates must contain at most one row per key
    (enforce upstream — last-write-wins dedup is a policy choice this
    operator refuses to guess)."""
    keys = list(key_cols)
    out_cols = [*keys, *attr_cols, valid_from, valid_to, is_current]

    # Explicit existence markers: detecting side-presence via a data
    # column's NULLness silently misclassifies rows whose valid_from /
    # effective date is legitimately NULL.
    open_cur = (
        current.filter(F.col(is_current))
        .withColumn("_cur_exists", F.lit(True))
        .alias("cur")
    )
    closed_hist = current.filter(~F.col(is_current)).select(*out_cols)
    upd = updates.withColumn("_upd_exists", F.lit(True)).alias("upd")

    joined = open_cur.join(upd, keys, "full_outer")
    has_upd = F.col("upd._upd_exists").isNotNull()
    has_cur = F.col("cur._cur_exists").isNotNull()
    differs = _any_attr_differs(attr_cols)

    # Open versions that survive as-is: no update, or update equal.
    untouched = joined.filter(
        has_cur & (~has_upd | ~differs)
    ).select(
        *keys,
        *[F.col(f"cur.{a}").alias(a) for a in attr_cols],
        F.col(f"cur.{valid_from}").alias(valid_from),
        F.col(f"cur.{valid_to}").alias(valid_to),
        F.col(f"cur.{is_current}").alias(is_current),
    )
    # Open versions closed out by a differing update.
    closed_now = joined.filter(has_cur & has_upd & differs).select(
        *keys,
        *[F.col(f"cur.{a}").alias(a) for a in attr_cols],
        F.col(f"cur.{valid_from}").alias(valid_from),
        F.col(f"upd.{effective_col}").alias(valid_to),
        F.lit(False).alias(is_current),
    )
    # New open versions: changed keys and brand-new keys.
    opened = joined.filter(has_upd & (~has_cur | differs)).select(
        *keys,
        *[F.col(f"upd.{a}").alias(a) for a in attr_cols],
        F.col(f"upd.{effective_col}").alias(valid_from),
        F.lit(None).cast(current.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(is_current),
    )
    return (
        closed_hist.unionByName(untouched)
        .unionByName(closed_now)
        .unionByName(opened)
    )


def scd2_init(
    snapshot: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Bootstrap an SCD2 table from a first snapshot: every row becomes
    an open version effective at its snapshot date."""
    eff_type = snapshot.schema[effective_col].dataType
    return snapshot.select(
        *key_cols,
        *attr_cols,
        F.col(effective_col).alias(valid_from),
        F.lit(None).cast(eff_type).alias(valid_to),
        F.lit(True).alias(is_current),
    )


def changelog_latest_state(
    log: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """CDC changelog compaction, read-side: materialize the LATEST
    live row per key from an append-only (key, seq, op, payload) log,
    dropping keys whose last operation is a delete — the consumer of
    every Kafka-compacted topic / Debezium stream, and the inverse of
    the write-side ``merge_upsert_partitioned``. Latest-wins is a
    per-key rank by sequence descending (ties undefined, as in any
    compaction engine — make ``seq_col`` unique per key upstream),
    which Spark compiles to WindowGroupLimit over exactly one key
    Exchange. Property-tested against a sequential Python reference in
    tests/test_property_round6c.py; driven end-to-end by the
    registered ``latest_state_compaction`` query."""
    from pyspark.sql.window import Window as W

    keys = list(key_cols)
    rk = F.row_number().over(
        W.partitionBy(*keys).orderBy(F.desc(seq_col))
    )
    return (
        log.withColumn("_rk", rk)
        .filter((F.col("_rk") == 1) & (F.col(op_col) != delete_op))
        .drop("_rk")
    )
