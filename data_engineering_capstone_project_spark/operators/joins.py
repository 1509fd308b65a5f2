"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join (SURVEY.md §2.4 notes the reference has neither;
they are part of this engine's extended surface).

Both are compositions of DataFrame primitives chosen for their shuffle
shape at scale, not row-at-a-time logic:

* ``asof_join`` — union + one hash shuffle on the key + partitioned
  sort + ``last(ignorenulls)`` running window. Cost is identical to a
  sort-merge join: each partition is scanned once carrying O(1) state
  (the most recent right-side row), so a 100 TB fact never triggers a
  per-row range probe or a quadratic block compare.
* ``range_join_bucketed`` — Spark plans a raw inequality join as a
  BroadcastNestedLoopJoin (O(n·m) compares). Bucketing the time axis
  turns it into an equi-join on (key, bucket) + an exact residual
  filter; with bucket width >= window width every left row lands in at
  most 2 buckets, so the join is a plain hash shuffle with ~2× fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    how: str = "left",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    of the same ``on`` key with ``right_time <= left_time`` (inclusive).

    ``how="left"`` keeps unmatched left rows with NULL values;
    ``how="inner"`` drops them. Both time columns must share one
    orderable type (use epoch ints for engine-portable outputs).

    Determinism: if several right rows share (key, time), pass
    ``right_tiebreak`` (the max wins) or pre-aggregate the right side —
    otherwise the winner is undefined, as in any as-of engine.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be left|inner, got {how!r}")

    rv = F.struct(*[F.col(c) for c in value_cols]).alias("_rv")
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r_al = right.select(
        F.col(on), F.col(right_time).alias("_t"), rv, tb.alias("_tb")
    )
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    l_al = left.select(F.col(on), F.col(left_time).alias("_t"), lrow)

    u = l_al.select(
        on,
        "_t",
        F.lit(None).cast(r_al.schema["_rv"].dataType).alias("_rv"),
        F.lit(None).cast(r_al.schema["_tb"].dataType).alias("_tb"),
        "_lrow",
        F.lit(1).alias("_side"),
    ).unionByName(
        r_al.select(
            on,
            "_t",
            "_rv",
            "_tb",
            F.lit(None).cast(l_al.schema["_lrow"].dataType).alias("_lrow"),
            F.lit(0).alias("_side"),
        )
    )
    # Right rows (_side=0) sort before left rows at equal time, making
    # the match inclusive; _tb orders equal-time right rows so last()
    # picks the max tiebreak.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
    # Re-emit the key from the TOP-LEVEL attribute the window
    # partitioned on (it equals _lrow.<on> for left rows), not from
    # the struct: a struct-field extraction is a new expression, so
    # Catalyst would forget the frame is already hash-partitioned by
    # the key and re-Exchange for any downstream window/agg clustered
    # on (key, ...). Keeping the attribute alive lets consumers like
    # attribution_linear's per-conversion count reuse this shuffle.
    keep = [
        F.col(on) if c == on else F.col(f"_lrow.{c}").alias(c)
        for c in left.columns
    ]
    out = filled.filter(F.col("_side") == 1).select(*keep, F.col("_asof"))
    if how == "inner":
        out = out.filter(F.col("_asof").isNotNull())
    for c in value_cols:
        out = out.withColumn(c, F.col(f"_asof.{c}"))
    return out.drop("_asof")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower: int,
    upper: int,
    bucket: int | None = None,
) -> DataFrame:
    """Inner-join right rows whose ``right_time`` lies in the interval
    ``(left_time + lower, left_time + upper]`` for the same ``on`` key.

    Time columns must be integers (epoch seconds/days). All non-key
    column names must be disjoint between the two sides (alias before
    calling — this is a join, not a lookup). ``bucket`` defaults to the
    window width; any value >= width keeps the fan-out at <= 2 buckets
    per left row.
    """
    if upper <= lower:
        raise ValueError("range_join_bucketed: need upper > lower")
    bucket = bucket or (upper - lower)
    lo_b = F.floor((F.col(left_time) + F.lit(lower)) / F.lit(bucket))
    hi_b = F.floor((F.col(left_time) + F.lit(upper)) / F.lit(bucket))
    l_b = left.withColumn(
        "_bkt", F.explode(F.sequence(lo_b.cast("long"), hi_b.cast("long")))
    )
    r_b = right.withColumn(
        "_bkt", F.floor(F.col(right_time) / F.lit(bucket)).cast("long")
    )
    return (
        l_b.join(r_b, [on, "_bkt"])
        .filter(
            (F.col(right_time) > F.col(left_time) + F.lit(lower))
            & (F.col(right_time) <= F.col(left_time) + F.lit(upper))
        )
        .drop("_bkt")
    )
