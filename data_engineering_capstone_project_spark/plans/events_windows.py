"""Event-time windowed aggregations over the ``events`` table -- the
batch twins of the streaming operators (SURVEY.md §2.11 extended
surface). The same logical shapes run under Structured Streaming in
``data_engineering_capstone_project_spark.streaming``; batch mode gives them a DuckDB oracle.

Portability notes baked into the oracles:
* Window starts are emitted as epoch-second bigints (raw TIMESTAMP
  output renders differently across engines).
* DuckDB ``epoch()`` is DOUBLE and ``CAST(DOUBLE AS BIGINT)`` *rounds*,
  so oracles always ``floor()`` first; Spark's timestamp->long cast
  truncates (floors) by construction.
* Value sums use the floor-based fixed-point trick (see
  plans.relational._fixed_sum) for order-independence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.plans.registry import events_table, query

_FIXED_SUM_SQL = "sum(CAST(floor(value * 10000) AS BIGINT)) / 10000.0"


def _fixed_sum(col, alias):
    return (F.sum(F.floor(col * 10000)) / F.lit(10000.0)).alias(alias)


@query(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
           event_type,
           count(*) AS events,
           {_FIXED_SUM_SQL} AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("events"), _fixed_sum(F.col("value"), "value_sum"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "events",
            "value_sum",
        )
    )


@query(
    "events_sliding_halfhour",
    oracle="""
    WITH expanded AS (
        SELECT CAST(floor(floor(epoch(ts) / 1800) * 1800) AS BIGINT) AS window_start, value
        FROM events
        UNION ALL
        SELECT CAST(floor(floor(epoch(ts) / 1800) * 1800 - 1800) AS BIGINT), value
        FROM events
    )
    SELECT window_start,
           count(*) AS events,
           sum(CAST(floor(value * 10000) AS BIGINT)) / 10000.0 AS value_sum
    FROM expanded
    GROUP BY 1
    """,
)
def events_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in two
    windows; Spark's window() generates exactly the two starts the
    oracle enumerates."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("events"), _fixed_sum(F.col("value"), "value_sum"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "events",
            "value_sum",
        )
    )


@query(
    "events_sessionization",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 600
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    tagged AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute-gap sessions per user (Spark ``session_window``; the
    oracle is the classic gaps-and-islands formulation). An event at
    exactly prev+600s starts a new session (window end is exclusive)."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
        )
    )


@query(
    "events_resampled_5min",
    oracle="""
    WITH b AS (
        SELECT CAST(floor(floor(min(epoch(ts)) / 300) * 300) AS BIGINT) AS lo,
               CAST(floor(floor(max(epoch(ts)) / 300) * 300) AS BIGINT) AS hi
        FROM events
    ),
    grid AS (SELECT unnest(generate_series(lo, hi, 300)) AS bucket_start FROM b),
    c AS (
        SELECT CAST(floor(floor(epoch(ts) / 300) * 300) AS BIGINT) AS bucket_start,
               count(*) AS events,
               sum(CAST(floor(value * 10000) AS BIGINT)) / 10000.0 AS value_sum
        FROM events GROUP BY 1
    )
    SELECT g.bucket_start,
           coalesce(c.events, 0) AS events,
           coalesce(c.value_sum, 0.0) AS value_sum
    FROM grid g LEFT JOIN c USING (bucket_start)
    """,
)
def events_resampled_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series RESAMPLE with gap fill: a dense 5-minute grid over
    the observed range, zero-filled where no events landed — the shape
    every downstream charting/feature pipeline needs and plain GROUP BY
    can't produce (it emits no row for an empty bucket).

    The grid is one sequence() over epoch-second longs exploded from a
    single row — O(range/step) rows generated computationally, no data
    shuffle to build it; the counts side is an ordinary partial+final
    agg and the gap-fill is a left join the optimizer broadcasts
    (the grid is small by construction at any corpus size, since it
    scales with the TIME RANGE, not the data volume)."""
    ev = events_table(spark, sf_dir)
    bucket = ((F.col("ts").cast("long") / 300).cast("long") * 300).alias(
        "bucket_start"
    )
    bounds = ev.select(bucket).agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(300))).alias("bucket_start")
    )
    counts = (
        ev.select(bucket, "value")
        .groupBy("bucket_start")
        .agg(F.count("*").alias("events"), _fixed_sum(F.col("value"), "value_sum"))
    )
    return grid.join(counts, "bucket_start", "left").select(
        "bucket_start",
        F.coalesce("events", F.lit(0)).alias("events"),
        F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
    )
