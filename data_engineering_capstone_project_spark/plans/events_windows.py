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
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from data_engineering_capstone_project_spark.plans.registry import (
    events_table,
    query,
    scoped_persist,
    table,
)

_FIXED_SUM_SQL = "sum(CAST(floor(value * 10000) AS BIGINT)) / 10000.0"
# Fixed-point partial WITHOUT the final divide — for oracles that
# merge the integer partials further (rollup_cascade_daily) before
# dividing once at the end.
_FIXED_SUM_FP_SQL = "sum(CAST(floor(value * 10000) AS BIGINT))"


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
    WHERE ts IS NOT NULL
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
        FROM events WHERE ts IS NOT NULL
        UNION ALL
        SELECT CAST(floor(floor(epoch(ts) / 1800) * 1800 - 1800) AS BIGINT), value
        FROM events WHERE ts IS NOT NULL
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
        FROM events WHERE ts IS NOT NULL
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
    "concurrent_sessions_by_hour",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 600
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE ts IS NOT NULL
    ),
    tagged AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    ),
    s AS (
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS s_ep,
               CAST(floor(epoch(max(ts))) AS BIGINT) AS e_ep
        FROM tagged GROUP BY user_id, session_id
    ),
    hours AS (
        SELECT user_id,
               unnest(generate_series(
                   CAST(floor(s_ep / 3600) * 3600 AS BIGINT), e_ep,
                   3600)) AS hour_start
        FROM s
    )
    SELECT hour_start,
           CAST(count(*) AS BIGINT) AS active_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM hours GROUP BY 1
    """,
)
def concurrent_sessions_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap JOIN against the hour calendar, the concurrency
    metric ("how many sessions were active during each hour") — the
    query class Spark has no native range-join for. The naive plan is
    an inequality join (sessions x hours ON s.start < h.end AND s.end
    >= h.start), which Spark executes as BroadcastNestedLoopJoin —
    every session tested against every hour. This plan replaces it
    with the BUCKETED-INTERVAL pattern: each session explodes map-side
    into exactly the hour buckets it covers (``sequence`` over epoch
    longs — the fan-out is bounded by session duration, itself bounded
    by the 10-minute-gap rule: a k-hour session emits k+1 rows), and
    the overlap join becomes a plain partial-aggregating groupBy on
    hour_start. ZERO inequality joins, zero nested loops; the same
    trick extends to big x big interval joins by bucketing BOTH sides
    and equi-joining on bucket.

    Sessions reuse the exact ``events_sessionization`` semantics
    (session_window, 10-min gap, end-exclusive) with [min ts, max ts]
    as the interval; the oracle is the gaps-and-islands twin plus a
    generate_series range join — DuckDB's IEJoin makes the naive form
    fine at oracle scale, which is precisely the cross-check: two
    different join algorithms, one answer."""
    ev = events_table(spark, sf_dir).where(F.col("ts").isNotNull())
    sess = (
        ev.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.min("ts").cast("long").alias("s_ep"),
            F.max("ts").cast("long").alias("e_ep"),
        )
    )
    hours = sess.select(
        "user_id",
        F.explode(
            F.sequence(
                F.expr("CAST(floor(s_ep / 3600) * 3600 AS BIGINT)"),
                F.col("e_ep"),
                F.lit(3600).cast("bigint"),
            )
        ).alias("hour_start"),
    )
    return hours.groupBy("hour_start").agg(
        F.count("*").alias("active_sessions"),
        F.count_distinct("user_id").alias("active_users"),
    )


# The dense gap-filled 5-minute grid, shared by events_resampled_5min
# and event_rate_anomalies (as CTE `resampled`).
_RESAMPLE_CTES = """b AS (
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
    ),
    resampled AS (
        SELECT g.bucket_start,
               coalesce(c.events, 0) AS events,
               coalesce(c.value_sum, 0.0) AS value_sum
        FROM grid g LEFT JOIN c USING (bucket_start)
    )"""


@query(
    "events_resampled_5min",
    oracle=f"""
    WITH {_RESAMPLE_CTES}
    SELECT bucket_start, events, value_sum FROM resampled
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


@query(
    "conversion_funnel",
    oracle="""
    WITH viewed AS (
        SELECT user_id, event_type, ts, event_id,
               min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                   OVER w AS first_view_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    flagged AS (
        SELECT user_id, event_type, first_view_us,
               min(CASE WHEN event_type = 'click'
                         AND first_view_us IS NOT NULL
                        THEN epoch_us(ts) END)
                   OVER w AS first_qclick_us
        FROM viewed
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS r_view,
               max(CASE WHEN event_type = 'click'
                         AND first_view_us IS NOT NULL THEN 1 ELSE 0 END) AS r_click,
               max(CASE WHEN event_type = 'purchase'
                         AND first_qclick_us IS NOT NULL
                        THEN 1 ELSE 0 END) AS r_purchase
        FROM flagged
        GROUP BY user_id
    )
    SELECT count(*) AS users_total,
           CAST(sum(r_view) AS BIGINT) AS users_view,
           CAST(sum(CASE WHEN r_view = 1 THEN r_click ELSE 0 END) AS BIGINT)
               AS users_view_click,
           CAST(sum(CASE WHEN r_view = 1 AND r_click = 1
                         THEN r_purchase ELSE 0 END) AS BIGINT)
               AS users_full_funnel,
           floor(sum(CASE WHEN r_view = 1 THEN r_click ELSE 0 END)
                 / nullif(sum(r_view), 0) * 10000) / 10000.0 AS click_rate,
           floor(sum(CASE WHEN r_view = 1 AND r_click = 1 THEN r_purchase ELSE 0 END)
                 / nullif(sum(CASE WHEN r_view = 1 THEN r_click ELSE 0 END), 0)
                 * 10000) / 10000.0 AS purchase_rate
    FROM per_user
    """,
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_over(events_table(spark, sf_dir))


def funnel_over(ev: DataFrame) -> DataFrame:
    """Ordered view -> click -> purchase funnel — the sequential state
    machine: a click counts only after a view, a purchase only after a
    view-preceded click. ONE shuffle: events are hash-partitioned by
    user_id once; the "first view so far" and "first QUALIFIED click
    so far" prefix minima are two in-partition window passes over the
    same sort (the second reads the first's output, so no min-click-
    vs-first-view comparison is needed and out-of-order clicks before
    the first view never disqualify a later real sequence), and the
    per-user collapse reuses the partitioning. The final 1-row rollup
    moves one partial aggregate per task."""
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    viewed = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.min(F.when(is_type("view"), us)).over(w).alias("first_view_us"),
    )
    flagged = viewed.select(
        "user_id",
        "event_type",
        "first_view_us",
        F.min(
            F.when(
                is_type("click") & F.col("first_view_us").isNotNull(), us
            )
        )
        .over(w)
        .alias("first_qclick_us"),
    )
    per_user = flagged.groupBy("user_id").agg(
        F.max(F.when(is_type("view"), 1).otherwise(0)).alias("r_view"),
        F.max(
            F.when(
                is_type("click") & F.col("first_view_us").isNotNull(), 1
            ).otherwise(0)
        ).alias("r_click"),
        F.max(
            F.when(
                is_type("purchase") & F.col("first_qclick_us").isNotNull(), 1
            ).otherwise(0)
        ).alias("r_purchase"),
    )
    clicked = F.sum(F.when(F.col("r_view") == 1, F.col("r_click")).otherwise(0))
    purchased = F.sum(
        F.when(
            (F.col("r_view") == 1) & (F.col("r_click") == 1), F.col("r_purchase")
        ).otherwise(0)
    )
    viewed = F.sum("r_view")
    floor4 = lambda c: F.floor(c * 10000) / F.lit(10000.0)  # noqa: E731
    return per_user.agg(
        F.count("*").alias("users_total"),
        viewed.alias("users_view"),
        clicked.alias("users_view_click"),
        purchased.alias("users_full_funnel"),
        floor4(clicked / F.nullif(viewed, F.lit(0))).alias("click_rate"),
        floor4(purchased / F.nullif(clicked, F.lit(0))).alias("purchase_rate"),
    )


@query(
    "time_weighted_avg",
    oracle="""
    WITH stepped AS (
        SELECT user_id,
               CAST(floor(value * 10000) AS BIGINT) AS value_fp,
               (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                - epoch_us(ts)) // 1000000 AS w_sec
        FROM events
    )
    SELECT user_id,
           sum(value_fp * w_sec) / (sum(w_sec) * 10000.0) AS twa_value,
           count(*) AS n_intervals
    FROM stepped
    WHERE w_sec IS NOT NULL
    GROUP BY user_id
    HAVING sum(w_sec) > 0
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return twa_over(events_table(spark, sf_dir))


def twa_over(ev: DataFrame) -> DataFrame:
    """Hypertable-style time-weighted average of ``value`` per user:
    last-observation-carried-forward, each reading weighted by how long
    it stayed current (lead(ts) - ts, second resolution). All
    arithmetic is exact int64 (fixed-point value x integer seconds;
    bounded ~1.5e14 << 2^53, so the final single division is the same
    double in any engine). ONE shuffle on user_id shared by the window
    and the aggregate; the last reading per user (unknown duration) is
    excluded by definition."""
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id",
        F.floor(F.col("value") * 10000).cast("bigint").alias("value_fp"),
        ((F.lead(us, 1).over(w) - us) / F.lit(1000000))
        .cast("bigint")
        .alias("w_sec"),
    )
    return (
        stepped.filter(F.col("w_sec").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value_fp") * F.col("w_sec")).alias("sum_vw"),
            F.sum("w_sec").alias("sum_w"),
            F.count("*").alias("n_intervals"),
        )
        .filter(F.col("sum_w") > 0)
        .select(
            "user_id",
            (F.col("sum_vw") / (F.col("sum_w") * F.lit(10000.0))).alias(
                "twa_value"
            ),
            "n_intervals",
        )
    )


@query(
    "kmv_distinct_users",
    oracle="""
    WITH h AS (
        SELECT DISTINCT event_type,
               (user_id * 2654435761) % 1000000007 AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    rk AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h ASC) AS r
        FROM h
    ),
    kept AS (
        SELECT event_type, max(h) AS kth, count(*) AS n
        FROM rk WHERE r <= 32 GROUP BY 1
    ),
    ex AS (
        SELECT event_type, count(DISTINCT user_id) AS users_exact
        FROM events GROUP BY 1
    )
    SELECT k.event_type, ex.users_exact,
           CAST(CASE WHEN k.n < 32 THEN k.n
                     ELSE CAST(31000000217 AS BIGINT) // k.kth
                END AS BIGINT) AS kmv_estimate,
           abs(CAST(CASE WHEN k.n < 32 THEN k.n
                         ELSE CAST(31000000217 AS BIGINT) // k.kth
                    END AS BIGINT) - ex.users_exact) * 100
               <= ex.users_exact * 25 AS within_25pct
    FROM kept k JOIN ex USING (event_type)
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002), the
    ENGINE-EXACT counterpart to ``approx_distinct_parts``'s HLL: keep
    the k=32 smallest values of a deterministic integer hash of
    user_id; the k-th smallest estimates the distinct count as
    (k-1)*M/kth (groups with < k hashes are exact by definition). HLL
    sketches are implementation-defined, so only their error is
    checkable; KMV built on the repo's Knuth multiplicative hash is
    bit-identical in any engine — the whole sketch, estimate and all,
    hash-matches the oracle. The estimate lands within 4% on this
    fixture (pinned loosely as within_25pct; k=32 gives ~18% expected
    relative error in general).

    Why a sketch at all: the k-min set is MERGEABLE — union two
    sketches and re-take the k smallest — so partial sketches combine
    across partitions, days, or streaming micro-batches without ever
    re-reading history (the additive-serving discipline, applied to
    distinct counting). Scale shape: one distinct agg over (type,
    hash) — partial map-side dedup collapses the Zipf head — then the
    per-type k-smallest runs as WindowGroupLimit (running top-k per
    partition, never a full sort); everything after is
    types-x-k-sized. Estimator arithmetic is pure int64 (31*M =
    3.1e10, far under the bound), floor-division in both engines."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    ev = events_table(spark, sf_dir)
    sk = kmv_sketch(ev, "event_type", "user_id")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("users_exact")
    )
    est = kmv_estimate()
    return (
        sk.join(exact, "event_type")
        .select(
            "event_type",
            "users_exact",
            est.alias("kmv_estimate"),
            (
                F.abs(est - F.col("users_exact")) * 100
                <= F.col("users_exact") * 25
            ).alias("within_25pct"),
        )
    )


@query(
    "kmv_merge_parity",
    oracle="""
    WITH h AS (
        SELECT DISTINCT event_type,
               (user_id * 2654435761) % 1000000007 AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    rk AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h ASC) AS r
        FROM h
    )
    SELECT event_type, max(h) AS kth, CAST(count(*) AS BIGINT) AS n,
           CAST(CASE WHEN count(*) < 32 THEN count(*)
                     ELSE CAST(31000000217 AS BIGINT) // max(h)
                END AS BIGINT) AS kmv_estimate
    FROM rk WHERE r <= 32 GROUP BY 1
    """,
)
def kmv_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV sketch's MERGE path, driver-verified: the events table
    is sliced 4 ways (user_id mod 4 — the same deterministic slicing
    the streamed parities use), a PARTIAL sketch (k-min hash rows) is
    built per (event_type, slice), and ``kmv_merge`` pools them back
    into one sketch per type. The oracle computes the DIRECT global
    sketch in one pass — so a green hash row proves merged ==
    one-shot bit-for-bit, which is the entire value proposition of a
    mergeable sketch (per-day/per-shard/per-batch sketches combine
    across time and space without re-reading history; HLL can't make
    this cross-engine claim because its sketch is
    implementation-defined). NULL user_ids fold into slice 3 — and
    are then dropped by the sketch's NULL-id filter, matching the
    oracle's WHERE.

    Scale shape: one corpus distinct over (type, slice, hash) with
    WindowGroupLimit per cell; everything downstream of the partials
    is (types x slices x k)-sized. Merging is itself expressible as
    the same two operators (distinct + windowed k-min), so it runs
    wherever the sketch does."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_partials,
    )

    ev = events_table(spark, sf_dir).withColumn(
        "slc", F.coalesce(F.pmod(F.col("user_id"), F.lit(4)), F.lit(3))
    )
    partials = kmv_partials(ev, "event_type", "slc", "user_id")
    merged = kmv_merge(partials, "event_type")
    return merged.select(
        "event_type", "kth", "n", kmv_estimate().alias("kmv_estimate")
    )


@query(
    "kmv_streamed_parity",
    oracle="""
    WITH h AS (
        SELECT DISTINCT event_type,
               (user_id * 2654435761) % 1000000007 AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    rk AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h ASC) AS r
        FROM h
    )
    SELECT event_type, max(h) AS kth, CAST(count(*) AS BIGINT) AS n,
           CAST(CASE WHEN count(*) < 32 THEN count(*)
                     ELSE CAST(31000000217 AS BIGINT) // max(h)
                END AS BIGINT) AS kmv_estimate
    FROM rk WHERE r <= 32 GROUP BY 1
    """,
)
def kmv_streamed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIFTH maintained serving table, and the first with
    NON-ADDITIVE state: per-type distinct-user KMV sketches folded
    incrementally through ``apply_kmv_batch`` (k-min rows merge
    associatively where counters merge additively — the protocol
    extended to the sketch class), with the same 4-micro-batch +
    batch-1 crash-replay discipline as the other parities. The
    oracle computes the direct one-pass sketch from the raw events,
    so a green row proves the incrementally-maintained k-min set is
    BIT-IDENTICAL to the sketch a full recompute would build — the
    dashboard "distinct users, all time" metric served without ever
    re-reading history. Scale shape: per batch, one scan of the
    batch for its k-min rows; every merge unions two (types × k)
    frames; state stays sketch-sized forever."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_kmv_batch,
        kmv_serving_view,
    )

    serving = _parity_scratch_dir("decps_kmv_parity_serving")
    ev = events_table(spark, sf_dir)
    batch_of = F.coalesce(F.pmod(F.col("user_id"), F.lit(4)), F.lit(3))
    for i in range(4):
        batch = ev.filter(batch_of == i)
        applied = apply_kmv_batch(
            spark, batch, i, serving, group_col="event_type", id_col="user_id"
        )
        if applied is not True:
            raise RuntimeError(f"kmv batch {i} was not applied to fresh state")
        if i == 1:
            replayed = apply_kmv_batch(
                spark, batch, 1, serving,
                group_col="event_type", id_col="user_id",
            )
            if replayed is not False:
                raise RuntimeError("kmv batch-id guard failed to skip replay")
    return kmv_serving_view(spark, serving, "event_type")


@query(
    "kmv_intersection_users",
    oracle="""
    WITH h AS (
        SELECT DISTINCT event_type,
               (user_id * 2654435761) % 1000000007 AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    sets AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY h ASC) AS r
            FROM h
        ) WHERE r <= 32
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM (SELECT DISTINCT event_type FROM sets) a,
             (SELECT DISTINCT event_type FROM sets) b
        WHERE a.event_type < b.event_type
    ),
    pooled AS (
        SELECT type_a, type_b, h,
               max(in_a) AS in_a, max(in_b) AS in_b
        FROM (
            SELECT p.type_a, p.type_b, s.h, 1 AS in_a, 0 AS in_b
            FROM pairs p JOIN sets s ON s.event_type = p.type_a
            UNION ALL
            SELECT p.type_a, p.type_b, s.h, 0 AS in_a, 1 AS in_b
            FROM pairs p JOIN sets s ON s.event_type = p.type_b
        ) GROUP BY 1, 2, 3
    ),
    kmin AS (
        SELECT * FROM (
            SELECT type_a, type_b, h, in_a, in_b,
                   row_number() OVER (PARTITION BY type_a, type_b
                                      ORDER BY h ASC) AS r
            FROM pooled
        ) WHERE r <= 32
    ),
    est AS (
        SELECT type_a, type_b,
               CAST(count(*) AS BIGINT) AS n_u,
               CAST(sum(in_a * in_b) AS BIGINT) AS overlap,
               CAST(CASE WHEN count(*) < 32 THEN count(*)
                         ELSE CAST(31000000217 AS BIGINT) // max(h)
                    END AS BIGINT) AS union_est
        FROM kmin GROUP BY 1, 2
    ),
    ut AS (
        SELECT DISTINCT user_id, event_type FROM events
        WHERE user_id IS NOT NULL
    ),
    ex AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS both_exact
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT est.type_a, est.type_b, est.n_u, est.overlap,
           est.union_est,
           CAST(est.overlap * est.union_est // est.n_u AS BIGINT)
               AS inter_est,
           COALESCE(ex.both_exact, 0) AS both_exact
    FROM est LEFT JOIN ex
      ON ex.type_a = est.type_a AND ex.type_b = est.type_b
    """,
)
def kmv_intersection_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA (Beyer et al., SIGMOD 2007) — the
    mergeable counterpart to ``audience_overlap_matrix``: estimate
    "users who do X AND Y" for every event-type pair from the
    per-type k-min sketches ALONE. The exact matrix self-joins a
    corpus-sized distinct (user, type) frame; the sketch version
    touches the corpus once to build types×k=32 hash sets, then every
    pairwise estimate is arithmetic on that aggregate-sized state —
    at 100 TB the difference between a recurring shuffle of all
    distinct users and a lookup in persisted sketch state (the same
    sketches `kmv_streamed_parity` maintains incrementally, so the
    overlap matrix can be served without EVER re-reading history).

    Estimator: union-merge each pair's sets, re-take the k smallest
    (exact by the `kmv_merge` guarantee); `overlap` = hashes of that
    k-min union present in both sets; Jaccard ≈ overlap/n_u;
    |A∩B| ≈ overlap·U/n_u with U the union's KMV estimate. When
    n_u < k the sets are complete and overlap is exact. All int64
    floor-division, bit-identical in any engine. ``both_exact`` (the
    validation column, computed the exact way) stays in the output so
    the driver hash pins estimator AND ground truth; accuracy itself
    is pinned in tests/test_sketches_property.py."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        kmv_min_set,
        kmv_pair_intersection,
    )

    ev = events_table(spark, sf_dir)
    sets = kmv_min_set(ev, "event_type", "user_id")
    est = kmv_pair_intersection(sets, "event_type")
    ut = (
        ev.filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type")
        .distinct()
    )
    ex = (
        ut.select("user_id", F.col("event_type").alias("type_a"))
        .join(ut.select("user_id", F.col("event_type").alias("type_b")), "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("both_exact"))
    )
    return est.join(ex, ["type_a", "type_b"], "left").select(
        "type_a",
        "type_b",
        "n_u",
        "overlap",
        "union_est",
        "inter_est",
        F.coalesce(F.col("both_exact"), F.lit(0))
        .cast("bigint")
        .alias("both_exact"),
    )


_CMS_HP_SQL = """hp(r, a, b) AS (
        VALUES (0, CAST(2654435761 AS BIGINT), CAST(1 AS BIGINT)),
               (1, CAST(2246822519 AS BIGINT), CAST(3 AS BIGINT)),
               (2, CAST(3266489917 AS BIGINT), CAST(7 AS BIGINT)),
               (3, CAST(668265263 AS BIGINT), CAST(31 AS BIGINT))
    )"""


@query(
    "cms_user_event_counts",
    oracle=f"""
    WITH {_CMS_HP_SQL},
    cells AS (
        SELECT hp.r AS r,
               ((e.user_id * hp.a + hp.b) % 1000000007) % 256 AS b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events e, hp WHERE e.user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS exact_events
        FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ),
    top AS (
        SELECT user_id, exact_events FROM (
            SELECT user_id, exact_events,
                   row_number() OVER (ORDER BY exact_events DESC,
                                      user_id ASC) AS rk
            FROM exact
        ) WHERE rk <= 10
    )
    SELECT t.user_id, t.exact_events,
           CAST(min(c.cnt) AS BIGINT) AS cms_estimate,
           min(c.cnt) >= t.exact_events AS overestimates
    FROM top t
    JOIN hp ON TRUE
    JOIN cells c
      ON c.r = hp.r
     AND c.b = ((t.user_id * hp.a + hp.b) % 1000000007) % 256
    GROUP BY 1, 2
    """,
)
def cms_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) point queries,
    the frequency counterpart to the KMV distinct sketch: per-user
    event counts estimated from a d=4 x w=256 grid of additive
    counters. Like KMV (and unlike HLL/approx_percentile), the sketch
    is built from deterministic integer hashes, so state AND estimates
    are bit-identical in any engine — the oracle rebuilds the same
    grid in SQL and hash-matches. The report takes the top-10 users by
    EXACT count (the standard heavy-hitter evaluation frame — ground
    truth next to estimate) and pins the one hard CMS guarantee as a
    column: ``overestimates`` (a cell holds the key's count plus
    non-negative collision mass, so est >= exact always; a single
    false would flip the oracle hash).

    Scale shape: ONE corpus scan fanning each event map-side into its
    4 (row, bucket) cells, partial-agg groupBy to a <=1024-row grid;
    the lookup joins a broadcast grid to a 10-row frame. At 100 TB the
    grid is still 1024 rows — that is the entire point; widen w for
    tighter error (eps ~ e/w of total mass)."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        cms_cells,
        cms_lookup,
    )

    ev = events_table(spark, sf_dir).where(F.col("user_id").isNotNull())
    cells = cms_cells(ev, "user_id")
    # orderBy().limit() executes as TakeOrderedAndProject — a
    # distributed per-partition top-k plus a 10-row driver merge —
    # never a single-partition global window over all users.
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_events"))
        .orderBy(F.desc("exact_events"), F.asc("user_id"))
        .limit(10)
    )
    return cms_lookup(cells, top, "user_id").select(
        "user_id",
        "exact_events",
        F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        (F.col("cms_estimate") >= F.col("exact_events")).alias("overestimates"),
    )


@query(
    "cms_streamed_parity",
    oracle=f"""
    WITH {_CMS_HP_SQL}
    SELECT hp.r AS r,
           CAST(((e.user_id * hp.a + hp.b) % 1000000007) % 256 AS INTEGER)
               AS b,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events e, hp WHERE e.user_id IS NOT NULL
    GROUP BY 1, 2
    """,
)
def cms_streamed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SIXTH maintained serving table: the Count-Min grid folded
    incrementally through the standard ``apply_additive_batch``
    stage+publish protocol (4 deterministic micro-batches + the
    batch-1 crash-replay the batch-id guard must no-op). CMS cells are
    plain ADDITIVE counters, so — unlike KMV, which needed the
    protocol extended with a k-min re-take — the sketch drops into the
    existing additive merge with ZERO new machinery: ``inc_fn`` is
    just ``cms_cells`` over the batch. The oracle computes the
    one-pass grid from raw events, so a green row proves the
    incrementally-maintained sketch is BIT-IDENTICAL to a full
    recompute — "top-user frequencies, all time" served without
    re-reading history, in 1024 rows of state forever. A doubled cell
    from a failed replay guard flips the hash.

    Scale shape: per batch, one scan of the BATCH (map-side x4
    fan-out, partial agg); every merge full-outer-joins two <=1024-row
    grids. State size is O(d x w), independent of volume and of how
    the stream was sliced."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        cms_cells,
    )

    serving = _run_streamed_parity(
        spark,
        sf_dir,
        "decps_cms_parity_serving",
        inc_fn=lambda b: cms_cells(b, "user_id"),
        keys=["r", "b"],
        sum_cols=["cnt"],
    )
    return (
        spark.read.parquet(serving)
        .select("r", F.col("b").cast("int").alias("b"), "cnt")
    )


@query(
    "ab_test_report",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    base AS (
        SELECT u.user_id,
               ((u.user_id * 2654435761) % 1000000007) % 2 AS variant,
               COALESCE(pu.x, 0) AS x
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN pu USING (user_id)
    ),
    s AS (
        SELECT
            CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
            CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS s1_a,
            CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS s1_b,
            CAST(sum(CASE WHEN variant = 0 THEN x * x ELSE 0 END) AS BIGINT) AS s2_a,
            CAST(sum(CASE WHEN variant = 1 THEN x * x ELSE 0 END) AS BIGINT) AS s2_b
        FROM base
    )
    SELECT n_a, n_b,
           floor(s1_a / n_a) / 10000.0 AS mean_a,
           floor(s1_b / n_b) / 10000.0 AS mean_b,
           floor(
               ((s1_a / n_a - s1_b / n_b) * (s1_a / n_a - s1_b / n_b))
               / ((s2_a - s1_a / n_a * s1_a) / (n_a - 1) / n_a
                  + (s2_b - s1_b / n_b * s1_b) / (n_b - 1) / n_b)
               * 1000000) / 1000000.0 AS welch_t2
    FROM s
    """,
)
def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split 50/50 by a deterministic
    hash of user_id (the same leak-free assignment discipline as
    train_val_test_split — a user's variant never changes as data
    arrives), metric = per-user total purchase value, compared with a
    Welch t-squared statistic. Everything upstream of the final
    statistic is EXACT int64 (fixed-point per-user sums, their
    squares, conditional count/sum/sum-of-squares), so both engines
    feed identical integers into the identical double expression and
    the floor-truncated t2 hash-matches — the engine-exactness recipe
    applied to inferential statistics. Scale shape: one groupBy(user)
    over purchases, one distinct-user pass, then conditional
    aggregation to a SINGLE row — two corpus Exchanges total, output
    O(1). The statistic is computed fully distributed from streaming-
    friendly additive moments (n, sum, sum-of-squares per arm), the
    same additive-state shape the serving tables maintain.

    Overflow bound: the largest intermediate is a single x*x term
    (x = per-user fixed-point purchase total), which exceeds int64 at
    x ~ 3.03e9 — i.e. one user totalling ~$303k at 1e-4 precision;
    the s2 sums then need the per-arm aggregate under 9.2e18. Past
    that, coarsen the fixed point (1e-2 buys 100x headroom) or widen
    the moments to DECIMAL. ANSI mode fails loudly, never silently."""
    ev = events_table(spark, sf_dir)
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 10000).cast("bigint")).alias("x")
        )
    )
    base = (
        ev.select("user_id")
        .distinct()
        .join(pu, "user_id", "left")
        .select(
            # Mix through the Knuth modulus BEFORE reducing mod 2:
            # (id * odd) % 2 collapses to id parity (the multiplier is
            # odd), which any parity-structured id scheme — including
            # this repo's own user_id % 4 micro-batch split — would be
            # perfectly correlated with. The intermediate % M breaks
            # that correlation, same recipe as the KMV hash.
            F.pmod(
                F.pmod(F.col("user_id") * F.lit(2654435761), F.lit(1000000007)),
                F.lit(2),
            ).alias("variant"),
            F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        )
    )
    v = F.col("variant")
    s = base.agg(
        F.sum(F.when(v == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(v == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(v == 0, F.col("x")).otherwise(0)).alias("s1_a"),
        F.sum(F.when(v == 1, F.col("x")).otherwise(0)).alias("s1_b"),
        F.sum(F.when(v == 0, F.col("x") * F.col("x")).otherwise(0)).alias(
            "s2_a"
        ),
        F.sum(F.when(v == 1, F.col("x") * F.col("x")).otherwise(0)).alias(
            "s2_b"
        ),
    )
    ma, mb = F.col("s1_a") / F.col("n_a"), F.col("s1_b") / F.col("n_b")
    var_term = (
        (F.col("s2_a") - ma * F.col("s1_a")) / (F.col("n_a") - 1) / F.col("n_a")
        + (F.col("s2_b") - mb * F.col("s1_b")) / (F.col("n_b") - 1) / F.col("n_b")
    )
    t2 = F.floor((ma - mb) * (ma - mb) / var_term * 1000000) / F.lit(
        1000000.0
    )
    return s.select(
        "n_a",
        "n_b",
        (F.floor(ma) / F.lit(10000.0)).alias("mean_a"),
        (F.floor(mb) / F.lit(10000.0)).alias("mean_b"),
        t2.alias("welch_t2"),
    )


@query(
    "srm_check",
    oracle="""
    WITH v AS (
        SELECT ((user_id * 2654435761) % 1000000007) % 2 AS variant
        FROM (SELECT DISTINCT user_id FROM events)
        WHERE user_id IS NOT NULL
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
        FROM v
    )
    SELECT n_a, n_b,
           ((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b))
               / 1000000.0 AS chi2,
           (n_a - n_b) * (n_a - n_b) * 100000 >= 384146 * (n_a + n_b)
               AS srm_flag
    FROM s
    """,
)
def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit for the A/B split — the guardrail
    every experimentation platform runs BEFORE reading a treatment
    effect: if the 50/50 assignment didn't land 50/50, the experiment
    is corrupted (logging loss, bot filtering, assignment bug) and
    ``ab_test_report``'s statistic is meaningless. Uses the EXACT
    assignment expression ab_test_report uses (mixed Knuth hash mod
    2), so this audits the assignment actually in use, not a copy.
    Chi-square for two cells at p=0.5 reduces to (n_a-n_b)^2/(n_a+n_b)
    — computed in pure int64 with a fixed-point floor, and the
    p<0.05 flag compares (n_a-n_b)^2 * 1e5 against 3.84146 * total
    scaled to integers: both engines evaluate identical integer
    predicates, no libm, no doubles until display. Scale shape: one
    distinct-user pass, then O(1); overflow needs (n_a-n_b)^2 * 1e6
    past int64 — a 3e6-user IMBALANCE — far beyond any sane SRM."""
    ev = events_table(spark, sf_dir)
    v = (
        ev.select("user_id")
        .where(F.col("user_id").isNotNull())
        .distinct()
        .select(
            F.pmod(
                F.pmod(F.col("user_id") * F.lit(2654435761), F.lit(1000000007)),
                F.lit(2),
            ).alias("variant")
        )
    )
    s = v.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    tot = F.col("n_a") + F.col("n_b")
    return s.select(
        "n_a",
        "n_b",
        (F.expr("(n_a - n_b) * (n_a - n_b) * 1000000 div (n_a + n_b)") / F.lit(1000000.0)).alias("chi2"),
        (d * d * F.lit(100000) >= F.lit(384146) * tot).alias("srm_flag"),
    )


@query(
    "events_distinct_users",
    oracle="""
    SELECT event_type,
           count(*) AS events,
           count(DISTINCT user_id) AS users,
           count(DISTINCT CAST(ts AS DATE)) AS active_days
    FROM events
    GROUP BY event_type
    """,
)
def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact COUNT(DISTINCT) in one aggregate: Catalyst
    rewrites this to an Expand (one row replica per distinct column)
    + two-phase aggregate — a single pass over events, no join of
    separate per-distinct subqueries, and partial aggregation still
    applies to the plain count. The cardinality-heavy alternative at
    100 TB is approx_count_distinct (see approx_distinct_parts); this
    is the exact tier."""
    ev = events_table(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("events"),
        F.count_distinct(F.col("user_id")).alias("users"),
        F.count_distinct(F.col("ts").cast("date")).alias("active_days"),
    )


@query(
    "views_converted_10min",
    oracle="""
    SELECT a.user_id,
           a.event_id AS view_id,
           epoch_us(a.ts) AS view_us,
           epoch_us(b.ts) AS purchase_us,
           floor(b.value * 10000) / 10000.0 AS purchase_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    """,
)
def views_converted_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (``streaming.events.views_purchase_interval_join`` — the SAME
    transform, watermarks no-op in batch): views matched to same-user
    purchases within 10 minutes after. This registry entry gives the
    interval-join operator a DuckDB value oracle on top of its
    streaming parity test. The equi-key (user_id) makes it a hash
    join with the interval as a join-time residual — never a
    BroadcastNestedLoop."""
    from data_engineering_capstone_project_spark.streaming.events import (
        views_purchase_interval_join,
    )

    ev = events_table(spark, sf_dir)
    joined = views_purchase_interval_join(ev, within="10 minutes")
    return joined.select(
        "user_id",
        "view_id",
        F.unix_micros(F.col("view_ts")).alias("view_us"),
        F.unix_micros(F.col("purchase_ts")).alias("purchase_us"),
        (F.floor(F.col("purchase_value") * 10000) / F.lit(10000.0)).alias(
            "purchase_value"
        ),
    )


@query(
    "trending_event_types",
    oracle="""
    WITH expanded AS (
        SELECT CAST(floor(floor(epoch(ts) / 900) * 900 - 900 * g.j) AS BIGINT)
                   AS window_start,
               event_type
        FROM events, unnest(generate_series(0, 3)) g(j)
        WHERE ts IS NOT NULL
    ),
    counted AS (
        SELECT window_start, event_type, count(*) AS events
        FROM expanded
        GROUP BY 1, 2
    )
    SELECT window_start, event_type, events, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT window_start, event_type, events,
               row_number() OVER (PARTITION BY window_start
                                  ORDER BY events DESC, event_type ASC) AS rnk
        FROM counted
    )
    WHERE rnk <= 3
    """,
)
def trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: top-3 event types per 1-hour window sliding
    every 15 minutes — the dashboard "what's hot right now" shape.
    Each event expands map-side into its 4 covering windows (Spark's
    window() generates exactly the starts the oracle enumerates); ONE
    Exchange carries ((window, type), partial count) — the rank then
    runs over the aggregated per-window type counts (bounded by
    #types, not by events) and the rank<=3 plans as WindowGroupLimit,
    so each partition retains a running top-3 instead of sorting its
    windows' full type lists. At 100 TB the shuffle payload is the
    aggregated (window x type) grid regardless of event volume."""
    ev = events_table(spark, sf_dir)
    counted = (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("events"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "events",
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("events"),
            # nulls_last: Spark asc() sorts NULL FIRST, ANSI/DuckDB default
            # is NULLS LAST — a NULL event_type flipped the tie rank (r8
            # adversarial-events audit)
            F.asc_nulls_last("event_type")
        )
    )
    return counted.withColumn("rnk", rnk).filter(F.col("rnk") <= 3)


@query(
    "trending_streamed_parity",
    oracle="""
    WITH expanded AS (
        SELECT CAST(floor(floor(epoch(ts) / 900) * 900 - 900 * g.j) AS BIGINT)
                   AS window_start,
               event_type
        FROM events, unnest(generate_series(0, 3)) g(j)
        WHERE ts IS NOT NULL
    ),
    counted AS (
        SELECT window_start, event_type, count(*) AS events
        FROM expanded
        GROUP BY 1, 2
    )
    SELECT window_start, event_type, events, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT window_start, event_type, events,
               row_number() OVER (PARTITION BY window_start
                                  ORDER BY events DESC, event_type ASC) AS rnk
        FROM counted
    )
    WHERE rnk <= 3
    """,
)
def trending_streamed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING-MAINTAINED trending top-3, driver-verified: the
    events table is split into 4 deterministic micro-batches (user_id
    mod 4), each folded into a fresh serving table through the real
    ``apply_additive_batch`` merge protocol (stage + atomic
    publish_swap per batch), WITH a deliberate crash-replay of batch 1
    in the middle — the batch-id guard must no-op it, or the replayed
    counts double and the oracle hash catches it. The returned frame
    is ``trending_topk_view`` over the final maintained state; the
    oracle is the BATCH ``trending_event_types`` SQL, so a green row
    proves the additive-merge streaming path converges exactly to the
    batch answer (merge-additive state, rank at read time).

    Scale shape: each micro-batch merge is a full-outer join of two
    aggregate-sized (window x type) grids — O(windows x types),
    independent of event volume — and the maintained table is read
    once at the end. The per-call serving dir is rebuilt from empty
    (rmtree first), so the verification replays the full protocol
    every time instead of trusting leftover state."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        trending_increment,
        trending_topk_view,
    )

    serving = _run_streamed_parity(
        spark,
        sf_dir,
        scratch_stem="decps_trending_parity_serving",
        inc_fn=trending_increment,
        keys=["window_start", "event_type"],
        sum_cols=["events"],
    )
    return trending_topk_view(spark, serving, k=3).select(
        "window_start", "event_type", "events", "rnk"
    )


import itertools as _itertools

_SCRATCH_SEQ = _itertools.count()


def _parity_scratch_dir(scratch_stem: str) -> str:
    """Fresh (pid, invocation)-keyed /tmp scratch dir for a parity run,
    registered for removal at interpreter exit: without the atexit
    hook, every bench/test/driver process left its serving dirs behind
    forever. The dir must survive until process exit — the returned
    DataFrames read it lazily, long after the parity protocol returns —
    so cleanup cannot be a try/finally around the fold loop.

    Keyed per INVOCATION, not just per pid (r12 advice fix): the old
    pid-only key meant a second same-process invocation rmtree'd and
    rewrote the exact path an earlier invocation's still-held lazy
    frame reads — a frame evaluated inside the rmtree->write window saw
    a missing/partial table. A fresh dir per call makes every returned
    plan's source immutable for the life of the process; the bounded
    cost (one scratch dir per parity invocation, all reaped at exit) is
    the price of plan immutability. The pid stays in the name so
    concurrent PROCESSES can never collide either."""
    import atexit
    import os
    import shutil

    serving = f"/tmp/{scratch_stem}_{os.getpid()}_{next(_SCRATCH_SEQ)}"
    shutil.rmtree(serving, ignore_errors=True)
    atexit.register(shutil.rmtree, serving, ignore_errors=True)
    return serving


def _run_streamed_parity(
    spark: SparkSession,
    sf_dir: str,
    scratch_stem: str,
    inc_fn,
    keys: list[str],
    sum_cols: list[str],
    source_df: DataFrame | None = None,
    batch_col=None,
) -> str:
    """THE shared streamed-parity protocol (one definition, so the
    trending and drift parities can never diverge on it): rebuild a
    pid-keyed scratch serving dir from empty (a concurrently-running
    second process — bench, tests, driver — must never merge into this
    process's state), fold 4 deterministic micro-batches (user_id mod
    4) through the real ``apply_additive_batch`` stage+publish merge,
    and crash-replay batch 1 in the middle — the batch-id guard must
    no-op it. Outcomes are checked with explicit raises, NOT bare
    asserts: under ``python -O`` an assert's call expression is
    compiled out, which would silently skip the entire protocol.
    Returns the serving dir path for the caller's read-time view.

    By default the folded stream is the events table batched on
    user_id mod 4; pass ``source_df`` + ``batch_col`` to fold any
    other table through the identical protocol (the r10 OOV-drift
    parity folds the documents table's NEW split on doc_id mod 4)."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_additive_batch,
    )

    serving = _parity_scratch_dir(scratch_stem)
    ev = source_df if source_df is not None else events_table(spark, sf_dir)
    batch_of = (
        F.coalesce(batch_col, F.lit(3))
        if batch_col is not None
        else F.coalesce(F.pmod(F.col("user_id"), F.lit(4)), F.lit(3))
    )
    kw = dict(inc_fn=inc_fn, keys=keys, sum_cols=sum_cols)
    for i in range(4):
        batch = ev.filter(batch_of == i)
        applied = apply_additive_batch(spark, batch, i, serving, **kw)
        if applied is not True:
            raise RuntimeError(f"batch {i} was not applied to fresh state")
        if i == 1:
            # crash-replay of an already-applied batch id: must no-op.
            replayed = apply_additive_batch(spark, batch, 1, serving, **kw)
            if replayed is not False:
                raise RuntimeError("batch-id guard failed to skip replay")
    return serving


@query(
    "trending_engine_streamed_parity",
    oracle="""
    WITH expanded AS (
        SELECT CAST(floor(floor(epoch(ts) / 900) * 900 - 900 * g.j) AS BIGINT)
                   AS window_start,
               event_type
        FROM events, unnest(generate_series(0, 3)) g(j)
        WHERE ts IS NOT NULL
    ),
    counted AS (
        SELECT window_start, event_type, count(*) AS events
        FROM expanded
        GROUP BY 1, 2
    )
    SELECT window_start, event_type, events, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT window_start, event_type, events,
               row_number() OVER (PARTITION BY window_start
                                  ORDER BY events DESC, event_type ASC) AS rnk
        FROM counted
    )
    WHERE rnk <= 3
    """,
)
def trending_engine_streamed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trending serving table maintained by the REAL Structured
    Streaming engine — closing the one gap the hand-loop parities
    (``trending_streamed_parity`` etc.) left open: those fold
    micro-batches by calling ``apply_additive_batch`` directly, while
    production wires that function into a ``foreachBatch`` query. Here
    the events table is staged as 4 parquet files, read back through
    ``spark.readStream`` with ``maxFilesPerTrigger=1`` (so the engine
    delivers 4 genuine micro-batches with engine-assigned batch ids,
    checkpointed offsets, availableNow termination), and drained by
    ``maintain_trending_counts`` — the exact production entry point.
    Then the WHOLE JOB IS REPLAYED against a fresh checkpoint: the
    engine re-delivers every batch from offset zero, and the serving
    table's batch-id guard must no-op all of them — the
    at-least-once-to-exactly-once discipline exercised through the
    engine's own redelivery machinery, not a hand-crafted replay. A
    doubled count from a failed guard flips the oracle hash.

    The oracle is the BATCH ``trending_event_types`` SQL: additive
    state converges to the batch answer regardless of how the engine
    happened to slice the files into batches, which is precisely the
    property that makes the serving design replay-safe. Scale shape:
    identical to the production path — each micro-batch merge joins
    two aggregate-sized (window x type) grids; the stream is scanned
    once per batch."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        maintain_trending_counts,
        trending_topk_view,
    )

    stage = _parity_scratch_dir("decps_trending_engine_stage")
    serving = _parity_scratch_dir("decps_trending_engine_serving")
    ev = events_table(spark, sf_dir)
    # 4 files -> 4 micro-batches under maxFilesPerTrigger=1. Batch
    # COMPOSITION is scheduler-dependent and deliberately does not
    # matter: additive merge converges to the same state under any
    # slicing (that is the claim being verified).
    ev.repartition(4).write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    maintain_trending_counts(stream, serving, f"{stage}/_chk_first")
    # Full-job replay with a FRESH checkpoint: the engine re-delivers
    # batches 0..3; every one must hit the guard and no-op.
    maintain_trending_counts(stream, serving, f"{stage}/_chk_replay")
    from pathlib import Path

    from data_engineering_capstone_project_spark.streaming.serving import (
        applied_watermark,
    )

    # One micro-batch per staged part file (maxFilesPerTrigger=1).
    # Derived, not hard-coded at 4: an EMPTY events table repartitions
    # into fewer part files, and the parity must still hold — batch
    # ids are 0..n-1, so the watermark after both runs is n-1 (None
    # only if the stage produced no files at all).
    n_files = len(list(Path(stage).glob("part-*")))
    applied = applied_watermark(spark, serving)
    expected = n_files - 1 if n_files else None
    if applied != expected:
        raise RuntimeError(
            f"expected {n_files} engine micro-batches (max applied id "
            f"{expected}), got {applied}"
        )
    if applied is None:
        # No staged files -> no batches -> no serving dir to read.
        return spark.createDataFrame(
            [],
            "window_start bigint, event_type string, "
            "events bigint, rnk int",
        )
    return trending_topk_view(spark, serving, k=3).select(
        "window_start", "event_type", "events", "rnk"
    )


@query(
    "user_counts_streamed_parity",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           COALESCE(CAST(sum(CAST(floor(value * 10000) AS BIGINT))
                         AS BIGINT), 0) AS value_fp
    FROM events
    GROUP BY 1
    """,
)
def user_counts_streamed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORIGINAL serving table (per-user totals — the feature-store
    shape) through the same driver-verified streamed-parity protocol
    as trending/drift: 4 micro-batches + crash-replay via
    ``apply_additive_batch``, final state vs a from-scratch per-user
    aggregate oracle. With this, all three additive serving tables
    have a driver row exercising the real merge path every round."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        _user_counts_increment,
    )

    serving = _run_streamed_parity(
        spark,
        sf_dir,
        scratch_stem="decps_user_counts_parity_serving",
        inc_fn=_user_counts_increment,
        keys=["user_id"],
        sum_cols=["n_events", "value_fp"],
    )
    return spark.read.parquet(serving).select(
        "user_id", "n_events", "value_fp"
    )


@query(
    "drift_streamed_parity",
    oracle="""
    WITH e AS (
        SELECT floor(epoch_us(ts) / 86400000000) AS day,
               least(greatest(CAST(floor(value / 25) AS BIGINT), 0), 19)
                   AS bucket
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    g AS (SELECT day, bucket, count(*) AS n FROM e GROUP BY 1, 2),
    mx AS (SELECT max(day) AS latest FROM g),
    c AS (
        SELECT bucket,
               CAST(sum(CASE WHEN day < latest THEN n ELSE 0 END)
                   AS BIGINT) AS n_ref,
               CAST(sum(CASE WHEN day = latest THEN n ELSE 0 END)
                   AS BIGINT) AS n_cur
        FROM g, mx GROUP BY 1
    ),
    t AS (
        SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref,
               CAST(sum(n_cur) AS BIGINT) AS tot_cur
        FROM c
    )
    SELECT c.bucket, c.n_ref, c.n_cur,
           floor((c.n_ref / t.tot_ref - c.n_cur / t.tot_cur)
                 * (c.n_ref / t.tot_ref - c.n_cur / t.tot_cur)
                 / (c.n_ref / t.tot_ref + c.n_cur / t.tot_cur)
                 * 1000000000) / 1000000000.0 AS chi2
    FROM c, t
    """,
)
def drift_streamed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING-MAINTAINED drift report, driver-verified (the
    ``trending_streamed_parity`` protocol applied to the second
    serving table): 4 deterministic micro-batches fold into the
    (day, bucket) histogram grid through ``apply_additive_batch``
    (with the same deliberate batch-1 crash-replay the guard must
    no-op), then ``drift_view`` computes latest-day-vs-history
    chi-square terms from the maintained state via the shared
    ``chi2_report``/``drift_value_bucket`` helpers. The oracle
    recomputes the identical report from the raw events, so a green
    row proves the whole maintained path — bucket layout, additive
    merge, NULL-key hygiene, read-time split — converges exactly to
    the from-scratch answer. Scale shape: each merge joins two
    O(days x 20) grids; no event is ever re-read after its batch."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        drift_histogram_increment,
        drift_view,
    )

    serving = _run_streamed_parity(
        spark,
        sf_dir,
        scratch_stem="decps_drift_parity_serving",
        inc_fn=drift_histogram_increment,
        keys=["day", "bucket"],
        sum_cols=["n"],
    )
    return drift_view(spark, serving)


@query(
    "percentile_streamed_parity",
    oracle="""
    WITH h AS (
        SELECT user_id,
               CAST(least(63, greatest(0, floor(value * 4))) AS INTEGER)
                   AS bucket,
               count(*) AS n
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    c AS (
        SELECT user_id, bucket,
               sum(n) OVER (PARTITION BY user_id ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               sum(n) OVER (PARTITION BY user_id) AS tot
        FROM h
    )
    SELECT user_id, min(bucket) / 4.0 AS p95_value
    FROM c WHERE cum * 10000 >= tot * 9500
    GROUP BY user_id
    """,
)
def percentile_streamed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAST of the four additive serving tables (per-user value
    HISTOGRAMS — the mergeable percentile sketch) through the
    driver-verified streamed-parity protocol: 4 micro-batches +
    crash-replay via ``apply_additive_batch``, then
    ``user_percentile_view`` reads the bucket-resolution p95 from the
    maintained grid. The oracle recomputes the identical percentile
    from the raw events, so a green row proves the full maintained
    path — bucket clamping, NULL-value quarantine (NULL values occupy
    a NULL bucket in the grid but contribute no mass to the
    percentile), additive merge, cumulative read-time scan. With this
    row, user_counts / trending / drift / value_histograms are ALL
    re-verified through the real merge protocol every time they're
    sampled. Scale shape: each merge joins two O(users x 64) grids;
    the percentile window runs over <= 64 rows per user."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        user_percentile_view,
        value_histogram_increment,
    )

    serving = _run_streamed_parity(
        spark,
        sf_dir,
        scratch_stem="decps_percentile_parity_serving",
        inc_fn=value_histogram_increment,
        keys=["user_id", "bucket"],
        sum_cols=["n"],
    )
    return user_percentile_view(spark, serving, p=0.95)


@query(
    "user_daily_streaks",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d
        FROM events
    ),
    isl AS (
        SELECT user_id, d,
               d - row_number() OVER (PARTITION BY user_id ORDER BY d)
                   AS grp
        FROM act
    ),
    s AS (
        SELECT user_id, grp, count(*) AS len, min(d) AS start_d
        FROM isl GROUP BY 1, 2
    ),
    b AS (
        SELECT user_id, len, start_d,
               sum(len) OVER (PARTITION BY user_id) AS active_days,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, start_d ASC) AS rk
        FROM s
    )
    SELECT user_id,
           CAST(active_days AS BIGINT) AS active_days,
           CAST(len AS BIGINT) AS best_streak,
           CAST(start_d AS BIGINT) AS streak_start_day
    FROM b WHERE rk = 1
    """,
)
def user_daily_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern at day grain (engagement/retention's
    "current streak" metric; the sessionization twin where the gap
    unit is a calendar day, not an idle timeout). Island id is the
    classic ``day - row_number()`` constant-per-run trick; the
    longest island per user (ties broken to the earliest start) plus
    the user's total active-day count come out of one more
    window pass. Days are epoch arithmetic (epoch // 86400), portable
    across engines like the cohort query's week rule.

    Scale shape: one distinct on (user, day) is the only corpus-sized
    Exchange — everything after operates on the (users x active-days)
    frame, at least ~1000x smaller than raw events at day grain. Both
    user-partitioned windows and the (user, grp) aggregate reuse that
    frame's user partitioning; no further corpus pass exists."""
    ev = events_table(spark, sf_dir)
    act = ev.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / F.lit(86400)).alias("d"),
    ).distinct()
    return daily_streaks(act)


def daily_streaks(act: DataFrame) -> DataFrame:
    """Gaps-and-islands streak assembly over a DISTINCT (user_id, d)
    activity frame (property-tested against a sequential Python
    reference in tests/test_property_round6c.py)."""
    from pyspark.sql.window import Window as W

    isl = act.withColumn(
        "grp",
        F.col("d")
        - F.row_number().over(W.partitionBy("user_id").orderBy("d")),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count("*").alias("len"), F.min("d").alias("start_d")
    )
    best = (
        streaks.withColumn(
            "active_days", F.sum("len").over(W.partitionBy("user_id"))
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(
                    F.desc("len"), F.asc("start_d")
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return best.select(
        "user_id",
        F.col("active_days").cast("bigint").alias("active_days"),
        F.col("len").cast("bigint").alias("best_streak"),
        F.col("start_d").cast("bigint").alias("streak_start_day"),
    )


@query(
    "rollup_cascade_daily",
    oracle=f"""
    WITH h AS (
        SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT)
                   AS bucket_start,
               event_type, count(*) AS events, {_FIXED_SUM_FP_SQL} AS vs
        FROM events GROUP BY 1, 2
    ),
    d AS (
        SELECT CAST(floor(floor(epoch(ts)) / 86400) * 86400 AS BIGINT)
                   AS bucket_start,
               event_type, count(*) AS events, {_FIXED_SUM_FP_SQL} AS vs
        FROM events GROUP BY 1, 2
    )
    SELECT 'hour' AS grain, bucket_start, event_type,
           CAST(events AS BIGINT) AS events,
           vs / 10000.0 AS value_sum,
           floor(vs / events) / 10000.0 AS value_avg
    FROM h
    UNION ALL
    SELECT 'day', bucket_start, event_type, CAST(events AS BIGINT),
           vs / 10000.0, floor(vs / events) / 10000.0
    FROM d
    """,
)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading time-grain rollup (the hypertable "continuous
    aggregate" hierarchy): raw events are aggregated ONCE at minute
    grain, then each coarser grain — hour, day — re-aggregates the
    previous grain's output, never the raw table. Sums and counts
    merge exactly (sum of sums, count of counts); the average is
    derived from the merged (sum, count) pair at read time, which is
    WHY rollup state stores moments rather than averages. The oracle
    computes hour and day directly from raw events, so oracle
    equality proves the cascade's re-aggregation is exact — the whole
    point of the pattern. Buckets are epoch arithmetic
    (epoch // grain * grain), portable across engines; value sums use
    the house fixed-point rule, whose integer partials are precisely
    what makes the cascade order- and stage-independent.

    Scale shape: ONE corpus-sized Exchange (the minute grain, which
    Catalyst partial-aggregates map-side). The hour pass shuffles the
    minute table (~60x smaller than events at scale), the day pass
    the hour table (~3600x smaller) — geometrically collapsing work,
    vs. the naive form's two independent full scans of raw. At 100 TB
    this is the difference between maintaining dashboards from a
    61 GB minute table and re-reading 100 TB per grain."""
    ev = events_table(spark, sf_dir)
    ts_s = F.col("ts").cast("long")
    minute = ev.groupBy(
        (F.floor(ts_s / F.lit(60)) * 60).alias("b"), "event_type"
    ).agg(
        F.count("*").alias("events"),
        F.sum(F.floor(F.col("value") * 10000)).alias("vs"),
    )
    hour = minute.groupBy(
        (F.floor(F.col("b") / F.lit(3600)) * 3600).alias("b"), "event_type"
    ).agg(F.sum("events").alias("events"), F.sum("vs").alias("vs"))
    day = hour.groupBy(
        (F.floor(F.col("b") / F.lit(86400)) * 86400).alias("b"), "event_type"
    ).agg(F.sum("events").alias("events"), F.sum("vs").alias("vs"))

    def emit(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.col("b").cast("bigint").alias("bucket_start"),
            "event_type",
            F.col("events").cast("bigint").alias("events"),
            (F.col("vs") / F.lit(10000.0)).alias("value_sum"),
            (F.floor(F.col("vs") / F.col("events")) / F.lit(10000.0)).alias(
                "value_avg"
            ),
        )

    return emit(hour, "hour").unionByName(emit(day, "day"))


@query(
    "weekly_cohort_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS wk
        FROM events
    ),
    firstwk AS (
        SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id
    )
    SELECT f.cohort_wk,
           CAST(a.wk - f.cohort_wk AS BIGINT) AS age_weeks,
           CAST(count(*) AS BIGINT) AS users
    FROM act a JOIN firstwk f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week
    (the cohort), counted at each later week of activity (the age) —
    the canonical product-analytics shape ("of the users who arrived
    in week W, how many were still active N weeks later?"). Weeks are
    pure epoch arithmetic (epoch // 604800), portable across engines
    unlike date_trunc('week') whose week-start convention differs.
    Plan: one distinct on (user, week) — map-side partial distinct,
    the only corpus-sized Exchange — then cohort assignment via a
    min() window over the already-distinct per-user weeks (reuses the
    user partitioning, no fresh shuffle of raw events), then the
    bounded (cohort, age) aggregate. At 100 TB the state after the
    distinct is (users x active-weeks), far smaller than events."""
    from pyspark.sql.window import Window as W

    ev = events_table(spark, sf_dir)
    # user_id IS NOT NULL: an anonymous event has no cohort. Spark's
    # window partitionBy GROUPS null keys (so a NULL-user "cohort"
    # appeared) while the oracle's equi-join drops them — the SQL join
    # semantics are the contract (r8 adversarial-events audit).
    act = ev.filter(F.col("user_id").isNotNull()).select(
        "user_id",
        F.floor(F.col("ts").cast("long") / F.lit(604800)).alias("wk"),
    ).distinct()
    cohort = F.min("wk").over(W.partitionBy("user_id"))
    return (
        act.withColumn("cohort_wk", cohort)
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("age_weeks"))
        .agg(F.count("*").alias("users"))
    )


@query(
    "top_event_paths",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 600000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, ts, event_id, event_type,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    ),
    ranked AS (
        SELECT user_id, session_id, event_type,
               row_number() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts, event_id) AS rn
        FROM tagged
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= 3
        GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS sessions
    FROM paths
    GROUP BY path
    ORDER BY sessions DESC, path
    LIMIT 20
    """,
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths (first 3 event types per 10-minute-gap
    session) — sequence/path mining, the funnel-discovery complement to
    the fixed-order ``conversion_funnel``: instead of checking a KNOWN
    sequence, it surfaces which sequences actually happen. Ties at
    identical timestamps are broken by event_id so the path is a total
    order both engines reproduce, and the top-20 boundary breaks
    count-ties by path text for a deterministic result set.

    Scale shape: ONE corpus Exchange on user_id serves every stage —
    the gaps-and-islands session tag (lag + running sum), the per-
    session head-3 (sort+slice of a per-session collected array, never
    a corpus-wide rank), and the path aggregation keys on path strings
    whose cardinality is bounded by |event_type|^3; the final top-20 is
    a TakeOrdered over that bounded table, not a global sort of
    sessions. Session state never accumulates: a session's array holds
    at most its own events, and only the first 3 survive the slice."""
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap test in exact integer MICROseconds: ts has sub-second
    # precision, so a seconds-truncated cast would disagree with the
    # oracle's epoch_us whenever fractional parts straddle the 600s
    # boundary (session_window gets this right internally; the
    # tagged-events form must match it explicitly).
    is_new = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= 600_000_000
            ),
            1,
        )
        .otherwise(0)
    )
    tagged = ev.select(
        "user_id", "ts", "event_id", "event_type", is_new.alias("is_new")
    ).withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    path = F.concat_ws(
        ">",
        F.transform(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", "event_type")
                    )
                ),
                1,
                3,
            ),
            lambda s: s["event_type"],
        ),
    )
    paths = tagged.groupBy("user_id", "session_id").agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("sessions"))
        .orderBy(F.desc("sessions"), F.asc("path"))
        .limit(20)
    )


@query(
    "event_value_drift",
    oracle="""
    WITH b AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        FROM events
    ),
    e AS (
        SELECT CASE WHEN value IS NULL THEN NULL
                    ELSE least(greatest(CAST(floor(value / 25) AS BIGINT), 0),
                               19) END
                   AS bucket,
               CASE WHEN epoch_us(ts) <= (SELECT mid FROM b)
                    THEN 1 ELSE 0 END AS is_ref
        FROM events
    ),
    c AS (
        SELECT bucket,
               CAST(sum(is_ref) AS BIGINT) AS n_ref,
               CAST(sum(1 - is_ref) AS BIGINT) AS n_cur
        FROM e GROUP BY 1
    ),
    t AS (
        SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref,
               CAST(sum(n_cur) AS BIGINT) AS tot_cur
        FROM c
    )
    SELECT c.bucket, c.n_ref, c.n_cur,
           floor((c.n_ref / t.tot_ref - c.n_cur / t.tot_cur)
                 * (c.n_ref / t.tot_ref - c.n_cur / t.tot_cur)
                 / (c.n_ref / t.tot_ref + c.n_cur / t.tot_cur)
                 * 1000000000) / 1000000000.0 AS chi2
    FROM c, t
    """,
)
def event_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection over the event value stream — the
    monitoring gate a production pipeline runs before trusting a new
    data window (training-serving skew, upstream schema rot, bot
    bursts). The observed range splits at its midpoint into a
    reference and a current period; values histogram into 20 fixed
    bins and each bin contributes its chi-square-distance term
    (p-q)^2/(p+q) between the two periods' proportions. The canonical
    PSI multiplies by ln(p/q) — libm-dependent, so this uses the
    chi-square form whose arithmetic is engine-exact: proportions are
    exact int/int doubles and each bin's term is floor-truncated to
    fixed point BEFORE any cross-bin consumer sums it (per-bin rows
    are returned; the total is one trivial sum away).

    Scale shape: bounds = one min/max agg (scan-cheap, broadcast as a
    1-row literal join); counts = ONE corpus Exchange carrying at most
    20 x 2 partial sums per task; everything after runs on a 20-row
    frame. Period assignment is map-side arithmetic on epoch
    microseconds — integer, so both engines pick identical periods."""
    ev = events_table(spark, sf_dir)
    # Integer floor-division for the midpoint: a double (min+max)/2
    # would round once min+max epoch-micros exceeds 2^53 and could
    # disagree with the oracle's exact `//` by 1 µs — the same
    # at-scale-only divergence class as revenue_trend's moment
    # overflow.
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).select(F.expr("(lo + hi) div 2").alias("mid"))
    bucket = drift_value_bucket(F.col("value"))
    # The ~20-row counts frame is consumed twice (totals + output):
    # stage it, or the whole corpus aggregation subtree executes twice.
    counts = scoped_persist(
        ev.join(broadcast(bounds))
        .select(
            bucket.alias("bucket"),
            F.when(F.unix_micros("ts") <= F.col("mid"), 1)
            .otherwise(0)
            .alias("is_ref"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("n_cur"),
        ),
        "event_value_drift.counts",
    )
    return chi2_report(counts)


def drift_value_bucket(value):
    """THE 20-bin drift histogram bucket: floor(value / 25) clamped to
    [0, 19], NULL value -> NULL bucket. Shared by the batch
    ``event_value_drift`` query and the streaming
    ``drift_histogram_increment`` so the two reports can never
    desynchronize on bucket layout (a negative value buckets to 0 in
    BOTH paths; the oracle applies the same greatest/least clamp
    inside an explicit ``CASE WHEN value IS NULL THEN NULL`` guard,
    because DuckDB's least/greatest also IGNORE nulls and would fold
    a NULL value into bucket 0). The Spark-side ``when(isNotNull)``
    wrapper exists for the same reason — Spark's greatest/least SKIP
    nulls. NULL value -> NULL bucket in BOTH engines. Same
    single-definition discipline as ``chi2_report``."""
    clamped = F.least(
        F.lit(19),
        F.greatest(F.lit(0), F.floor(value / 25)).cast("long"),
    )
    return F.when(value.isNotNull(), clamped)


def chi2_report(counts: DataFrame) -> DataFrame:
    """Per-bucket fixed-point chi-square drift terms from a
    (bucket, n_ref, n_cur) counts frame — THE shared arithmetic behind
    the batch ``event_value_drift`` oracle and the streaming
    ``drift_view`` (one definition, so the two reports can never
    desynchronize). Proportions use ``try_divide``: an empty reference
    or current window (bootstrap state — only one period observed yet)
    yields chi2 NULL instead of DIVIDE_BY_ZERO under ANSI mode, which
    is exactly DuckDB's x/0 -> NULL semantics, so the oracle still
    hash-matches in the degenerate case. For rows where both
    proportions exist, p+q > 0 by construction (the bucket row exists
    only if it has mass), so the inner division is safe."""
    from pyspark.sql.functions import broadcast as _bc

    totals = counts.agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    p = F.try_divide(F.col("n_ref"), F.col("tot_ref"))
    q = F.try_divide(F.col("n_cur"), F.col("tot_cur"))
    chi2 = F.floor((p - q) * (p - q) / (p + q) * 1000000000) / F.lit(
        1000000000.0
    )
    return counts.join(_bc(totals)).select(
        "bucket", "n_ref", "n_cur", chi2.alias("chi2")
    )


@query(
    "event_rate_anomalies",
    oracle=f"""
    WITH {_RESAMPLE_CTES},
    w AS (
        SELECT bucket_start, events,
               CAST(count(*) OVER tw AS BIGINT) AS n,
               CAST(sum(events) OVER tw AS BIGINT) AS s1,
               CAST(sum(events * events) OVER tw AS BIGINT) AS s2
        FROM resampled
        WINDOW tw AS (ORDER BY bucket_start
                      ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
    )
    SELECT bucket_start, events, s1 AS trailing_sum,
           (12 * events - s1) * (12 * events - s1)
               > 9 * (12 * s2 - s1 * s1) AS anomaly
    FROM w
    WHERE n = 12
    """,
)
def event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly detection on the event rate: a 5-minute
    bucket is anomalous when its count deviates more than 3 sigma from
    the trailing hour's (12 buckets') mean — the monitoring alarm on
    top of the resample grid. The 3-sigma test is algebraically
    rearranged into a PURE INTEGER comparison:

        (x - s1/12)^2 > 9 * (12*s2 - s1^2)/144
        <=>  (12x - s1)^2 > 9 * (12*s2 - s1^2)

    so there is no sqrt, no division, and nothing to round — the
    anomaly flag is bit-exact in any engine (sigma=0 windows flag any
    deviation, the right semantics for a dead-flat baseline). Buckets
    without a full trailing hour are excluded, so day-one output is
    empty rather than noisy.

    Scale shape: built ON the gap-filled grid (shared _RESAMPLE_CTES /
    the events_resampled_5min plan), whose size scales with the TIME
    RANGE, not event volume; the trailing window is a single ordered
    pass over that grid. The grid is one global time-ordered window —
    acceptable because the grid is range-sized; at multi-year ranges
    partition the window by coarse epoch and stitch boundaries, or run
    it streaming (the additive day-bucket machinery in
    streaming/serving.py maintains the same counts incrementally).
    Overflow: the largest intermediates are (12x - s1)^2 and
    9*(12*s2 - s1*s1) <= 1296*m^2 for per-bucket max m — int64-safe to
    ~8e7 events per 5-minute bucket (~2.5e8 on the x term); past that,
    widen the variance arithmetic to DECIMAL. ANSI mode fails loudly
    rather than silently below that bound."""
    base = events_resampled_5min(spark, sf_dir)
    tw = (
        Window.orderBy("bucket_start").rowsBetween(-12, -1)
    )
    w = base.select(
        "bucket_start",
        "events",
        F.count("*").over(tw).alias("n"),
        F.sum("events").over(tw).alias("s1"),
        F.sum(F.col("events") * F.col("events")).over(tw).alias("s2"),
    )
    dev = 12 * F.col("events") - F.col("s1")
    return (
        w.filter(F.col("n") == 12)
        .select(
            "bucket_start",
            "events",
            F.col("s1").alias("trailing_sum"),
            (dev * dev > 9 * (12 * F.col("s2") - F.col("s1") * F.col("s1"))).alias(
                "anomaly"
            ),
        )
    )


@query(
    "event_value_mad_outliers",
    oracle="""
    WITH m AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    d AS (
        SELECT e.event_type, e.value, m.med
        FROM events e JOIN m USING (event_type)
        WHERE e.value IS NOT NULL
    ),
    md AS (
        SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        FROM d GROUP BY 1
    )
    SELECT d.event_type,
           floor(min(d.med) * 10000) / 10000.0 AS med,
           floor(min(md.mad) * 10000) / 10000.0 AS mad,
           CAST(sum(CASE WHEN abs(d.value - d.med) > 3 * 1.4826 * md.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM d JOIN md USING (event_type)
    GROUP BY 1
    """,
)
def event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median / MAD (median
    absolute deviation) instead of mean / stddev — the estimator a
    data-cleaning pass actually wants, because ONE corrupt reading
    shifts a mean arbitrarily but moves a median by at most one rank
    (z-score flagging breaks down exactly when outliers are present;
    ``segment_zscore_pandas`` is the non-robust twin). Flags values
    beyond 3 robust sigmas (MAD x 1.4826, the normal-consistency
    constant).

    Engine-exactness: Spark ``percentile`` and DuckDB
    ``quantile_cont`` compute the same linear interpolation
    digit-for-digit (pinned by price_percentiles since r2), both
    engines then feed the identical doubles through the identical
    threshold expression; displayed medians are floor-truncated to
    4dp per the house float rule, while the COMPARISON runs at full
    precision in both engines.

    Scale shape: three passes over events (median, MAD, count), each
    one partial-aggregating Exchange on event_type, with the
    types-sized median/MAD frames broadcast back — no corpus joins.
    At 100 TB swap the exact percentiles for approx_percentile
    (mergeable sketch, one pass for p50) and keep the flagging pass —
    same accuracy/cost dial as orders_profile's distinct counts."""
    ev = events_table(spark, sf_dir).where(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    d = ev.join(broadcast(med), "event_type")
    mad = d.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    return (
        d.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            (F.floor(F.min("med") * 10000) / F.lit(10000.0)).alias("med"),
            (F.floor(F.min("mad") * 10000) / F.lit(10000.0)).alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(3) * F.lit(1.4826) * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            "med",
            "mad",
            F.col("n_outliers").cast("bigint").alias("n_outliers"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


@query(
    "events_gap_fill_locf",
    oracle="""
    WITH o AS (
        SELECT event_type,
               CAST(floor(floor(epoch(ts) / 300) * 300) AS BIGINT)
                   AS bucket_start,
               count(*) AS c,
               sum(CAST(floor(value * 10000) AS BIGINT)) AS vs
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, min(bucket_start) AS lo, max(bucket_start) AS hi
        FROM o GROUP BY 1
    ),
    g AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, 300)) AS bucket_start
        FROM s
    ),
    f AS (
        SELECT g.event_type, g.bucket_start, o.c,
               CAST(floor(o.vs / o.c) AS BIGINT) AS avg_fp
        FROM g LEFT JOIN o
          ON g.event_type = o.event_type
         AND g.bucket_start = o.bucket_start
    )
    SELECT event_type, bucket_start,
           CAST(c IS NOT NULL AS INTEGER) AS observed,
           CAST(coalesce(c, 0) AS BIGINT) AS events,
           last_value(avg_fp IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / 10000.0 AS value_locf
    FROM f
    """,
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series gap fill with last-observation-carried-forward: each
    event type gets a dense 5-minute grid over ITS observed span, and
    empty buckets inherit the most recent observed bucket-average —
    the `locf()` interpolation every time-series store ships
    (monitoring dashboards, feature pipelines feeding models that
    cannot take NaN). Differs from events_resampled_5min in both
    dimensions: the grid is per-series, and gaps carry the last VALUE
    forward rather than zero-filling. The carried quantity is the
    fixed-point integer bucket average (floor(vs/c), exact int64 in
    both engines), divided once at the end — so the LOCF chain is
    bit-identical however it is computed.

    Scale shape: ONE corpus-sized Exchange (the (type, bucket) partial
    +final agg). The spans agg, grid explode, gap-fill join, and LOCF
    window all operate on the bucket-grain frame, whose size is
    types x time-range — it grows with the CLOCK, not the corpus (the
    drift grid's exemption). The LOCF window sorts within one event
    type of that grid; sequence() explodes computationally, no shuffle
    to build the grid."""
    ev = events_table(spark, sf_dir)
    bucket = ((F.col("ts").cast("long") / 300).cast("long") * 300).alias(
        "bucket_start"
    )
    obs = (
        ev.select("event_type", bucket, "value")
        .groupBy("event_type", "bucket_start")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.floor(F.col("value") * 10000)).alias("vs"),
        )
    )
    spans = obs.groupBy("event_type").agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(300))).alias("bucket_start"),
    )
    filled = grid.join(obs, ["event_type", "bucket_start"], "left").withColumn(
        "avg_fp", F.floor(F.col("vs") / F.col("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "event_type",
        "bucket_start",
        F.col("c").isNotNull().cast("int").alias("observed"),
        F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("events"),
        (F.last("avg_fp", ignorenulls=True).over(w) / F.lit(10000.0)).alias(
            "value_locf"
        ),
    )


@query(
    "time_decayed_user_scores",
    oracle="""
    WITH d AS (
        SELECT user_id,
               CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d,
               CAST(floor(value * 10000) AS BIGINT) AS v
        FROM events WHERE user_id IS NOT NULL
    ),
    a AS (SELECT max(d) AS anchor FROM d)
    SELECT user_id,
           sum(d.v >> CAST(a.anchor - d.d AS INTEGER)) / 10000.0
               AS decayed_score,
           count(*) AS events,
           CAST(min(a.anchor - d.d) AS BIGINT) AS freshest_age_days
    FROM d, a
    GROUP BY user_id
    """,
)
def time_decayed_user_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity score per user — the
    recency-weighted ranking primitive (feeds/trending/churn scores)
    where an event's weight halves per day of age: score =
    sum(value * 0.5^age_days) anchored at the corpus's latest day.
    The decay multiply is a RIGHT SHIFT of the house fixed-point
    integer (v >> age — exact floor(v/2^age) in any engine, no libm
    pow whose last-ulp rounding differs between JVM and C), so the
    score is order-independent, mergeable (shift-then-sum distributes
    over any partitioning of the events), and bit-identical in Spark
    and DuckDB. Events older than ~44 days shift to zero — the
    documented horizon of a 1-day half-life at 1e-4 resolution, not a
    loss: their true weight is below the output's fixed-point floor.

    Scale shape: one corpus-sized partial+final agg on user_id; the
    anchor is a one-row broadcast (scalar agg cross-joined in, the
    bounded-grid exemption). Mergeability is the production story: the
    shifted partials can be maintained incrementally by the additive
    serving protocol and re-anchored at read time by one more shift
    (score(T') = score(T) >> (T'-T))."""
    ev = events_table(spark, sf_dir).filter(F.col("user_id").isNotNull())
    d = ev.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / F.lit(86400)).alias("d"),
        F.floor(F.col("value") * 10000).alias("v"),
    )
    anchor = d.agg(F.max("d").alias("anchor"))
    return (
        d.crossJoin(broadcast(anchor))
        .withColumn("age", (F.col("anchor") - F.col("d")).cast("int"))
        .groupBy("user_id")
        .agg(
            (F.sum(F.expr("shiftright(v, age)")) / F.lit(10000.0)).alias(
                "decayed_score"
            ),
            F.count("*").alias("events"),
            F.min("age").cast("bigint").alias("freshest_age_days"),
        )
    )


@query(
    "dau_wau_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d
        FROM events WHERE user_id IS NOT NULL
    ),
    dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY 1),
    cover AS (
        SELECT DISTINCT user_id, d + g.g AS cd
        FROM ud, (SELECT unnest(generate_series(0, 6)) AS g) AS g
    ),
    wau AS (SELECT cd, count(*) AS wau FROM cover GROUP BY 1)
    SELECT dau.d AS day, dau.dau, wau.wau,
           floor(dau.dau * 10000.0 / wau.wau) / 10000.0 AS stickiness
    FROM dau JOIN wau ON dau.d = wau.cd
    """,
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness — the engagement ratio every growth dashboard
    leads with: for each active day, the distinct users that day (DAU)
    over the distinct users in the TRAILING 7 days (WAU), as a
    fixed-point ratio. The trailing-window DISTINCT is the part plain
    windowing can't do (count(distinct) over a range frame is
    unsupported and would re-scan per day anyway); the classic
    re-expression is COVERAGE EXPLOSION: each (user, day) activity row
    covers that user's membership in the 7 windows ENDING on days
    d..d+6, so WAU(day) = |distinct (user, cover_day = day)| — turning
    a windowed distinct into two ordinary distinct aggregations.

    Scale shape: the corpus collapses to (user, day) in one Exchange;
    the coverage explode is x7 on that day-grain frame (still ~1000x
    smaller than raw events), deduped and counted in a second
    day-grain Exchange. No windows, no per-day rescans; both engines
    compute the ratio as floor(dau*10000/wau) on exact int64 counts."""
    ev = events_table(spark, sf_dir).filter(F.col("user_id").isNotNull())
    ud = ev.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / F.lit(86400)).alias("d"),
    ).distinct()
    return dau_wau_from_activity(ud)


def dau_wau_from_activity(ud: DataFrame, window_days: int = 7) -> DataFrame:
    """DAU/WAU assembly over a DISTINCT (user_id, d) activity frame via
    coverage explosion (property-tested against a brute trailing-window
    Python reference in tests/test_property_round6c.py)."""
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    cover = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.col("d") + F.lit(window_days - 1))
            ).alias("cd"),
        )
        .distinct()
    )
    wau = cover.groupBy("cd").agg(F.count("*").alias("wau"))
    return (
        dau.join(wau, dau.d == wau.cd)
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            (
                F.floor(F.col("dau") * F.lit(10000.0) / F.col("wau"))
                / F.lit(10000.0)
            ).alias("stickiness"),
        )
    )


@query(
    "hourly_seasonal_anomalies",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d,
               CAST(floor(floor(epoch(ts)) / 3600) % 24 AS BIGINT) AS hod,
               count(*) AS cnt
        FROM events GROUP BY 1, 2, 3
    ),
    span AS (SELECT min(d) AS mn, max(d) AS mx FROM c),
    grid AS (
        SELECT t.event_type, g.d, h.hod
        FROM (SELECT DISTINCT event_type FROM c) t,
             (SELECT unnest(generate_series(mn, mx)) AS d FROM span) g,
             (SELECT unnest(generate_series(0, 23)) AS hod) h
    ),
    dense AS (
        SELECT grid.event_type, grid.d, grid.hod,
               coalesce(c.cnt, 0) AS cnt
        FROM grid LEFT JOIN c
          ON grid.event_type = c.event_type
         AND grid.d = c.d AND grid.hod = c.hod
    ),
    stats AS (
        SELECT event_type, hod,
               count(*) AS n, sum(cnt) AS s, sum(cnt * cnt) AS ss
        FROM dense GROUP BY 1, 2
    ),
    ranked AS (
        SELECT d.event_type, d.d, d.hod, d.cnt, s.n, s.s, s.ss,
               row_number() OVER (
                   PARTITION BY d.event_type, d.hod
                   ORDER BY d.cnt DESC, d.d ASC) AS rk
        FROM dense d JOIN stats s
          ON d.event_type = s.event_type AND d.hod = s.hod
    )
    SELECT event_type, hod, d AS peak_day, cnt AS peak_events,
           floor(s * 10000.0 / n) / 10000.0 AS hod_mean,
           CAST(cnt * n > s
                AND (cnt * n - s) * (cnt * n - s) > 9 * n * (n * ss - s * s)
                AS INTEGER) AS is_3sigma
    FROM ranked WHERE rk = 1
    """,
)
def hourly_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline deviation report: for every (type, hour-of-
    day) profile, the PEAK day's count against the same-hour-of-day
    baseline, with an exact-integer 3-sigma flag — the diurnal twin of
    event_rate_anomalies' trailing-window rule (traffic at 3am is
    compared to other 3ams, not to noon; the seasonal profile is what
    makes "quiet hour spike" detectable at all). Reporting the
    per-profile peak rather than only super-threshold cells keeps the
    output non-empty and hash-checkable on ANY corpus (the synthetic
    events are near-uniform Poisson, so a bare >3-sigma filter proves
    nothing by matching empty sets); the flag carries the detection
    semantics. The test is the house exact-integer form: with n cells
    per profile, (cnt*n - s)^2 > 9*n*(n*ss - s^2) multiplies the
    3-sigma comparison through by n^2 so no division or sqrt ever
    happens — bit-identical in any engine. Baselines use the DENSE
    grid (zero-count cells included via a generated type x day x hour
    frame) so silent hours depress the mean instead of vanishing.

    Scale shape: one corpus-sized Exchange (the (type, day, hour)
    partial+final agg); the dense grid, profile stats, peak window and
    flag join are all clock-sized (types x days x 24), the drift
    grid's exemption. The profile join broadcasts (types x 24 rows)."""
    ev = events_table(spark, sf_dir)
    ts_s = F.col("ts").cast("long")
    c = ev.select(
        "event_type",
        F.floor(ts_s / F.lit(86400)).alias("d"),
        F.pmod(F.floor(ts_s / F.lit(3600)), F.lit(24)).alias("hod"),
    ).groupBy("event_type", "d", "hod").agg(F.count("*").alias("cnt"))
    span = c.agg(F.min("d").alias("mn"), F.max("d").alias("hx_mx"))
    days = span.select(
        F.explode(F.sequence("mn", "hx_mx")).alias("d")
    )
    hods = spark.range(24).select(F.col("id").cast("bigint").alias("hod"))
    types = c.select("event_type").distinct()
    grid = types.crossJoin(broadcast(days)).crossJoin(broadcast(hods))
    dense = grid.join(c, ["event_type", "d", "hod"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    stats = dense.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    dev = F.col("cnt") * F.col("n") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    rk = F.row_number().over(
        Window.partitionBy("event_type", "hod").orderBy(
            F.desc("cnt"), F.asc("d")
        )
    )
    return (
        dense.join(broadcast(stats), ["event_type", "hod"])
        .withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "hod",
            F.col("d").alias("peak_day"),
            F.col("cnt").alias("peak_events"),
            (
                F.floor(F.col("s") * F.lit(10000.0) / F.col("n"))
                / F.lit(10000.0)
            ).alias("hod_mean"),
            ((dev > 0) & (dev * dev > 9 * F.col("n") * var_n2))
            .cast("int")
            .alias("is_3sigma"),
        )
    )


@query(
    "decayed_streamed_parity",
    oracle="""
    WITH g AS (
        SELECT user_id,
               CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d,
               count(*) AS n,
               coalesce(sum(CAST(floor(value * 10000) AS BIGINT)), 0) AS v
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2
    ),
    a AS (SELECT max(d) AS anchor FROM g)
    SELECT user_id,
           sum(g.v >> CAST(a.anchor - g.d AS INTEGER)) / 10000.0
               AS decayed_score,
           CAST(sum(g.n) AS BIGINT) AS events,
           CAST(min(a.anchor - g.d) AS BIGINT) AS freshest_age_days
    FROM g, a
    GROUP BY user_id
    """,
)
def decayed_streamed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEVENTH maintained serving table — time-decayed activity
    scores — through the streamed-parity protocol, making the batch
    query's serving claim driver-verified instead of asserted
    (time_decayed_user_scores' docstring: "the shifted partials can be
    maintained incrementally by the additive serving protocol and
    re-anchored at read time"). State is the (user, day) fixed-point
    value-sum grid — PLAIN ADDITIVE counters, so it folds through
    ``apply_additive_batch`` with zero new merge machinery (the CMS
    precedent) — and the DECAY lives entirely in the read-time view,
    which anchors at the latest maintained day and right-shifts each
    partial by its age. 4 deterministic micro-batches + the batch-1
    crash-replay the guard must no-op; the oracle recomputes the
    day-grain partials and the shifted score from raw events in one
    pass, so a green row proves a half-life metric is incrementally
    maintainable with NO approximation drift: the additive day sums
    are slicing-independent (tests/test_property_serving.py), and the
    shift happens ONCE on the merged sum at read time. Note the
    deliberate quantization difference vs the batch
    ``time_decayed_user_scores``: that query floors per EVENT
    (sum(v_i >> age)), this serving form floors once per user-day
    ((sum v_i) >> age) — strictly less floor loss, and the only form
    an additive store can serve (floor division does not distribute
    over addition, so per-event shifts could not be reconstructed
    from merged state).

    Scale shape: each merge joins two (users x active-days) grids at
    day grain; the view is one grid aggregation with a 1-row broadcast
    anchor. No event is re-read after its batch; advancing the anchor
    is one more shift, never a rebuild."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        decayed_partials_increment,
        decayed_scores_view,
    )

    serving = _run_streamed_parity(
        spark,
        sf_dir,
        scratch_stem="decps_decayed_parity_serving",
        inc_fn=decayed_partials_increment,
        keys=["user_id", "d"],
        sum_cols=["n", "v_fp"],
    )
    return decayed_scores_view(spark, serving)


@query(
    "ks_drift_check",
    oracle="""
    WITH e AS (
        SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
               CAST(floor(value * 10000) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    mx AS (SELECT max(day) AS latest FROM e),
    g AS (
        SELECT v,
               sum(CASE WHEN day < latest THEN 1 ELSE 0 END) AS n_ref,
               sum(CASE WHEN day = latest THEN 1 ELSE 0 END) AS n_cur
        FROM e, mx GROUP BY 1
    ),
    t AS (
        SELECT CAST(sum(n_ref) AS BIGINT) AS nr,
               CAST(sum(n_cur) AS BIGINT) AS nc
        FROM g
    ),
    c AS (
        SELECT v,
               sum(n_ref) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_ref,
               sum(n_cur) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cur
        FROM g
    ),
    d AS (
        SELECT c.v, abs(c.cum_ref / t.nr - c.cum_cur / t.nc) AS diff,
               t.nr, t.nc,
               row_number() OVER (
                   ORDER BY abs(c.cum_ref / t.nr - c.cum_cur / t.nc) DESC,
                            c.v ASC) AS rk
        FROM c, t
    )
    SELECT floor(diff * 1000000000) / 1000000000.0 AS ks_d,
           v / 10000.0 AS at_value,
           nr AS n_ref, nc AS n_cur
    FROM d WHERE rk = 1
    """,
)
def ks_drift_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test, EXACT: the maximum
    CDF gap between the latest day's value distribution and all
    history — the binning-free complement to the chi-square drift
    family (event_value_drift picks up mass shifts between its 20
    fixed buckets; KS catches any shape change, including ones that
    stay inside a bucket, and its statistic is distribution-free).
    Values live on the house 1e-4 fixed grid, per-value counts split
    ref/cur against a one-row broadcast anchor, cumulative counts run
    over the VALUE-DOMAIN frame, and the gap |cum_ref/NR - cum_cur/NC|
    is a deterministic IEEE expression evaluated identically in both
    engines (integer operands, one division each, one subtraction —
    bit-identical, then floor-truncated at 1e-9 like the chi2
    precedent). Emits the argmax row: the statistic, WHERE the
    distributions diverge most, and both sample sizes.

    Scale shape: one corpus-sized Exchange (the per-value split agg).
    The cumulative window and argmax rank run on the value-domain
    frame, which is bounded by the VALUE RESOLUTION (<=4.9M rows at
    this column's range, ~dozens of thousands observed), not the
    corpus — the grid exemption's cousin: its single-partition sort
    has a constant ceiling no matter how many events arrive."""
    ev = events_table(spark, sf_dir).filter(F.col("value").isNotNull())
    e = ev.select(
        F.floor(F.col("ts").cast("long") / F.lit(86400)).alias("day"),
        F.floor(F.col("value") * 10000).alias("v"),
    )
    mx = e.agg(F.max("day").alias("latest"))
    g = (
        e.crossJoin(broadcast(mx))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("day") < F.col("latest"), 1).otherwise(0))
            .alias("n_ref"),
            F.sum(F.when(F.col("day") == F.col("latest"), 1).otherwise(0))
            .alias("n_cur"),
        )
    )
    tot = g.agg(
        F.sum("n_ref").cast("bigint").alias("nr"),
        F.sum("n_cur").cast("bigint").alias("nc"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "v",
        F.sum("n_ref").over(w).alias("cum_ref"),
        F.sum("n_cur").over(w).alias("cum_cur"),
    )
    diff = F.abs(
        F.col("cum_ref") / F.col("nr") - F.col("cum_cur") / F.col("nc")
    )
    d = (
        c.crossJoin(broadcast(tot))
        .withColumn("diff", diff)
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("diff"), F.asc("v"))),
        )
        .filter(F.col("rk") == 1)
    )
    return d.select(
        (F.floor(F.col("diff") * 1000000000) / F.lit(1000000000.0)).alias(
            "ks_d"
        ),
        (F.col("v") / F.lit(10000.0)).alias("at_value"),
        F.col("nr").alias("n_ref"),
        F.col("nc").alias("n_cur"),
    )


@query(
    "audience_overlap_matrix",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
        WHERE user_id IS NOT NULL
    ),
    m AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
    co AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS both_users
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT co.type_a, co.type_b,
           CAST(ma.n AS BIGINT) AS users_a,
           CAST(mb.n AS BIGINT) AS users_b,
           CAST(co.both_users AS BIGINT) AS both_users,
           floor(co.both_users * 10000.0
                 / (ma.n + mb.n - co.both_users)) / 10000.0 AS jaccard
    FROM co
    JOIN m ma ON ma.event_type = co.type_a
    JOIN m mb ON mb.event_type = co.type_b
    """,
)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap — the product-analytics matrix behind "users
    who do X also do Y": pairwise Jaccard between the user cohorts of
    every event-type pair, from one distinct (user, type) frame
    self-joined on user. The per-user fan-out is bounded by the TYPE
    DOMAIN (t types -> at most t·(t-1)/2 pair rows per user), so the
    "self-join" is really a bounded explode — never the quadratic
    user-pair join the same question about USER similarity would need
    (that one is the LSH ladder's job). Ratio arithmetic is the exact
    floor(both·1e4 / union) form on int64 counts.

    Scale shape: one corpus Exchange to the (user, type) distinct; the
    co-occurrence join reuses that frame's user partitioning (no
    second corpus shuffle of raw events); marginals and the final
    matrix are type-grid-sized broadcasts."""
    ut = (
        events_table(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type")
        .distinct()
    )
    ut = scoped_persist(ut, "audience_overlap.ut")
    m = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("both_users"))
    )
    ma = m.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("users_a")
    )
    mb = m.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("users_b")
    )
    return (
        co.join(broadcast(ma), "type_a")
        .join(broadcast(mb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("users_a").cast("bigint").alias("users_a"),
            F.col("users_b").cast("bigint").alias("users_b"),
            F.col("both_users").cast("bigint").alias("both_users"),
            (
                F.floor(
                    F.col("both_users")
                    * F.lit(10000.0)
                    / (
                        F.col("users_a")
                        + F.col("users_b")
                        - F.col("both_users")
                    )
                )
                / F.lit(10000.0)
            ).alias("jaccard"),
        )
    )


@query(
    "chart_downsample",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(floor(floor(epoch(ts) / 300) * 300) AS BIGINT)
                   AS bucket_start,
               CAST(floor(epoch_us(ts)) AS BIGINT) AS us,
               CAST(floor(value * 10000) AS BIGINT) AS v
        FROM events
    ),
    s AS (
        SELECT event_type, bucket_start,
               count(*) AS n, sum(v) AS sv,
               min(v) AS v_min, max(v) AS v_max
        FROM e GROUP BY 1, 2
    ),
    r AS (
        SELECT e.event_type, e.bucket_start, e.us, e.v,
               s.n, s.sv, s.v_min, s.v_max,
               row_number() OVER (
                   PARTITION BY e.event_type, e.bucket_start
                   ORDER BY abs(e.v * s.n - s.sv) DESC, e.us ASC) AS rk
        FROM e JOIN s
          ON e.event_type = s.event_type
         AND e.bucket_start = s.bucket_start
    )
    SELECT event_type, bucket_start,
           us AS picked_us, v / 10000.0 AS picked_value,
           v_min / 10000.0 AS bucket_min, v_max / 10000.0 AS bucket_max,
           CAST(n AS BIGINT) AS n
    FROM r WHERE rk = 1
    """,
)
def chart_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic chart downsampling (the LTOB family — "largest
    triangle/deviation, one bucket"): per (series, 5-min bucket), keep
    the single point that deviates most from the bucket mean, plus the
    bucket's min/max envelope — the representative-point reduction a
    dashboard runs before shipping a million-point series to a
    browser. Picking max |v·n - sum| (the mean comparison multiplied
    through by n, pure int64 — no division, no float mean) makes the
    winner exact and engine-portable; ties break to the earliest
    microsecond. Unlike classic LTTB, the selection has NO sequential
    dependence on the previous bucket's pick, which is exactly what
    makes it embarrassingly parallel — the documented trade-off
    (envelope columns preserve the extremes LTTB's triangles chase).

    Scale shape: one corpus Exchange on (series, bucket) shared by the
    stats agg and the pick window (same key); output is bucket-grain.
    The deviation rank is WindowGroupLimit-eligible (rk=1 pushed into
    the sort)."""
    e = events_table(spark, sf_dir).select(
        "event_type",
        ((F.col("ts").cast("long") / 300).cast("long") * 300).alias(
            "bucket_start"
        ),
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 10000).alias("v"),
    )
    return ltob_pick(e).select(
        "event_type",
        "bucket_start",
        F.col("us").alias("picked_us"),
        (F.col("v") / F.lit(10000.0)).alias("picked_value"),
        (F.col("v_min") / F.lit(10000.0)).alias("bucket_min"),
        (F.col("v_max") / F.lit(10000.0)).alias("bucket_max"),
        F.col("n").cast("bigint").alias("n"),
    )


def ltob_pick(e: DataFrame) -> DataFrame:
    """Per-(series, bucket) max-deviation pick over a
    (event_type, bucket_start, us, v) frame: exact int64 |v*n - sum|
    winner, ties to the earliest microsecond, bucket min/max carried.
    Property-tested against a sequential Python reference in
    tests/test_property_round6c.py."""
    s = e.groupBy("event_type", "bucket_start").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )
    r = e.join(s, ["event_type", "bucket_start"]).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type", "bucket_start").orderBy(
                F.desc(F.abs(F.col("v") * F.col("n") - F.col("sv"))),
                F.asc("us"),
            )
        ),
    )
    return r.filter(F.col("rk") == 1)


@query(
    "week_over_week_report",
    oracle="""
    WITH w AS (
        SELECT event_type,
               CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS wk,
               count(*) AS events
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, wk, CAST(events AS BIGINT) AS events,
           CAST(lag(events) OVER (PARTITION BY event_type ORDER BY wk)
                AS BIGINT) AS prev_events,
           floor((events - lag(events) OVER (PARTITION BY event_type
                                             ORDER BY wk))
                 * 10000.0
                 / lag(events) OVER (PARTITION BY event_type ORDER BY wk))
               / 10000.0 AS wow_delta
    FROM w
    """,
)
def week_over_week_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting — the WoW delta every BI dashboard
    opens with: per (event type, epoch week), the event count, the
    previous week's count, and the relative change as an exact
    fixed-point ratio (floor(diff·1e4/prev); NULL on each series'
    first week rather than a fabricated zero). Weeks are epoch
    arithmetic (epoch // 604800) like the cohort query — portable,
    no locale/week-start ambiguity.

    Scale shape: one corpus Exchange (the (type, week) partial+final
    agg); the lag window runs on the clock-sized grid. This is the
    READ-side twin of the additive serving tables — at 100 TB the
    (type, week) grid would be maintained incrementally and this
    query becomes a pure grid scan."""
    w = (
        # ts IS NOT NULL: untimestamped events have no week; the NULL
        # bucket otherwise gets a meaningless WoW delta whose position
        # in the lag ordering even differs across engines (Spark NULLS
        # FIRST vs ANSI NULLS LAST — r8 adversarial-events audit).
        events_table(spark, sf_dir)
        .filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("ts").cast("long") / F.lit(604800)).alias("wk"),
        )
        .agg(F.count("*").alias("events"))
    )
    prev = F.lag("events").over(
        Window.partitionBy("event_type").orderBy("wk")
    )
    return w.select(
        "event_type",
        "wk",
        F.col("events").cast("bigint").alias("events"),
        prev.cast("bigint").alias("prev_events"),
        (
            F.floor((F.col("events") - prev) * F.lit(10000.0) / prev)
            / F.lit(10000.0)
        ).alias("wow_delta"),
    )


@query(
    "session_entry_exit",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               CAST(floor(epoch_us(ts)) AS BIGINT) AS us, event_id,
               CASE WHEN floor(epoch(ts))
                         - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts))) >= 600
                         OR lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    t AS (
        SELECT user_id, event_type, us, event_id,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    ),
    r AS (
        SELECT user_id, sid, event_type,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY us ASC, event_id ASC) AS rk_a,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY us DESC, event_id DESC) AS rk_d,
               count(*) OVER (PARTITION BY user_id, sid) AS n
        FROM t
    ),
    s AS (
        SELECT user_id, sid,
               max(CASE WHEN rk_a = 1 THEN event_type END) AS entry_type,
               max(CASE WHEN rk_d = 1 THEN event_type END) AS exit_type,
               max(n) AS n
        FROM r GROUP BY 1, 2
    )
    SELECT entry_type, exit_type,
           count(*) AS sessions,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS bounces,
           floor(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000.0
                 / count(*)) / 10000.0 AS bounce_share
    FROM s GROUP BY 1, 2
    """,
)
def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry/exit analysis — the web-analytics landing/exit-page
    matrix: per 10-minute-gap session (the SAME gap rule as
    events_sessionization), the first and last event type, aggregated
    to (entry, exit) pairs with session counts, single-event BOUNCE
    counts, and the bounce share. First/last are made deterministic by
    (microsecond, event_id) ordering — no reliance on engine-specific
    first()/arg_min tie behavior, which is exactly the trap this
    formulation avoids.

    Scale shape: everything — gap flags, session ids, both
    direction ranks, the per-session collapse — rides ONE user_id
    Exchange (sequential windows on the same partitioning, the
    conversion_funnel pattern); the final (entry, exit) grid is
    type-domain-sized."""
    ev = events_table(spark, sf_dir)
    uw = Window.partitionBy("user_id").orderBy("us", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.floor(F.col("ts").cast("long")).alias("sec"),
    ).withColumn(
        "is_new",
        F.when(
            F.lag("sec").over(
                Window.partitionBy("user_id").orderBy("us", "event_id")
            ).isNull()
            | (
                F.col("sec")
                - F.lag("sec").over(
                    Window.partitionBy("user_id").orderBy("us", "event_id")
                )
                >= 600
            ),
            1,
        ).otherwise(0),
    )
    t = o.withColumn(
        "sid",
        F.sum("is_new").over(uw.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sw = Window.partitionBy("user_id", "sid")
    r = (
        t.withColumn(
            "rk_a",
            F.row_number().over(sw.orderBy(F.asc("us"), F.asc("event_id"))),
        )
        .withColumn(
            "rk_d",
            F.row_number().over(sw.orderBy(F.desc("us"), F.desc("event_id"))),
        )
        .withColumn("n", F.count("*").over(sw))
    )
    s = r.groupBy("user_id", "sid").agg(
        F.max(F.when(F.col("rk_a") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
        F.max(F.when(F.col("rk_d") == 1, F.col("event_type"))).alias(
            "exit_type"
        ),
        F.max("n").alias("n"),
    )
    return s.groupBy("entry_type", "exit_type").agg(
        F.count("*").alias("sessions"),
        F.sum((F.col("n") == 1).cast("int")).cast("bigint").alias("bounces"),
        (
            F.floor(
                F.sum((F.col("n") == 1).cast("int"))
                * F.lit(10000.0)
                / F.count("*")
            )
            / F.lit(10000.0)
        ).alias("bounce_share"),
    )


# Power-of-two gap bucket: highest-bit position of the gap in seconds,
# generated once and embedded verbatim in BOTH engines' expressions
# (bounded CASE — no log2, whose float rounding at exact powers of two
# could disagree).
_GAP_BUCKET_SQL = (
    "CASE WHEN gap <= 0 THEN 0 "
    + " ".join(f"WHEN gap < {2 ** b} THEN {b}" for b in range(1, 23))
    + " ELSE 23 END"
)


@query(
    "inter_event_time_histogram",
    oracle=f"""
    WITH o AS (
        SELECT CAST(floor(epoch(ts))
                    - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts)))
                    AS BIGINT) AS gap
        FROM events WHERE user_id IS NOT NULL
    ),
    b AS (
        SELECT CAST({_GAP_BUCKET_SQL} AS INTEGER) AS bucket
        FROM o WHERE gap IS NOT NULL
    ),
    h AS (SELECT bucket, count(*) AS pairs FROM b GROUP BY 1),
    t AS (SELECT CAST(sum(pairs) AS BIGINT) AS tot FROM h)
    SELECT h.bucket,
           CAST(CASE WHEN h.bucket = 0 THEN 0
                     ELSE power(2, h.bucket - 1) END AS BIGINT)
               AS lo_seconds,
           CAST(h.pairs AS BIGINT) AS pairs,
           floor(h.pairs * 10000.0 / t.tot) / 10000.0 AS share
    FROM h, t
    """,
)
def inter_event_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Think-time distribution: the histogram of gaps between a user's
    consecutive events, on power-of-two buckets (the log-scale view
    session-timeout and engagement tuning actually reads — THIS
    histogram is how a 10-minute gap rule gets justified rather than
    guessed). Buckets come from a generated bounded CASE shared
    verbatim by both engines — the highest-bit position of the gap —
    because floor(log2(x)) through libm can disagree with itself at
    exact powers of two; integer comparisons cannot.

    Scale shape: one user_id Exchange for the lag window (the same
    partitioning every sessionization query rides), collapsing
    map-side to <=24 bucket rows; totals join as a 1-row broadcast."""
    ev = events_table(spark, sf_dir).filter(F.col("user_id").isNotNull())
    o = ev.select(
        "user_id",
        F.floor(F.col("ts").cast("long")).alias("sec"),
        F.unix_micros("ts").alias("us"),
        "event_id",
    ).withColumn(
        "gap",
        F.col("sec")
        - F.lag("sec").over(
            Window.partitionBy("user_id").orderBy("us", "event_id")
        ),
    )
    b = o.filter(F.col("gap").isNotNull()).select(
        F.expr(_GAP_BUCKET_SQL).cast("int").alias("bucket")
    )
    h = b.groupBy("bucket").agg(F.count("*").alias("pairs"))
    t = h.agg(F.sum("pairs").cast("bigint").alias("tot"))
    return (
        h.crossJoin(broadcast(t))
        .select(
            "bucket",
            F.when(F.col("bucket") == 0, F.lit(0))
            .otherwise(F.pow(F.lit(2.0), F.col("bucket") - 1))
            .cast("bigint")
            .alias("lo_seconds"),
            F.col("pairs").cast("bigint").alias("pairs"),
            (
                F.floor(F.col("pairs") * F.lit(10000.0) / F.col("tot"))
                / F.lit(10000.0)
            ).alias("share"),
        )
    )


@query(
    "attribution_linear",
    oracle="""
    WITH ev AS (SELECT epoch_ms(ts) AS ms, user_id, event_type
                FROM events WHERE user_id IS NOT NULL),
    t AS (SELECT user_id, ms, event_type AS touch_type FROM ev
          WHERE event_type IN ('view', 'click')),
    p AS (SELECT DISTINCT user_id, ms AS pur_ms FROM ev
          WHERE event_type = 'purchase'),
    j AS (
        SELECT t.touch_type, t.user_id, t.ms, p.pur_ms
        FROM t ASOF LEFT JOIN p
          ON t.user_id = p.user_id AND p.pur_ms >= t.ms
    ),
    conv AS (
        SELECT touch_type, user_id, pur_ms,
               count(*) OVER (PARTITION BY user_id, pur_ms) AS n_touches
        FROM j
        WHERE pur_ms IS NOT NULL AND pur_ms - ms <= 604800000
    ),
    credited AS (
        SELECT touch_type,
               CAST(user_id AS VARCHAR) || ':' || CAST(pur_ms AS VARCHAR)
                   AS conv_key,
               1000000 // n_touches AS credit_ppm
        FROM conv
    )
    SELECT touch_type,
           CAST(count(*) AS BIGINT) AS touches_credited,
           CAST(count(DISTINCT conv_key) AS BIGINT) AS conversions_touched,
           CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_total
    FROM credited GROUP BY 1
    """,
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution — marketing analytics' standard
    answer to "which touchpoint gets credit for the conversion": every
    view/click is matched FORWARD to the same user's next purchase
    (the `asof_join` union+window operator via the negated-time trick,
    exactly as `conversion_lag_percentiles`); touches whose purchase
    lands within the 7-day window form the conversion's touch set, and
    each receives an equal 1/n share of the credit. Credit is integer
    parts-per-million under floor division (1000000 div n), so sums
    are bit-exact in any engine — the house fixed-point discipline
    applied to credit shares instead of prices.

    Scale shape: one user_id Exchange for the as-of union+window; the
    per-conversion touch count is a second window over the SAME
    user-partitioned frame (Catalyst reuses the partitioning — no new
    corpus shuffle, the (user, pur_ms) window keys are user-prefixed);
    the report is a type-domain-sized aggregate. The conversion-key
    distinct is corpus-bounded but conversion-sized, far below raw
    events."""
    ev = events_table(spark, sf_dir).filter(F.col("user_id").isNotNull())
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_type").alias("touch_type"),
        F.unix_millis("ts").alias("ms"),
        (-F.unix_millis("ts")).alias("tneg"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_millis("ts").alias("pur_ms"),
            (-F.unix_millis("ts")).alias("pneg"),
        )
        .distinct()
    )
    from data_engineering_capstone_project_spark.operators.joins import asof_join

    j = asof_join(
        touches,
        purchases,
        on="user_id",
        left_time="tneg",
        right_time="pneg",
        value_cols=["pur_ms"],
        how="left",
    )
    conv = j.filter(
        F.col("pur_ms").isNotNull()
        & (F.col("pur_ms") - F.col("ms") <= F.lit(604800000))
    ).withColumn(
        "n_touches",
        F.count("*").over(Window.partitionBy("user_id", "pur_ms")),
    )
    credited = conv.select(
        "touch_type",
        F.concat_ws(
            ":", F.col("user_id").cast("string"), F.col("pur_ms").cast("string")
        ).alias("conv_key"),
        F.expr("1000000 div n_touches").alias("credit_ppm"),
    )
    return credited.groupBy("touch_type").agg(
        F.count("*").cast("bigint").alias("touches_credited"),
        F.count_distinct("conv_key").cast("bigint").alias("conversions_touched"),
        F.sum("credit_ppm").cast("bigint").alias("credit_ppm_total"),
    )


@query(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS days,
                   CAST(sum(n) AS BIGINT) AS total FROM daily),
    c AS (
        SELECT d, n,
               CAST(tot.days * sum(n) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - tot.total * row_number() OVER (ORDER BY d)
                 AS BIGINT) AS cusum_scaled
        FROM daily, tot
    )
    SELECT d, n, cusum_scaled,
           abs(cusum_scaled) = (SELECT max(abs(cusum_scaled)) FROM c)
               AND d = (SELECT min(d) FROM c
                        WHERE abs(cusum_scaled) =
                              (SELECT max(abs(cusum_scaled)) FROM c))
               AS is_changepoint
    FROM c
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954) on the daily event-count
    series — "when did the level shift?" for pipeline monitoring: the
    running cumulative deviation from the all-period mean peaks (in
    absolute value) at the most likely changepoint. Kept integer-exact
    by scaling through the total: CUSUM_i = Σ(n_j - T/D) is emitted as
    D·S_i - i·T (prefix sum S_i, day index i), the same series times
    the positive constant D — identical argmax, zero float drift, so
    the whole detection hash-matches the oracle bit-for-bit. The flag
    marks the earliest day attaining the peak.

    Scale shape: ONE corpus Exchange to day grain; the series frame is
    days-sized, so the ordered prefix-sum window and the max-scan run
    on an aggregate (the single-partition window over days is the
    documented aggregate-frame pattern, same as week_over_week_report
    — at 100 TB the day axis is still thousands of rows). Overflow
    bound: D·S_i <= days · total_events ~ 1e4 · 1e12 = 1e16 at 100 TB
    scale — inside int64 with three decades to spare."""
    ev = events_table(spark, sf_dir)
    # ts IS NOT NULL: a NULL "day" would join the ordered series at a
    # different position per engine (Spark NULLS FIRST vs ANSI NULLS
    # LAST) and shift every prefix sum — untimestamped events are out
    # of scope for a time series (r8 adversarial-events audit).
    daily = ev.filter(F.col("ts").isNotNull()).groupBy(
        F.floor(F.col("ts").cast("long") / F.lit(86400)).alias("d")
    ).agg(F.count("*").alias("n"))
    tot = daily.agg(
        F.count("*").alias("days"), F.sum("n").alias("total")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    c = (
        daily.crossJoin(broadcast(tot))
        .withColumn("s", F.sum("n").over(w))
        .withColumn("i", F.row_number().over(Window.orderBy("d")))
        .select(
            "d",
            F.col("n").cast("bigint").alias("n"),
            (F.col("days") * F.col("s") - F.col("total") * F.col("i"))
            .cast("bigint")
            .alias("cusum_scaled"),
        )
    )
    peak = c.agg(
        F.max(F.abs(F.col("cusum_scaled"))).alias("peak")
    )
    first_peak = (
        c.crossJoin(broadcast(peak))
        .filter(F.abs(F.col("cusum_scaled")) == F.col("peak"))
        .agg(F.min("d").alias("peak_d"))
    )
    return (
        c.crossJoin(broadcast(first_peak))
        .select(
            "d",
            "n",
            "cusum_scaled",
            (F.col("d") == F.col("peak_d")).alias("is_changepoint"),
        )
    )


@query(
    "ohlc_hourly_bars",
    oracle="""
    WITH base AS (
        SELECT event_type,
               epoch_ms(ts) // 3600000 AS hr,
               epoch_ms(ts) AS ms, event_id,
               CAST(floor(value * 10000) AS BIGINT) AS v_fp
        FROM events WHERE value IS NOT NULL
    ),
    rk AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, hr
                                  ORDER BY ms ASC, event_id ASC) AS rn_a,
               row_number() OVER (PARTITION BY event_type, hr
                                  ORDER BY ms DESC, event_id DESC) AS rn_d
        FROM base
    )
    SELECT event_type, hr,
           max(CASE WHEN rn_a = 1 THEN v_fp END) / 10000.0 AS open,
           max(v_fp) / 10000.0 AS high,
           min(v_fp) / 10000.0 AS low,
           max(CASE WHEN rn_d = 1 THEN v_fp END) / 10000.0 AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM rk GROUP BY 1, 2
    """,
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars — the time-series downsampling every
    metrics/trading dashboard draws: per (event_type, hour), the
    opening value (first by event time, event_id tie-break), the
    high, the low, and the closing value (last), plus the bar's
    event count. Complements ``chart_downsample`` (LTOB keeps
    representative POINTS; OHLC keeps per-bucket EXTREMES + endpoints
    — the finance-standard alternative). Values ride the house
    fixed-point rail (floor(v·1e4) int64) so first/last/min/max and
    the final /1e4 render identically in both engines; endpoint
    selection is two row_number windows (asc + desc) over the SAME
    (type, hour) partitioning, turned into conditional-max aggregates.

    Scale shape: ONE corpus Exchange on (type, hour) serves both
    windows AND the final groupBy (identical clustering — Catalyst
    plans one shuffle); output is bar-grid-sized (types × hours).
    At 100 TB the same plan holds: the bar grid grows with the clock,
    not the corpus."""
    ev = events_table(spark, sf_dir)
    base = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.unix_millis("ts") / F.lit(3600000)).alias("hr"),
        F.unix_millis("ts").alias("ms"),
        "event_id",
        F.floor(F.col("value") * F.lit(10000)).cast("bigint").alias("v_fp"),
    )
    wa = Window.partitionBy("event_type", "hr").orderBy(
        F.asc("ms"), F.asc("event_id")
    )
    wd = Window.partitionBy("event_type", "hr").orderBy(
        F.desc("ms"), F.desc("event_id")
    )
    rk = base.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return rk.groupBy("event_type", "hr").agg(
        (F.max(F.when(F.col("rn_a") == 1, F.col("v_fp"))) / F.lit(10000.0)).alias("open"),
        (F.max("v_fp") / F.lit(10000.0)).alias("high"),
        (F.min("v_fp") / F.lit(10000.0)).alias("low"),
        (F.max(F.when(F.col("rn_d") == 1, F.col("v_fp"))) / F.lit(10000.0)).alias("close"),
        F.count("*").cast("bigint").alias("n_events"),
    )


@query(
    "ohlc_streamed_parity",
    oracle="""
    WITH base AS (
        SELECT event_type,
               epoch_ms(ts) // 3600000 AS hr,
               epoch_ms(ts) AS ms, event_id,
               CAST(floor(value * 10000) AS BIGINT) AS v_fp
        FROM events WHERE value IS NOT NULL
    ),
    rk AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, hr
                                  ORDER BY ms ASC, event_id ASC) AS rn_a,
               row_number() OVER (PARTITION BY event_type, hr
                                  ORDER BY ms DESC, event_id DESC) AS rn_d
        FROM base
    )
    SELECT event_type, hr,
           max(CASE WHEN rn_a = 1 THEN v_fp END) / 10000.0 AS open,
           max(v_fp) / 10000.0 AS high,
           min(v_fp) / 10000.0 AS low,
           max(CASE WHEN rn_d = 1 THEN v_fp END) / 10000.0 AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM rk GROUP BY 1, 2
    """,
)
def ohlc_streamed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EIGHTH maintained serving table, second instance of the
    MERGEABLE-beyond-additive class (KMV k-min sets were the first):
    per-(type, hour) OHLC bars folded incrementally through
    ``apply_ohlc_batch``. Open/close depend on event ORDER, so the
    bars cannot live in an additive counter — but their
    endpoint-and-extremes state merges associatively (union's open =
    min_by over opens, close = max_by, extremes min/max, count sum;
    exactly the partial-aggregation state Spark's own min_by/max_by
    move between map and reduce, materialized into a table). The
    usual discipline: 4 deterministic micro-batches through the real
    stage+publish protocol, a deliberate batch-1 crash-replay the
    batch-id guard must no-op, and a from-scratch oracle — a green
    row proves the incrementally-maintained bars are BIT-IDENTICAL to
    recomputing every bar from raw history. State stays bar-grid-
    sized forever; per batch, one scan of the batch builds its
    partial bars."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_ohlc_batch,
        ohlc_serving_view,
    )

    serving = _parity_scratch_dir("decps_ohlc_parity_serving")
    ev = events_table(spark, sf_dir)
    batch_of = F.coalesce(F.pmod(F.col("user_id"), F.lit(4)), F.lit(3))
    for i in range(4):
        batch = ev.filter(batch_of == i)
        applied = apply_ohlc_batch(spark, batch, i, serving)
        if applied is not True:
            raise RuntimeError(f"ohlc batch {i} was not applied to fresh state")
        if i == 1:
            replayed = apply_ohlc_batch(spark, batch, 1, serving)
            if replayed is not False:
                raise RuntimeError("ohlc batch-id guard failed to skip replay")
    return ohlc_serving_view(spark, serving)


@query(
    "ivm_revenue_by_nation_parity",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 10000) AS BIGINT)) AS BIGINT) AS rev_fp,
           CAST(count(*) AS BIGINT) AS line_count
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def ivm_revenue_by_nation_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a JOIN aggregate — the classic
    IVM result, driver-verified: the materialized view
    revenue-by-nation (lineitem ⋈ orders ⋈ customer ⋈ nation, summed)
    is maintained by folding lineitem DELTAS through the additive
    serving protocol, where each increment is agg(Δlineitem ⋈ dims) —
    never a re-join of history. Because SUM/COUNT distribute over
    union, view(base ∪ Δ) = view(base) ⊞ agg(Δ ⋈ dims); fixed-point
    per-row floors make ⊞ plain int64 addition. Four l_orderkey-split
    micro-batches (plus the mandatory batch-1 crash replay the
    batch-id guard must no-op) land bit-identical to the from-scratch
    four-table oracle.

    At 100 TB this is how the nightly "revenue by nation" dashboard
    absorbs a day of new lineitems: scan the DELTA once, join it to
    the (broadcast-tier or partition-pruned) dimension chain, and add
    nation-grid-sized partials into the published view — the
    maintained-table discipline extended from single-table aggregates
    to a star-join view. Per-batch cost: Δ ⋈ orders is the only
    fact-sized join (orderkey equi-join; at scale the orders side is
    partition-pruned to the delta's key range); everything after the
    first groupBy is nations-sized."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_additive_batch,
    )

    serving = _parity_scratch_dir("decps_ivm_revenue_serving")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")

    def inc(batch_li):
        return (
            batch_li.join(orders, batch_li.l_orderkey == orders.o_orderkey)
            .join(customer, F.col("o_custkey") == customer.c_custkey)
            .join(
                broadcast(nation),
                F.col("c_nationkey") == nation.n_nationkey,
            )
            .groupBy("n_name")
            .agg(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * F.lit(10000)
                    ).cast("bigint")
                ).alias("rev_fp"),
                F.count("*").alias("line_count"),
            )
        )

    batch_of = F.pmod(F.col("l_orderkey"), F.lit(4))
    for i in range(4):
        batch = li.filter(batch_of == i)
        applied = apply_additive_batch(
            spark, batch, i, serving, inc,
            keys=["n_name"], sum_cols=["rev_fp", "line_count"],
        )
        if applied is not True:
            raise RuntimeError(f"ivm batch {i} was not applied to fresh state")
        if i == 1:
            replayed = apply_additive_batch(
                spark, batch, 1, serving, inc,
                keys=["n_name"], sum_cols=["rev_fp", "line_count"],
            )
            if replayed is not False:
                raise RuntimeError("ivm batch-id guard failed to skip replay")
    view = spark.read.parquet(serving)
    return view.select(
        "n_name",
        F.col("rev_fp").cast("bigint").alias("rev_fp"),
        F.col("line_count").cast("bigint").alias("line_count"),
    )
