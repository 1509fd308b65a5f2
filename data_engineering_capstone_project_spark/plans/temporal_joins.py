"""As-of and range-join query surface (SURVEY.md §2.4 extended rows).

The reference has only equi-joins (data_preparation.py:164-216); these
queries exercise the temporal joins a training-data/event pipeline
needs, each with a DuckDB oracle (DuckDB has native ASOF JOIN, which
independently validates our union+window formulation).

Timestamps are exchanged as epoch milliseconds (bigint): the events
parquet is TIMESTAMP(NANOS), which both engines truncate to micros on
read and ``unix_millis``/``epoch_ms`` truncate identically to ms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
)
from data_engineering_capstone_project_spark.plans.registry import (
    events_table,
    query,
    table,
)


@query(
    "views_asof_purchase",
    oracle="""
    WITH ev AS (SELECT event_id, epoch_ms(ts) AS ms, user_id, event_type, value
                FROM events),
         v AS (SELECT event_id, user_id, ms AS view_ms
               FROM ev WHERE event_type = 'view'),
         p AS (SELECT user_id, ms AS pur_ms, floor(max(value) * 10000) / 10000.0 AS purchase_value
               FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT v.event_id, v.user_id, v.view_ms, p.pur_ms, p.purchase_value
    FROM v ASOF LEFT JOIN p
      ON v.user_id = p.user_id AND p.pur_ms <= v.view_ms
    """,
)
def views_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each 'view' event matched to the same
    user's latest 'purchase' at-or-before it. Purchases are
    pre-aggregated per (user, ms) so the as-of winner is unique."""
    ev = events_table(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.unix_millis("ts").alias("view_ms")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_millis("ts").alias("pur_ms"))
        .agg((F.floor(F.max("value") * 10000) / F.lit(10000.0)).alias("purchase_value"))
    )
    return asof_join(
        views,
        purchases,
        on="user_id",
        left_time="view_ms",
        right_time="pur_ms",
        value_cols=["pur_ms", "purchase_value"],
        how="left",
    )


@query(
    "orders_within_90d",
    oracle="""
    SELECT a.o_orderkey AS okey_a,
           b.o_orderkey AS okey_b,
           CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS INTEGER) AS day_gap
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND b.o_orderdate >  a.o_orderdate
     AND b.o_orderdate <= a.o_orderdate + INTERVAL 90 DAY
    """,
)
def orders_within_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self range join: pairs of orders by the same customer where the
    second falls within 90 days after the first. The bucketed rewrite
    keeps this an equi-join shuffle instead of a nested-loop — the
    oracle states the same interval predicate directly."""
    o = table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey_a"),
        days.alias("day_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey_b"),
        days.alias("day_b"),
    )
    joined = range_join_bucketed(
        a, b, on="custkey", left_time="day_a", right_time="day_b",
        lower=0, upper=90,
    )
    return joined.select(
        "okey_a",
        "okey_b",
        (F.col("day_b") - F.col("day_a")).cast("int").alias("day_gap"),
    )


@query(
    "conversion_lag_percentiles",
    oracle="""
    WITH ev AS (SELECT epoch_ms(ts) AS ms, user_id, event_type
                FROM events WHERE user_id IS NOT NULL),
         v AS (SELECT user_id, ms AS view_ms FROM ev
               WHERE event_type = 'view'),
         p AS (SELECT DISTINCT user_id, ms AS pur_ms FROM ev
               WHERE event_type = 'purchase'),
         j AS (
             SELECT v.view_ms, p.pur_ms
             FROM v ASOF LEFT JOIN p
               ON v.user_id = p.user_id AND p.pur_ms >= v.view_ms
         )
    SELECT count(*) AS total_views,
           count(pur_ms) AS converted_views,
           CAST(floor(quantile_cont(pur_ms - view_ms, 0.5)) AS BIGINT)
               AS p50_lag_ms,
           CAST(floor(quantile_cont(pur_ms - view_ms, 0.9)) AS BIGINT)
               AS p90_lag_ms,
           CAST(max(pur_ms - view_ms) AS BIGINT) AS max_lag_ms
    FROM j
    """,
)
def conversion_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel TIMING: how long after a view does the purchase come?
    Each view is matched FORWARD to the same user's earliest purchase
    at-or-after it, and the lag distribution is summarized (exact
    interpolated p50/p90 per the price_percentiles precedent, plus the
    max and the converted/total counts). The forward as-of is the SAME
    ``asof_join`` operator the attribution query uses, pointed the
    other way by the negated-time trick: maximizing -t over
    -pur <= -view IS minimizing t over pur >= view, so one union+window
    implementation serves both directions — while the oracle uses
    DuckDB's native ASOF with the >= predicate, independently
    validating the reversal. Views that never convert stay as NULL
    lags (count(pur_ms) vs count(*) is the conversion rate; percentile
    ignores NULLs identically in both engines).

    Scale shape: the as-of is the union+window single-shuffle form
    (one user_id Exchange, O(1) window state); the summary is one
    global aggregate. The exact percentile's single-node sort-by-group
    is the documented trade-off — at 100 TB swap approx_percentile,
    same call shape."""
    ev = events_table(spark, sf_dir).filter(F.col("user_id").isNotNull())
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.unix_millis("ts").alias("view_ms"),
        (-F.unix_millis("ts")).alias("vneg"),
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
    j = asof_join(
        views,
        purchases,
        on="user_id",
        left_time="vneg",
        right_time="pneg",
        value_cols=["pur_ms"],
        how="left",
    )
    lag = F.col("pur_ms") - F.col("view_ms")
    return j.agg(
        F.count("*").alias("total_views"),
        F.count("pur_ms").alias("converted_views"),
        F.floor(F.expr("percentile(pur_ms - view_ms, 0.5)"))
        .cast("bigint")
        .alias("p50_lag_ms"),
        F.floor(F.expr("percentile(pur_ms - view_ms, 0.9)"))
        .cast("bigint")
        .alias("p90_lag_ms"),
        F.max(lag).cast("bigint").alias("max_lag_ms"),
    )
