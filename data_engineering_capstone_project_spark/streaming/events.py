"""Structured Streaming event-time operators (SURVEY.md §2.11 extended
surface). The reference has no streaming; its closest analogue is the
"daily batch, partition by date" scaling answer (reference
README.md:116-117). Here every windowed aggregation is ONE transform
function applied to either a batch or a streaming DataFrame -- the
batch twins are the oracle-checked queries in plans.events_windows, so
streaming correctness is anchored to the same semantics.

Watermarks bound state: with ``withWatermark("ts", X)`` Spark drops
window state older than X behind the max event time, so a 100 TB/day
stream holds only O(windows-in-X) state per key instead of growing
forever. Late rows beyond X are dropped (documented, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events_from_dir(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events directory (parquet). The file
    source is exactly-once and replayable -- the batch/stream parity
    anchor for tests."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


# ---------------------------------------------------------------------------
# Transforms: each takes a DataFrame (batch OR streaming) and returns the
# windowed aggregate; streaming callers get watermarking applied first.


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "events",
            "value_sum",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("events"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "events", "value_sum")
    )


def session_aggregate(
    events: DataFrame, gap: str = "10 minutes", watermark: str | None = None
) -> DataFrame:
    """Session windows per user (dynamic-length windows merged on
    overlap). In streaming mode a watermark is REQUIRED by Spark --
    session state would otherwise be unbounded."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_available_now_to_parquet(
    stream_df: DataFrame, path: str, checkpoint: str
) -> None:
    """Drain available input into an append-mode parquet sink with a
    checkpoint — the durable production sink. The checkpoint records
    which source files were committed, so re-running after a stop (or
    crash) processes only NEW files and never duplicates rows:
    exactly-once, the property that matters for a 100 TB/day ingest
    that restarts daily."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_events_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source shape for the events stream: value bytes -> JSON ->
    typed columns, same schema as the file source so every transform in
    this package runs unchanged on either. Requires the
    spark-sql-kafka connector on the classpath (not present in this
    environment — the plan construction below is the tested seam; the
    .load() raises without the package)."""
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e")
    ).select("e.*")


def run_foreach_batch(
    stream_df: DataFrame, fn, checkpoint: str
) -> None:
    """Drain available input through ``fn(batch_df, batch_id)`` — the
    escape hatch for sinks Structured Streaming lacks (multi-sink
    fan-out, JDBC upserts, partition-aligned overwrite). The checkpoint
    tracks committed batch ids, so a restart never re-invokes ``fn``
    for data already processed; ``fn`` itself must be idempotent per
    batch_id to make the pipeline exactly-once end to end (batch_id is
    stable across retries of the same epoch)."""
    q = (
        stream_df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain everything currently available through the streaming
    engine into an in-memory table ``name`` (test/dev helper; production
    sinks are parquet/Kafka with checkpointing)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def views_purchase_interval_join(
    events: DataFrame, within: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-STREAM inner join with an event-time interval predicate:
    each view matched to same-user purchases within ``within`` after
    it ("did the view convert?"). The same transform runs in batch
    (withWatermark is a no-op there) — the parity pattern the window
    transforms use.

    In streaming mode both sides carry watermarks AND the join
    condition bounds purchase_ts relative to view_ts in both
    directions, which is what lets Spark evict join state: a buffered
    view can stop waiting once the purchase watermark passes
    view_ts + within, so state is O(rate x (watermark + within)),
    never unbounded."""
    v = (
        events.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr(f"INTERVAL {within}")
            ),
        )
        .drop("p_user")
    )


def dedup_events(events: DataFrame, watermark: str = "90 days") -> DataFrame:
    """Exactly-once ingest dedup on event_id (at-least-once upstreams
    re-deliver; this is the first stage of any streaming ingest
    pipeline). Streaming mode uses dropDuplicatesWithinWatermark: the
    per-key state is EVICTED once event time passes the watermark
    horizon, so state is O(rate x watermark window), not O(stream
    lifetime) — the property that makes streaming dedup viable at
    100 TB/day (plain dropDuplicates on a stream retains every key
    forever). Batch twin: dropDuplicates on the same key, same output
    on replay of a bounded input."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def enrich_events(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-STATIC enrichment join: each event picks up its user's
    dimension attributes (the serving-pipeline lookup stage). The
    static side is a batch DataFrame; Spark re-plans it per micro-batch
    and broadcasts it under the join threshold, so the stream is never
    shuffled and no watermark/state is needed (unlike stream-stream
    joins) — the right shape for slowly-changing enrichment at any
    stream rate. Left join: an event with no dimension row passes
    through with NULL attributes rather than silently dropping."""
    return events.join(user_dim, "user_id", "left")


def tumbling_unique_users(
    events: DataFrame, window: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Distinct users per event-time window via approx_count_distinct —
    the ONLY distinct-count that works in streaming aggregation (exact
    COUNT(DISTINCT) needs the full value set per group; HLL sketches
    are O(1) state and merge associatively across micro-batches, so
    the incremental result equals the batch result exactly, not just
    approximately — asserted in test_streaming)."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", window).alias("w"))
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .select(
            F.col("w.start").alias("window_start"),
            "approx_users",
        )
    )
