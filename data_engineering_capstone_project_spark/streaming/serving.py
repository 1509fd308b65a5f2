"""Incremental aggregate maintenance: a streaming foreachBatch loop
that keeps a compact parquet "serving table" (per-user totals) up to
date as events arrive — the materialized-view pattern every dashboard/
feature-store pipeline needs, built from pieces this repo already
ships: foreachBatch orchestration + publish_swap crash-consistent
publication.

Exactly-once math from at-least-once machinery: foreachBatch may
re-deliver a micro-batch after a crash (the side effect is NOT inside
the checkpoint transaction), so the merge records the applied batch id
IN the table and skips any batch id it has already folded in —
idempotent replay, the same trick transactional sinks use with commit
epochs.

Scale posture: the serving table is an AGGREGATE (one row per user),
orders of magnitude smaller than the stream; the merge is a full-outer
join of (tiny serving) x (tiny batch increment) and a rewrite of the
tiny table, atomically swapped. The stream itself is only ever scanned
once per micro-batch for the groupBy increment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.sources.writers import (
    publish_swap,
)

_STAGED = ".__staged__"


def _table_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def apply_user_counts_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, serving: str
) -> bool:
    """Fold one micro-batch of events into the per-user serving table.
    Returns False (no-op) if ``batch_id`` was already applied."""
    if _table_exists(spark, serving):
        cur = spark.read.parquet(serving)
        applied = cur.agg(F.max("applied_batch_id")).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return False  # replayed batch: already folded in
    else:
        cur = None

    inc = batch_df.groupBy("user_id").agg(
        F.count("*").alias("d_events"),
        F.sum(F.floor(F.col("value") * 10000).cast("bigint")).alias("d_value_fp"),
    )
    if cur is None:
        merged = inc.select(
            "user_id",
            F.col("d_events").alias("n_events"),
            F.col("d_value_fp").alias("value_fp"),
        )
    else:
        merged = (
            cur.select("user_id", "n_events", "value_fp")
            .join(inc, "user_id", "full_outer")
            .select(
                "user_id",
                (
                    F.coalesce("n_events", F.lit(0))
                    + F.coalesce("d_events", F.lit(0))
                ).alias("n_events"),
                (
                    F.coalesce("value_fp", F.lit(0))
                    + F.coalesce("d_value_fp", F.lit(0))
                ).alias("value_fp"),
            )
        )
    staged = serving + _STAGED
    merged.withColumn("applied_batch_id", F.lit(batch_id)).write.mode(
        "overwrite"
    ).parquet(staged)
    publish_swap(spark, staged, serving)
    return True


def maintain_user_counts(
    events: DataFrame, serving: str, checkpoint: str
) -> None:
    """Drain the events stream (availableNow) into the serving table.
    Restart-safe twice over: the checkpoint skips committed source
    files, and the batch-id guard makes a re-delivered batch a no-op."""
    spark = events.sparkSession

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        apply_user_counts_batch(spark, batch_df, batch_id, serving)

    q = (
        events.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
