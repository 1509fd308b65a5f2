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

# Durable applied-batch-id watermark: a sidecar file inside the
# serving dir (underscore prefix = invisible to the parquet scan),
# written into the STAGED dir before the atomic publish so it can
# never disagree with the data it ships with.
_WATERMARK_FILE = "_APPLIED_BATCH_ID"


def _table_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def applied_watermark(spark: SparkSession, serving: str) -> int | None:
    """Highest batch id folded into a serving dir, or None for fresh
    state. Durable against EMPTY state (r7 empty-input audit): the
    guard used to live ONLY as a column on the data rows, so a quiet
    stream whose first batches are all empty had max(column) = NULL
    and a crash-replayed empty batch re-returned True — data-safe for
    additive/mergeable merges (re-merging an empty batch is a no-op)
    but a broken idempotence contract. The sidecar file keeps the
    watermark even at zero rows; tables written before the sidecar
    existed fall back to the guard column's max. Hadoop FS API
    throughout, so file://, hdfs://, s3a:// serving dirs all work."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{serving}/{_WATERMARK_FILE}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        stream = fs.open(p)
        try:
            txt = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        try:
            return int(txt.strip())
        except ValueError:
            pass  # unreadable sidecar: fall back to the column
    if _table_exists(spark, serving):
        return (
            spark.read.parquet(serving)
            .agg(F.max("applied_batch_id"))
            .collect()[0][0]
        )
    return None


def _stage_watermark(spark: SparkSession, staged: str, batch_id: int) -> None:
    """Write the watermark sidecar into a staged dir (pre-publish)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{staged}/{_WATERMARK_FILE}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(str(batch_id).encode()))
    finally:
        out.close()


def _user_counts_increment(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's contribution to the per-user totals (count +
    fixed-point value sum — both additive). The sum is coalesced to 0:
    a user whose batch has only NULL values must contribute 0, not
    NULL — the generic merge coalesces NULL state to 0 on the NEXT
    merge anyway, so an uncoalesced increment would make the final
    value depend on HOW MANY batches a user's rows spanned (NULL if
    one, 0 if several). Additive state must be NULL-free from birth."""
    return batch_df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.coalesce(
            F.sum(F.floor(F.col("value") * 10000).cast("bigint")), F.lit(0)
        ).alias("value_fp"),
    )


def apply_user_counts_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, serving: str
) -> bool:
    """Fold one micro-batch of events into the per-user serving table.
    Returns False (no-op) if ``batch_id`` was already applied. A thin
    delegation to ``apply_additive_batch`` — ONE implementation of the
    guard/merge/swap protocol, so a protocol fix cannot diverge between
    sinks."""
    return apply_additive_batch(
        spark,
        batch_df,
        batch_id,
        serving,
        _user_counts_increment,
        keys=["user_id"],
        sum_cols=["n_events", "value_fp"],
    )


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


def apply_additive_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    serving: str,
    inc_fn,
    keys: list[str],
    sum_cols: list[str],
) -> bool:
    """Generic idempotent additive merge: fold one micro-batch into a
    keyed serving table whose measure columns are all ADDITIVE (counts,
    fixed-point sums — the class of aggregates that can be maintained
    incrementally without re-reading history). ``inc_fn`` maps the raw
    batch to its (keys + sum_cols) increment; the merge is a full-outer
    join of two aggregate-sized tables plus coalesce-adds, staged and
    atomically published. The batch-id guard makes crash-replayed
    batches no-ops (same contract as ``apply_user_counts_batch``),
    including EMPTY batches — the watermark survives zero-row state
    via the ``applied_watermark`` sidecar."""
    applied = applied_watermark(spark, serving)
    if applied is not None and batch_id <= applied:
        return False
    cur = spark.read.parquet(serving) if _table_exists(spark, serving) else None

    inc = inc_fn(batch_df)
    if cur is None:
        merged = inc.select(*keys, *sum_cols)
    else:
        # Null-safe key equality: a name-based full_outer join never
        # matches NULL keys, so a NULL-keyed row (null ts -> null
        # window, null value -> null bucket) would fork into a new row
        # every batch instead of merging. eqNullSafe merges them; the
        # key columns are then re-coalesced manually since only
        # name-based joins auto-coalesce.
        c, i = cur.select(*keys, *sum_cols).alias("c"), inc.alias("i")
        cond = None
        for k in keys:
            eq = F.col(f"c.{k}").eqNullSafe(F.col(f"i.{k}"))
            cond = eq if cond is None else cond & eq
        out_keys = [
            F.coalesce(F.col(f"c.{k}"), F.col(f"i.{k}")).alias(k) for k in keys
        ]
        add = [
            (
                F.coalesce(F.col(f"c.{m}"), F.lit(0))
                + F.coalesce(F.col(f"i.{m}"), F.lit(0))
            ).alias(m)
            for m in sum_cols
        ]
        merged = c.join(i, cond, "full_outer").select(*out_keys, *add)
    staged = serving + _STAGED
    merged.withColumn("applied_batch_id", F.lit(batch_id)).write.mode(
        "overwrite"
    ).parquet(staged)
    _stage_watermark(spark, staged, batch_id)
    publish_swap(spark, staged, serving)
    return True


def trending_increment(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's contribution to the sliding-window trending
    counts: each event lands map-side in its 4 covering 1-hour windows
    (slide 15 min) — the same expansion as the batch
    ``trending_event_types`` query, so the maintained table converges
    to the batch answer."""
    return (
        batch_df.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("events"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "events",
        )
    )


def maintain_trending_counts(
    events: DataFrame, serving: str, checkpoint: str
) -> None:
    """Drain the events stream (availableNow) into the per-(window,
    type) counts table. The serving table is the aggregated
    window x type grid — O(windows x types), independent of event
    volume — so each micro-batch merge joins two tiny aggregates."""
    spark = events.sparkSession

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        apply_additive_batch(
            spark,
            batch_df,
            batch_id,
            serving,
            trending_increment,
            keys=["window_start", "event_type"],
            sum_cols=["events"],
        )

    q = (
        events.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def trending_topk_view(spark: SparkSession, serving: str, k: int = 3) -> DataFrame:
    """Read-time rank over the maintained counts grid: top-k event
    types per window (count desc, type asc tiebreak) — the streaming
    twin of the batch ``trending_event_types`` query. Ranking at read
    time (not merge time) keeps the maintained state purely additive,
    which is what makes replayed batches safely idempotent."""
    from pyspark.sql.window import Window

    counts = spark.read.parquet(serving)
    rnk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("events"),
            # nulls_last: Spark asc() sorts NULL FIRST, ANSI/DuckDB default
            # is NULLS LAST — a NULL event_type flipped the tie rank (r8
            # adversarial-events audit)
            F.asc_nulls_last("event_type")
        )
    )
    return (
        counts.select("window_start", "event_type", "events")
        .withColumn("rnk", rnk)
        .filter(F.col("rnk") <= k)
    )


def value_histogram_increment(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's contribution to the per-user value histogram:
    counts at (user_id, bucket) grain, bucket = floor(value * 4)
    clamped to [0, 63] (uniform 0.25-wide bins over the value domain —
    swap for log buckets when the domain is heavy-tailed). A bucketed
    histogram is the MERGEABLE percentile sketch: bucket counts are
    additive, so the serving table maintains incrementally with the
    same machinery as any counts grid, and any percentile is readable
    from the cumulative bucket mass at any time. Accuracy is one
    bucket width — fixed and known, unlike a sampled quantile."""
    # greatest()/least() SKIP nulls, so clamping first would silently
    # fold value=NULL into bucket 0 and skew every percentile toward 0;
    # a NULL value must stay a NULL bucket (merged across batches by
    # the null-safe key equality, surfaced to the reader as its own
    # row rather than laundered into real mass).
    # Clamp BEFORE the int cast: floor(value*4) on an extreme value
    # (4e9 at value=1e9) overflowed the INT cast under ANSI before the
    # clamp could bound it (r8 adversarial-events audit); clamping in
    # the long domain makes the final cast provably in [0, 63].
    clamped = F.least(
        F.lit(63), F.greatest(F.lit(0), F.floor(F.col("value") * 4))
    ).cast("int")
    bucket = F.when(F.col("value").isNotNull(), clamped)
    return (
        batch_df.groupBy(F.col("user_id"), bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def maintain_value_histograms(
    events: DataFrame, serving: str, checkpoint: str
) -> None:
    """Drain the events stream (availableNow) into the per-(user,
    bucket) histogram table — O(users x 64) rows regardless of event
    volume; each micro-batch merge joins two aggregate-sized tables."""
    spark = events.sparkSession

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        apply_additive_batch(
            spark,
            batch_df,
            batch_id,
            serving,
            value_histogram_increment,
            keys=["user_id", "bucket"],
            sum_cols=["n"],
        )

    q = (
        events.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def user_percentile_view(
    spark: SparkSession, serving: str, p: float = 0.95
) -> DataFrame:
    """Read-time percentile over the maintained histograms: for each
    user, the lower edge of the first bucket whose cumulative count
    reaches p of the user's total — i.e. the bucket-resolution
    p-quantile. All-integer compare (cum * 1 >= p-scaled total via
    multiply, no division), so the answer is deterministic; the
    window runs over <= 64 rows per user."""
    from pyspark.sql.window import Window

    # NULL buckets hold events whose value was NULL — unknown values
    # are counted in the grid (visible to a data-quality reader) but
    # must not contribute mass to a VALUE percentile.
    h = spark.read.parquet(serving).filter(F.col("bucket").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled = int(round(p * 10000))
    cum = F.sum("n").over(w)
    tot = F.sum("n").over(Window.partitionBy("user_id"))
    hit = (
        h.select("user_id", "bucket", cum.alias("cum"), tot.alias("tot"))
        .filter(F.col("cum") * 10000 >= F.col("tot") * F.lit(scaled))
        .groupBy("user_id")
        .agg(F.min("bucket").alias("bucket"))
    )
    return hit.select(
        "user_id", (F.col("bucket") / F.lit(4.0)).alias(f"p{int(p * 100)}_value")
    )


def drift_histogram_increment(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's contribution to the drift-monitoring grid:
    counts at (day, bucket) grain — day = epoch-day of the event time,
    bucket = floor(value / 25) clamped to [0, 19], the same 20-bin
    layout as the batch ``event_value_drift`` query. Day-keyed bucket
    counts are ADDITIVE, so the stream maintains the whole
    distribution history incrementally with the generic merge; the
    drift statistic itself is computed at READ time (``drift_view``),
    which keeps the maintained state purely additive and
    replay-idempotent — the same rank-at-read / merge-additive split
    as the trending top-k. NULL ts or value stay NULL keys (visible to
    a quality reader, excluded from the statistic)."""
    from data_engineering_capstone_project_spark.plans.events_windows import (
        drift_value_bucket,
    )

    day = F.when(
        F.col("ts").isNotNull(),
        F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast(
            "long"
        ),
    )
    bucket = drift_value_bucket(F.col("value"))
    return batch_df.groupBy(day.alias("day"), bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


def maintain_drift_histogram(
    events: DataFrame, serving: str, checkpoint: str
) -> None:
    """Drain the events stream (availableNow) into the (day, bucket)
    distribution grid — O(days x 20) rows regardless of volume."""
    spark = events.sparkSession

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        apply_additive_batch(
            spark,
            batch_df,
            batch_id,
            serving,
            drift_histogram_increment,
            keys=["day", "bucket"],
            sum_cols=["n"],
        )

    q = (
        events.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drift_view(spark: SparkSession, serving: str) -> DataFrame:
    """Read-time distribution drift from the maintained grid: the
    LATEST day is the current window, every earlier day pools into the
    reference, and each bucket contributes its chi-square-distance
    term (p-q)^2/(p+q) — the SAME ``chi2_report`` helper as the batch
    ``event_value_drift`` query (one definition of the fixed-point
    arithmetic), evaluated over at most days x 20 rows (no event data
    is ever re-read). Emits one row per bucket observed in either
    window; on day one (no history yet) the reference proportions are
    NULL-safe, so every chi2 is NULL rather than an ANSI
    division-by-zero error."""
    from pyspark.sql.functions import broadcast

    from data_engineering_capstone_project_spark.plans.events_windows import (
        chi2_report,
    )

    h = (
        spark.read.parquet(serving)
        .filter(F.col("day").isNotNull() & F.col("bucket").isNotNull())
    )
    latest = h.agg(F.max("day").alias("latest"))
    counts = (
        h.join(broadcast(latest))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("day") < F.col("latest"), F.col("n")).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("day") == F.col("latest"), F.col("n")).otherwise(0)).alias("n_cur"),
        )
    )
    return chi2_report(counts)


def apply_kmv_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    serving: str,
    group_col: str,
    id_col: str,
) -> bool:
    """Idempotent MERGEABLE-SKETCH maintenance — the serving-table
    protocol extended beyond additive state: a distinct count cannot
    be kept as an additive counter (users repeat across batches), but
    the KMV k-min set CAN be folded incrementally because k-min is
    associative — k-min(state ∪ batch) = k-min(state ∪ k-min(batch)).
    The maintained table holds at most k hash rows per group (plus
    the applied-batch-id guard column), so every merge unions two
    (groups × k)-sized frames, re-takes the k smallest per group, and
    atomically publishes — the same stage+publish+batch-id-guard
    discipline as ``apply_additive_batch``, applied to the sketch
    class. Read-time: aggregate the rows to (kth, n) and apply
    ``kmv_estimate`` — see ``kmv_serving_view``.

    This is how a dashboard serves "distinct users per event type,
    all time" without ever re-reading history: per batch the stream
    is scanned once for its hash rows; state stays sketch-sized
    forever (the HLL use case, with an engine-exact sketch)."""
    from pyspark.sql.window import Window

    from data_engineering_capstone_project_spark.operators.sketches import (
        KMV_K,
        kmv_partials,
    )

    applied = applied_watermark(spark, serving)
    if applied is not None and batch_id <= applied:
        return False
    if _table_exists(spark, serving):
        pooled = spark.read.parquet(serving).select(group_col, "h")
    else:
        pooled = None

    partial = kmv_partials(
        batch_df.withColumn("_slc", F.lit(0)), group_col, "_slc", id_col
    ).select(group_col, "h")
    if pooled is not None:
        pooled = pooled.unionByName(partial).distinct()
    else:
        pooled = partial.distinct()
    w = Window.partitionBy(group_col).orderBy(F.asc("h"))
    merged = (
        pooled.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= KMV_K)
        .select(group_col, "h")
        .withColumn("applied_batch_id", F.lit(batch_id))
    )
    staged = serving + _STAGED
    merged.write.mode("overwrite").parquet(staged)
    _stage_watermark(spark, staged, batch_id)
    publish_swap(spark, staged, serving)
    return True


def kmv_serving_view(
    spark: SparkSession, serving: str, group_col: str
) -> DataFrame:
    """Read-time distinct-count estimates over the maintained k-min
    rows: aggregate to (group, kth, n) and apply the shared
    ``kmv_estimate`` — identical arithmetic to the batch sketch, so
    the maintained table hash-matches a from-scratch sketch (the
    ``kmv_streamed_parity`` driver row)."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        kmv_estimate,
    )

    rows = spark.read.parquet(serving)
    sk = rows.groupBy(group_col).agg(
        F.max("h").alias("kth"), F.count("*").alias("n")
    )
    return sk.select(
        group_col, "kth", "n", kmv_estimate().alias("kmv_estimate")
    )


def decayed_partials_increment(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's contribution to the (user, day) fixed-point
    value partials behind read-time exponential decay: plain additive
    counters (event count + floor(value*1e4) sum per user-day), so the
    sketch folds through ``apply_additive_batch`` unchanged. The decay
    itself happens at READ time (``decayed_scores_view``): partials are
    anchored by shifting, never re-written — which is what makes a
    half-life score maintainable incrementally at all. NULL user_ids
    are excluded to match the batch query's contract; the value sum is
    coalesced to 0 (additive state must be NULL-free from birth — see
    _user_counts_increment)."""
    return (
        # ts IS NOT NULL (r8): an untimestamped event has no DAY, and a
        # NULL-day partial would age differently per engine at read
        # time — same contract as every day/week-grain query.
        batch_df.filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .groupBy(
            "user_id",
            F.floor(F.col("ts").cast("long") / F.lit(86400)).alias("d"),
        )
        .agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.floor(F.col("value") * 10000).cast("bigint")),
                F.lit(0),
            ).alias("v_fp"),
        )
    )


def decayed_scores_view(spark: SparkSession, serving: str) -> DataFrame:
    """Read-time half-life scores from the maintained (user, day)
    partials: anchor at the latest maintained day, shift each day's
    fixed-point sum right by its age (exact floor(v/2^age) — the same
    arithmetic as the batch ``time_decayed_user_scores``), and sum per
    user. Runs over the user x active-days grid — no event is ever
    re-read, and a later anchor only means one more shift."""
    from pyspark.sql.functions import broadcast

    t = spark.read.parquet(serving).filter(F.col("d").isNotNull())
    anchor = t.agg(F.max("d").alias("anchor"))
    return (
        t.join(broadcast(anchor))
        .withColumn("age", (F.col("anchor") - F.col("d")).cast("int"))
        .groupBy("user_id")
        .agg(
            (F.sum(F.expr("shiftright(v_fp, age)")) / F.lit(10000.0)).alias(
                "decayed_score"
            ),
            F.sum("n").alias("events"),
            F.min("age").cast("bigint").alias("freshest_age_days"),
        )
    )


def _ohlc_increment(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's OHLC partial state per (event_type, hr):
    endpoint triples (ms, event_id, value_fp) for open (earliest) and
    close (latest), extremes, and the bar count — the exact
    partial-aggregation state Spark's own min_by/max_by carry between
    map and reduce, materialized so it can live in a table."""
    base = batch_df.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.unix_millis("ts") / F.lit(3600000)).alias("hr"),
        F.unix_millis("ts").alias("ms"),
        "event_id",
        F.floor(F.col("value") * F.lit(10000)).cast("bigint").alias("v_fp"),
    )
    trip = F.struct("ms", "event_id", "v_fp")
    order = F.struct("ms", "event_id")
    return base.groupBy("event_type", "hr").agg(
        F.min_by(trip, order).alias("o"),
        F.max_by(trip, order).alias("c"),
        F.max("v_fp").alias("high_fp"),
        F.min("v_fp").alias("low_fp"),
        F.count("*").alias("n"),
    ).select(
        "event_type",
        "hr",
        F.col("o.ms").alias("o_ms"),
        F.col("o.event_id").alias("o_eid"),
        F.col("o.v_fp").alias("open_fp"),
        F.col("c.ms").alias("c_ms"),
        F.col("c.event_id").alias("c_eid"),
        F.col("c.v_fp").alias("close_fp"),
        "high_fp",
        "low_fp",
        "n",
    )


_OHLC_STATE = [
    "o_ms", "o_eid", "open_fp", "c_ms", "c_eid", "close_fp",
    "high_fp", "low_fp", "n",
]


def apply_ohlc_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    serving: str,
) -> bool:
    """Idempotent MERGEABLE-AGGREGATE maintenance, second instance of
    the beyond-additive serving class (KMV k-min sets were the first):
    OHLC bars cannot be additive counters (open/close depend on event
    ORDER), but their state merges associatively — the union's open is
    the min_by over the two opens, the close the max_by, extremes
    min/max, count a sum. So the maintained table holds one
    endpoint-and-extremes row per (type, hour) bar and every merge is
    a union of two bar-grid-sized frames re-aggregated, under the same
    stage+publish+batch-id-guard discipline as every other serving
    table. Read-time rendering (``ohlc_serving_view``) matches the
    batch ``ohlc_hourly_bars`` bit-for-bit — the parity the driver
    re-verifies."""
    applied = applied_watermark(spark, serving)
    if applied is not None and batch_id <= applied:
        return False
    if _table_exists(spark, serving):
        state = spark.read.parquet(serving).select(
            "event_type", "hr", *_OHLC_STATE
        )
    else:
        state = None

    inc = _ohlc_increment(batch_df)
    pooled = inc if state is None else state.unionByName(inc)
    otrip = F.struct("o_ms", "o_eid", "open_fp")
    ctrip = F.struct("c_ms", "c_eid", "close_fp")
    merged = pooled.groupBy("event_type", "hr").agg(
        F.min_by(otrip, F.struct("o_ms", "o_eid")).alias("o"),
        F.max_by(ctrip, F.struct("c_ms", "c_eid")).alias("c"),
        F.max("high_fp").alias("high_fp"),
        F.min("low_fp").alias("low_fp"),
        F.sum("n").alias("n"),
    ).select(
        "event_type",
        "hr",
        F.col("o.o_ms").alias("o_ms"),
        F.col("o.o_eid").alias("o_eid"),
        F.col("o.open_fp").alias("open_fp"),
        F.col("c.c_ms").alias("c_ms"),
        F.col("c.c_eid").alias("c_eid"),
        F.col("c.close_fp").alias("close_fp"),
        "high_fp",
        "low_fp",
        "n",
    ).withColumn("applied_batch_id", F.lit(batch_id))
    staged = serving + _STAGED
    merged.write.mode("overwrite").parquet(staged)
    _stage_watermark(spark, staged, batch_id)
    publish_swap(spark, staged, serving)
    return True


def ohlc_serving_view(spark: SparkSession, serving: str) -> DataFrame:
    """Render the maintained OHLC state as the dashboard bar table —
    the same columns (and fixed-point /1e4 arithmetic) as the batch
    ``ohlc_hourly_bars`` query, so parity is a straight hash match."""
    rows = spark.read.parquet(serving)
    return rows.select(
        "event_type",
        "hr",
        (F.col("open_fp") / F.lit(10000.0)).alias("open"),
        (F.col("high_fp") / F.lit(10000.0)).alias("high"),
        (F.col("low_fp") / F.lit(10000.0)).alias("low"),
        (F.col("close_fp") / F.lit(10000.0)).alias("close"),
        F.col("n").cast("bigint").alias("n_events"),
    )


def oov_drift_increment(sym_ids: DataFrame, learned: list):
    """Increment factory for the 9th maintained table (r10): per-source
    frozen-vocab token statistics over an arriving DOCUMENT stream —
    the OOV-drift monitor a production tokenizer deployment runs so a
    shifting corpus (new language, new format, encoding bug upstream)
    is caught as a rising unk share per source, not as silently
    corrupted training shards.

    The frozen artifacts (the trained merge list and the (sym, tid)
    table — what ``bpe_learn_merges``/``bpe_vocab_table`` publish)
    arrive as constructor args; the returned ``inc_fn`` maps one
    micro-batch of documents to its additive (source, docs, tokens,
    unks) contribution: apply the frozen merges to the batch's
    distinct words, LEFT-join the id table (an unseen symbol is a
    counted UNK, never a drop — ``bpe_encode_incremental``'s
    contract), and aggregate per source. All three measures are
    additive across batches — docs because the stream partitions
    documents (each doc_id arrives exactly once; crash replays are
    no-opped by the batch-id guard), tokens/unks as plain sums — so
    the generic ``apply_additive_batch`` merge maintains the table.

    Scale shape: each micro-batch does batch-vocab-sized merge passes
    plus one batch-sized token-stream join; the serving table is
    O(sources), so every merge joins two tiny aggregates."""
    from data_engineering_capstone_project_spark.operators import dedup as D
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        bpe_apply_merges,
    )

    def inc(batch_df: DataFrame) -> DataFrame:
        nvocab = (
            batch_df.select(
                F.explode(D.tokenize(F.col("text"))).alias("word")
            )
            .groupBy("word")
            .agg(F.count("*").alias("wf"))
        )
        wp = bpe_apply_merges(nvocab, learned)
        word_stats = (
            wp.join(F.broadcast(sym_ids), "sym", "left")
            .groupBy("word")
            .agg(
                F.count("*").cast("bigint").alias("wtoks"),
                F.sum(F.col("tid").isNull().cast("bigint"))
                .cast("bigint")
                .alias("wunks"),
            )
        )
        dt = batch_df.select(
            "doc_id", "source", F.explode(D.tokenize(F.col("text"))).alias("word")
        )
        return dt.join(word_stats, "word").groupBy("source").agg(
            F.countDistinct("doc_id").cast("bigint").alias("docs"),
            F.sum("wtoks").cast("bigint").alias("tokens"),
            F.sum("wunks").cast("bigint").alias("unks"),
        )

    return inc


def maintain_oov_drift(
    docs_stream: DataFrame,
    serving: str,
    checkpoint: str,
    sym_ids: DataFrame,
    learned: list,
) -> list[tuple[int, bool]]:
    """Drain a DOCUMENT stream (availableNow) into the per-source
    OOV-drift table — the production wiring of
    ``oov_drift_increment`` into ``foreachBatch``, exactly as
    ``maintain_trending_counts`` wires the trending increment. The
    frozen tokenizer artifacts are bound once at query start (in
    production, loaded from the published ``bpe_learn_merges`` /
    ``bpe_vocab_table`` tables); every micro-batch encodes only its
    own documents and folds an O(sources) aggregate into the serving
    table through the idempotent stage+publish merge.

    Returns the per-batch applied log ``[(batch_id, applied), ...]``
    in delivery order (r11 advice fix): ``apply_additive_batch``
    reports whether the batch-id guard let the batch through, and
    discarding that boolean left a guard regression visible only as
    a downstream oracle hash mismatch (doubled counts). A replay run
    can now raise the moment any redelivered batch reports
    ``applied=True`` — the same explicit failure mode the hand-loop
    parities have always had ("guard failed to skip replay").
    foreachBatch callbacks run on the driver in PySpark, so the
    closure-appended list is ordinary single-process state."""
    spark = docs_stream.sparkSession
    inc = oov_drift_increment(sym_ids, learned)
    applied_log: list[tuple[int, bool]] = []

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        applied = apply_additive_batch(
            spark,
            batch_df,
            batch_id,
            serving,
            inc,
            keys=["source"],
            sum_cols=["docs", "tokens", "unks"],
        )
        applied_log.append((batch_id, applied))

    q = (
        docs_stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return applied_log
