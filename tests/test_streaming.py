"""Streaming correctness anchored to batch: the same transform function
run over a file-source stream (availableNow) must equal its batch run
on the same data. Also exercises the custom stateful operator across
multiple micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.plans.registry import events_table
from data_engineering_capstone_project_spark.streaming import (
    run_available_now_to_memory,
    session_aggregate,
    sliding_counts,
    stream_events_from_dir,
    tumbling_counts,
)
from data_engineering_capstone_project_spark.streaming.stateful import running_user_profiles
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events with a proper timestamp column, split into 3 files so the
    stream runs several micro-batches."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    events_table(spark, SF_SMALL).repartition(3).write.mode("overwrite").parquet(out)
    return out


def _canon(df):
    # incremental (per-micro-batch) float sums differ from batch sums in
    # the last ulps; round to compare semantics, not summation order
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in df.collect()
    )


def test_tumbling_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = _canon(tumbling_counts(batch))

    stream = stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
    run_available_now_to_memory(tumbling_counts(stream, watermark="90 days"), "t_tumbling")
    got = _canon(spark.table("t_tumbling"))
    assert got == expected


def test_sliding_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = _canon(sliding_counts(batch))

    stream = stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
    run_available_now_to_memory(sliding_counts(stream, watermark="90 days"), "t_sliding")
    assert _canon(spark.table("t_sliding")) == expected


def test_session_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = _canon(session_aggregate(batch, gap="10 minutes"))

    stream = stream_events_from_dir(spark, events_dir)
    run_available_now_to_memory(
        session_aggregate(stream, gap="10 minutes", watermark="90 days"), "t_sessions"
    )
    assert _canon(spark.table("t_sessions")) == expected


def test_stateful_running_profiles(spark, events_dir):
    stream = stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
    run_available_now_to_memory(
        running_user_profiles(stream), "t_profiles", output_mode="update"
    )
    # "update" emits one row per user per micro-batch it appears in;
    # the LAST emission per user must equal the batch totals.
    final = (
        spark.table("t_profiles")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("value_sum").alias("value_sum"))
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
    )
    got = {r.user_id: (r.n_events, round(r.value_sum, 6)) for r in final.collect()}
    exp = {r.user_id: (r.n_events, round(r.value_sum, 6)) for r in batch.collect()}
    assert got == exp


def test_watermark_drops_late_rows(spark, events_dir):
    """With a watermark narrower than the data span and one file per
    micro-batch, rows arriving far behind the max seen event time are
    dropped -- state-bounding is observable behavior."""
    stream = stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
    run_available_now_to_memory(
        tumbling_counts(stream, watermark="1 hour"), "t_late"
    )
    total_windows = spark.table("t_late").count()
    batch_windows = tumbling_counts(spark.read.parquet(events_dir)).count()
    assert total_windows <= batch_windows


def test_checkpointed_parquet_sink_is_exactly_once(spark, tmp_path):
    """Re-running an availableNow stream against the same checkpoint
    must process only files added since the last run — no reprocessing,
    no duplicate rows."""
    from data_engineering_capstone_project_spark.streaming import (
        run_available_now_to_parquet,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    all_events = events_table(spark, SF_SMALL).limit(300).cache()
    first, second = (
        all_events.filter(F.col("event_id") % 2 == 0),
        all_events.filter(F.col("event_id") % 2 == 1),
    )
    first.write.mode("overwrite").parquet(src)

    transform = lambda df: df.filter(F.col("value") >= 0).select(  # noqa: E731
        "event_id", "ts", "user_id", "value"
    )
    stream = lambda: transform(stream_events_from_dir(spark, src))  # noqa: E731

    run_available_now_to_parquet(stream(), sink, ckpt)
    n1 = spark.read.parquet(sink).count()
    assert n1 == transform(first).count()

    # Run again with NO new input: checkpoint says everything committed.
    run_available_now_to_parquet(stream(), sink, ckpt)
    assert spark.read.parquet(sink).count() == n1

    # Append a second batch of source files; only the delta lands.
    second.write.mode("append").parquet(src)
    run_available_now_to_parquet(stream(), sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == transform(all_events).count()
    assert out.select("event_id").distinct().count() == out.count()
    all_events.unpersist()


def test_foreach_batch_dual_sink_and_restart(spark, tmp_path):
    """foreachBatch fans one stream out to two sinks; the checkpoint
    guarantees a restart with no new input never re-invokes the batch
    function (exactly-once orchestration)."""
    from data_engineering_capstone_project_spark.streaming import (
        run_foreach_batch,
    )

    src = str(tmp_path / "src")
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    ckpt = str(tmp_path / "ckpt")
    events = events_table(spark, SF_SMALL).limit(200)
    events.write.mode("overwrite").parquet(src)
    n_src = spark.read.parquet(src).count()

    calls = []

    def dual_sink(batch_df, batch_id):
        calls.append(batch_id)
        batch_df.write.mode("append").parquet(a_dir)
        batch_df.groupBy("event_type").count().write.mode("append").parquet(b_dir)

    stream = lambda: stream_events_from_dir(spark, src)  # noqa: E731
    run_foreach_batch(stream(), dual_sink, ckpt)
    assert len(calls) >= 1
    assert spark.read.parquet(a_dir).count() == n_src
    assert spark.read.parquet(b_dir).count() > 0

    n_calls = len(calls)
    run_foreach_batch(stream(), dual_sink, ckpt)  # restart, no new data
    assert len(calls) == n_calls  # fn never re-invoked
    assert spark.read.parquet(a_dir).count() == n_src


def test_kafka_source_requires_connector(spark):
    """The Kafka seam fails with Spark's standard missing-data-source
    error here (connector jar not shipped in this environment); the
    parse pipeline after .load() is shared with the file source, which
    the parity tests above cover."""
    from data_engineering_capstone_project_spark.streaming.events import (
        stream_events_from_kafka,
    )

    with pytest.raises(Exception, match="(?i)kafka"):
        stream_events_from_kafka(spark, "localhost:9092", "events")


def test_event_time_timeout_closes_sessions(spark, tmp_path):
    """EventTimeTimeout emit-on-close: sessions closed by a later
    same-user event AND sessions closed by watermark timeout must both
    be emitted exactly once, matching the batch session_window twin
    restricted to sessions that ended before the final watermark."""
    import time

    from data_engineering_capstone_project_spark.streaming.stateful import (
        closed_sessions,
    )

    src = str(tmp_path / "sessions_src")
    T = "2024-03-01 {}"

    def write_batch(rows, i):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # file-source batches order by mod time

    # batch 1: user 1 session A (3 events), user 2 session C (2 events)
    write_batch(
        [(1, T.format("10:00:00")), (1, T.format("10:01:00")),
         (1, T.format("10:02:00")), (2, T.format("10:30:00")),
         (2, T.format("10:31:00"))], 0)
    # batch 2: user 1 session B — closes A by gap on arrival
    write_batch([(1, T.format("11:00:00")), (1, T.format("11:01:00"))], 1)
    # batch 3: sentinel advances the watermark far past B and C
    write_batch([(99, T.format("23:00:00"))], 2)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_available_now_to_memory(
        closed_sessions(stream, gap_seconds=600), "t_closed",
        output_mode="append",
    )
    got = _canon(spark.table("t_closed"))

    batch = spark.read.parquet(src)
    from data_engineering_capstone_project_spark.streaming import (
        session_aggregate as batch_sessions,
    )
    final_wm = T.format("23:00:00")
    expected = _canon(
        batch_sessions(batch, gap="10 minutes").filter(
            F.col("session_end") <= F.lit(final_wm).cast("timestamp")
        )
    )
    assert len(expected) == 3  # A, B, C — sentinel session still open
    assert got == expected


def test_stream_stream_interval_join_equals_batch(spark, events_dir):
    from data_engineering_capstone_project_spark.streaming.events import (
        views_purchase_interval_join,
    )

    batch = spark.read.parquet(events_dir)
    expected = _canon(views_purchase_interval_join(batch))
    assert expected, "fixture has no view->purchase conversions"

    stream = stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
    run_available_now_to_memory(
        views_purchase_interval_join(stream, watermark="90 days"),
        "t_ssjoin", output_mode="append",
    )
    assert _canon(spark.table("t_ssjoin")) == expected


def test_stream_dedup_within_watermark(spark, tmp_path_factory):
    """An at-least-once source (every file delivered twice) must come
    out exactly-once: dropDuplicatesWithinWatermark collapses re-
    deliveries across micro-batches while keeping only watermark-
    bounded state. Output must equal the batch twin (dropDuplicates)
    on the same doubled input, which equals the original events."""
    from data_engineering_capstone_project_spark.streaming import dedup_events

    out = str(tmp_path_factory.mktemp("events_dup"))
    ev = events_table(spark, SF_SMALL)
    # Two identical deliveries of the same 2-file batch -> 4 files.
    ev.repartition(2).write.mode("overwrite").parquet(out)
    ev.repartition(2).write.mode("append").parquet(out)

    batch_dedup = dedup_events(spark.read.parquet(out))
    assert batch_dedup.count() == ev.count()
    expected = sorted(r.event_id for r in batch_dedup.select("event_id").collect())

    stream = stream_events_from_dir(spark, out, max_files_per_trigger=1)
    run_available_now_to_memory(
        dedup_events(stream), "t_dedup_stream", output_mode="append"
    )
    got = sorted(
        r.event_id for r in spark.table("t_dedup_stream").select("event_id").collect()
    )
    assert got == expected


def test_stream_funnel_equals_batch(spark, tmp_path_factory):
    """Streaming funnel state (time-ordered micro-batches) must equal
    the batch funnel's per-user flags."""
    from data_engineering_capstone_project_spark.plans.events_windows import funnel_over
    from data_engineering_capstone_project_spark.streaming.stateful import funnel_progress

    # Time-range files so lexicographic listing = event-time order
    # (the operator's cross-batch ordering contract).
    out = str(tmp_path_factory.mktemp("events_funnel"))
    ev = events_table(spark, SF_SMALL)
    ev.repartitionByRange(3, "ts").write.mode("overwrite").parquet(out)

    stream = stream_events_from_dir(spark, out, max_files_per_trigger=1)
    run_available_now_to_memory(
        funnel_progress(stream), "t_funnel_stream", output_mode="update"
    )
    # update-mode memory sink: flags are monotone, so the final state
    # per user is the max of each flag across emitted rows.
    got = {
        r.user_id: (r.seen_view, r.seen_click, r.seen_purchase)
        for r in spark.sql(
            "SELECT user_id, max(seen_view) seen_view,"
            " max(seen_click) seen_click, max(seen_purchase) seen_purchase"
            " FROM t_funnel_stream GROUP BY user_id"
        ).collect()
    }

    # Batch ground truth: re-derive per-user flags with the same state
    # machine over collected events (small at SF_SMALL).
    rows = sorted(
        ev.select("user_id", "ts", "event_id", "event_type").collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    want: dict[int, list[bool]] = {}
    for r in rows:
        s = want.setdefault(r.user_id, [False, False, False])
        if r.event_type == "view":
            s[0] = True
        elif r.event_type == "click" and s[0]:
            s[1] = True
        elif r.event_type == "purchase" and s[1]:
            s[2] = True
    assert got == {u: tuple(s) for u, s in want.items()}

    # And the batch funnel's aggregate counts agree with the state flags.
    agg = funnel_over(ev).collect()[0]
    assert agg.users_view == sum(s[0] for s in want.values())
    assert agg.users_view_click == sum(s[1] for s in want.values())
    assert agg.users_full_funnel == sum(s[2] for s in want.values())


def test_stream_static_enrichment_equals_batch(spark, events_dir):
    """Stream-static left join must equal the batch join on the same
    inputs, and must not drop dimension-less events."""
    from data_engineering_capstone_project_spark.plans.registry import table
    from data_engineering_capstone_project_spark.streaming.events import enrich_events

    # user_id 0..149 ⊂ c_custkey; drop half the dim rows to exercise
    # the NULL-passthrough path.
    dim = (
        table(spark, SF_SMALL, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    batch = spark.read.parquet(events_dir)
    expected = sorted(
        (r.event_id, r.segment)
        for r in enrich_events(batch, dim).select("event_id", "segment").collect()
    )
    assert any(seg is None for _, seg in expected)  # passthrough exercised

    stream = stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
    run_available_now_to_memory(
        enrich_events(stream, dim), "t_enriched", output_mode="append"
    )
    got = sorted(
        (r.event_id, r.segment)
        for r in spark.table("t_enriched").select("event_id", "segment").collect()
    )
    assert got == expected


def test_incremental_serving_table_maintenance(spark, tmp_path):
    """foreachBatch-maintained per-user serving table: final state
    equals the batch aggregate; a checkpointed restart with no new data
    changes nothing; a manually replayed batch id is a no-op."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_user_counts_batch,
        maintain_user_counts,
    )

    src = str(tmp_path / "src")
    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    ev = events_table(spark, SF_SMALL).limit(400).cache()
    ev.repartition(3).write.mode("overwrite").parquet(src)

    maintain_user_counts(stream_events_from_dir(spark, src, max_files_per_trigger=1),
                         serving, ckpt)

    got = {
        r.user_id: (r.n_events, r.value_fp)
        for r in spark.read.parquet(serving).collect()
    }
    want = {
        r.user_id: (r.n_events, r.value_fp)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 10000).cast("bigint")).alias("value_fp"),
        )
        .collect()
    }
    assert got == want

    # Restart with no new input: checkpoint makes it a no-op.
    maintain_user_counts(stream_events_from_dir(spark, src), serving, ckpt)
    assert {
        r.user_id: (r.n_events, r.value_fp)
        for r in spark.read.parquet(serving).collect()
    } == want

    # A re-delivered (already applied) batch id must not double-count.
    max_applied = (
        spark.read.parquet(serving).agg(F.max("applied_batch_id")).collect()[0][0]
    )
    assert not apply_user_counts_batch(spark, ev, max_applied, serving)
    assert {
        r.user_id: (r.n_events, r.value_fp)
        for r in spark.read.parquet(serving).collect()
    } == want
    ev.unpersist()


def test_stream_approx_distinct_equals_batch(spark, events_dir):
    """HLL sketches merge associatively: the micro-batch incremental
    approx_count_distinct must equal the batch run bit-for-bit."""
    from data_engineering_capstone_project_spark.streaming.events import (
        tumbling_unique_users,
    )

    batch = spark.read.parquet(events_dir)
    expected = _canon(tumbling_unique_users(batch))

    stream = stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
    run_available_now_to_memory(
        tumbling_unique_users(stream, watermark="90 days"), "t_uniq"
    )
    assert _canon(spark.table("t_uniq")) == expected


def test_incremental_trending_topk_maintenance(spark, tmp_path):
    """foreachBatch-maintained sliding-window trending counts: the
    read-time top-3 view over the incrementally merged grid equals the
    one-shot batch rank (all-integer counts, so equality is exact);
    a replayed batch id must not double-count."""
    from pyspark.sql.window import Window

    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_additive_batch,
        maintain_trending_counts,
        trending_increment,
        trending_topk_view,
    )

    src = str(tmp_path / "src")
    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    ev = events_table(spark, SF_SMALL).limit(600).cache()
    ev.repartition(3).write.mode("overwrite").parquet(src)

    maintain_trending_counts(
        stream_events_from_dir(spark, src, max_files_per_trigger=1),
        serving,
        ckpt,
    )

    rnk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("events"), F.asc("event_type")
        )
    )
    want = sorted(
        (r.window_start, r.event_type, r.events, r.rnk)
        for r in trending_increment(ev)
        .withColumn("rnk", rnk)
        .filter(F.col("rnk") <= 3)
        .collect()
    )
    got = sorted(
        (r.window_start, r.event_type, r.events, r.rnk)
        for r in trending_topk_view(spark, serving).collect()
    )
    assert got == want

    # A re-delivered batch id is a no-op on the counts grid.
    applied = (
        spark.read.parquet(serving).agg(F.max("applied_batch_id")).collect()[0][0]
    )
    assert not apply_additive_batch(
        spark,
        ev,
        applied,
        serving,
        trending_increment,
        keys=["window_start", "event_type"],
        sum_cols=["events"],
    )
    got2 = sorted(
        (r.window_start, r.event_type, r.events, r.rnk)
        for r in trending_topk_view(spark, serving).collect()
    )
    assert got2 == want


def test_incremental_histogram_percentile_maintenance(spark, tmp_path):
    """foreachBatch-maintained per-(user, bucket) histograms: the
    read-time p95 equals the batch-computed bucket-resolution p95
    (all-integer counts, exact equality), and the maintained grid
    equals the one-shot histogram."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        maintain_value_histograms,
        user_percentile_view,
        value_histogram_increment,
    )

    src = str(tmp_path / "src")
    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    ev = events_table(spark, SF_SMALL).limit(500).cache()
    ev.repartition(3).write.mode("overwrite").parquet(src)

    maintain_value_histograms(
        stream_events_from_dir(spark, src, max_files_per_trigger=1),
        serving,
        ckpt,
    )

    got_grid = {
        (r.user_id, r.bucket): r.n
        for r in spark.read.parquet(serving).collect()
    }
    want_grid = {
        (r.user_id, r.bucket): r.n
        for r in value_histogram_increment(ev).collect()
    }
    assert got_grid == want_grid

    # Batch-side p95 from the same histogram definition.
    import math

    per_user: dict[int, list[tuple[int, int]]] = {}
    for (u, b), n in want_grid.items():
        per_user.setdefault(u, []).append((b, n))
    want_p95 = {}
    for u, pairs in per_user.items():
        pairs.sort()
        tot = sum(n for _, n in pairs)
        cum = 0
        for b, n in pairs:
            cum += n
            if cum * 10000 >= tot * 9500:
                want_p95[u] = b / 4.0
                break
    got_p95 = {
        r.user_id: r.p95_value
        for r in user_percentile_view(spark, serving, 0.95).collect()
    }
    assert got_p95 == want_p95


def test_additive_merge_null_keys_merge_not_fork(spark, tmp_path):
    """A NULL key (null ts -> null window; null value -> null bucket)
    must MERGE across batches via null-safe key equality, not fork a
    fresh row per batch."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_additive_batch,
    )

    serving = str(tmp_path / "serving")

    def inc(df):
        return df.groupBy("k").agg(F.count("*").alias("n"))

    b1 = spark.createDataFrame([(None, 1), ("a", 1), ("a", 2)], "k string, v int")
    b2 = spark.createDataFrame([(None, 3), (None, 4), ("b", 1)], "k string, v int")
    assert apply_additive_batch(spark, b1, 0, serving, inc, ["k"], ["n"])
    assert apply_additive_batch(spark, b2, 1, serving, inc, ["k"], ["n"])

    got = {r.k: r.n for r in spark.read.parquet(serving).collect()}
    assert got == {None: 3, "a": 2, "b": 1}
    assert spark.read.parquet(serving).count() == 3  # no forked NULL rows


def test_histogram_null_values_kept_out_of_percentiles(spark, tmp_path):
    """value=NULL must land in a NULL bucket (not be laundered into
    bucket 0 by null-skipping greatest/least) and must not contribute
    mass to the read-time percentile."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_additive_batch,
        user_percentile_view,
        value_histogram_increment,
    )

    serving = str(tmp_path / "serving")
    b = spark.createDataFrame(
        [(1, None), (1, None), (1, 0.1), (1, 5.0)],
        "user_id long, value double",
    )
    assert apply_additive_batch(
        spark, b, 0, serving, value_histogram_increment,
        keys=["user_id", "bucket"], sum_cols=["n"],
    )
    grid = {r.bucket: r.n for r in spark.read.parquet(serving).collect()}
    assert grid == {None: 2, 0: 1, 20: 1}  # nulls visible, not in bucket 0
    # p50 over the 2 real values is the upper one's bucket (cum 2*10000
    # >= tot 2*5000 first at bucket 0? cum(0)=1 -> 10000 >= 10000: yes)
    got = {r.user_id: r.p50_value for r in user_percentile_view(spark, serving, 0.5).collect()}
    assert got == {1: 0.0}


def test_incremental_drift_histogram_maintenance(spark, tmp_path):
    """foreachBatch-maintained (day, bucket) distribution grid: the
    maintained state equals the one-shot increment over the same
    events, and the read-time chi-square drift report equals a python
    recomputation from that grid (latest day vs pooled history,
    fixed-point per-bucket terms)."""
    import math

    from data_engineering_capstone_project_spark.streaming.serving import (
        drift_histogram_increment,
        drift_view,
        maintain_drift_histogram,
    )

    src = str(tmp_path / "src")
    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    ev = events_table(spark, SF_SMALL).limit(800).cache()
    ev.repartition(3).write.mode("overwrite").parquet(src)

    maintain_drift_histogram(
        stream_events_from_dir(spark, src, max_files_per_trigger=1),
        serving,
        ckpt,
    )

    got_grid = {
        (r.day, r.bucket): r.n for r in spark.read.parquet(serving).collect()
    }
    want_grid = {
        (r.day, r.bucket): r.n for r in drift_histogram_increment(ev).collect()
    }
    assert got_grid == want_grid

    # Python recompute of the read-time drift report.
    latest = max(d for (d, b) in want_grid if d is not None)
    ref: dict[int, int] = {}
    cur: dict[int, int] = {}
    for (d, b), n in want_grid.items():
        if d is None or b is None:
            continue
        (cur if d == latest else ref).setdefault(b, 0)
        if d == latest:
            cur[b] += n
        else:
            ref[b] += n
    tot_ref, tot_cur = sum(ref.values()), sum(cur.values())
    want = {}
    for b in sorted(set(ref) | set(cur)):
        p = ref.get(b, 0) / tot_ref
        q = cur.get(b, 0) / tot_cur
        want[b] = (
            ref.get(b, 0),
            cur.get(b, 0),
            math.floor((p - q) * (p - q) / (p + q) * 1e9) / 1e9,
        )
    got = {
        r.bucket: (r.n_ref, r.n_cur, r.chi2)
        for r in drift_view(spark, serving).collect()
    }
    assert got == want


def test_drift_view_single_day_bootstrap_is_null_not_error(spark, tmp_path):
    """Day one of drift monitoring: only one distinct day in the grid
    means an EMPTY reference window — the report must come back with
    chi2 NULL on every bucket (DuckDB x/0 semantics via try_divide),
    not raise ANSI DIVIDE_BY_ZERO."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        drift_view,
    )

    serving = str(tmp_path / "serving")
    spark.createDataFrame(
        [(19700, 3, 10, 0), (19700, 7, 5, 0)],
        "day long, bucket int, n long, applied_batch_id long",
    ).write.parquet(serving)
    rows = {r.bucket: r for r in drift_view(spark, serving).collect()}
    assert set(rows) == {3, 7}
    assert all(r.chi2 is None for r in rows.values())
    assert rows[3].n_cur == 10 and rows[3].n_ref == 0


def test_user_counts_increment_null_values_contribute_zero(spark, tmp_path):
    """A user whose batch has only NULL values must land with
    value_fp = 0, not NULL — and the result must not depend on how
    many batches the user's rows spanned (the coalesce-at-increment
    contract; an uncoalesced increment made the final value NULL for
    single-batch users but 0 for multi-batch users)."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_user_counts_batch,
    )

    serving1 = str(tmp_path / "one_batch")
    b = spark.createDataFrame(
        [(1, None), (1, None), (2, 5.0)], "user_id long, value double"
    )
    assert apply_user_counts_batch(spark, b, 0, serving1)
    got1 = {
        r.user_id: (r.n_events, r.value_fp)
        for r in spark.read.parquet(serving1).collect()
    }
    assert got1[1] == (2, 0)
    assert got1[2] == (1, 50000)

    # same rows split across two batches -> identical final state
    serving2 = str(tmp_path / "two_batches")
    b1 = spark.createDataFrame([(1, None)], "user_id long, value double")
    b2 = spark.createDataFrame(
        [(1, None), (2, 5.0)], "user_id long, value double"
    )
    assert apply_user_counts_batch(spark, b1, 0, serving2)
    assert apply_user_counts_batch(spark, b2, 1, serving2)
    got2 = {
        r.user_id: (r.n_events, r.value_fp)
        for r in spark.read.parquet(serving2).collect()
    }
    assert got2 == got1


def test_tws_profiles_match_legacy_and_batch(spark, events_dir):
    """The transformWithStateInPandas twin must agree with BOTH the
    applyInPandasWithState form and the batch aggregate — pinning
    that migrating to the Spark-4 successor API is
    semantics-preserving. Runs under the RocksDB state store
    (required by transformWithState, and the production choice for
    large keyed state); the provider is restored afterwards so other
    tests keep their default. SKIPS where google.protobuf is absent
    (this sandbox): TWS's Python state server needs it at driver-
    worker init — the documented seam in stateful.py."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state server requires protobuf, "
        "absent from this sandbox (see stateful.py seam note)",
    )
    from data_engineering_capstone_project_spark.streaming.stateful import (
        running_user_profiles_tws,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = stream_events_from_dir(
            spark, events_dir, max_files_per_trigger=1
        )
        run_available_now_to_memory(
            running_user_profiles_tws(stream), "t_tws", output_mode="update"
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    final = (
        spark.table("t_tws")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("value_sum").alias("value_sum"),
        )
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
    )
    got = {
        r.user_id: (r.n_events, round(r.value_sum, 6)) for r in final.collect()
    }
    exp = {
        r.user_id: (r.n_events, round(r.value_sum, 6)) for r in batch.collect()
    }
    assert got == exp
