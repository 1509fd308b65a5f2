"""Adversarial-corpus contract for the REAL streaming maintenance
paths (r9, VERDICT #6).

The 219-case adversarial contract (test_adversarial_corpus.py) sweeps
every registered query — including the 8 ``*_streamed_parity`` queries,
whose micro-batch folds run the ``apply_additive_batch`` merge protocol
directly. What it does NOT exercise is the actual Structured Streaming
surface: ``readStream`` file source -> ``foreachBatch`` ->
``maintain_*``, where the ENGINE picks the batch boundaries and the
maintained table is rebuilt through checkpointed triggers. These tests
feed the same adversarial events corpus (NULL ts / user_id /
event_type / value / props, duplicate rows, epoch-boundary and
far-extreme timestamps) through each of the four real ``maintain_*``
foreachBatch paths and assert the final maintained state (and its
read-time view, where one exists) equals the batch twin over the same
rows — the exact parity the clean-stream tests in test_streaming.py
pin, now under degenerate input.

The corpus is imported from test_adversarial_corpus.EVENTS so the two
contracts can never drift on what "adversarial" means.
"""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import math

import pytest
from pyspark.sql import functions as F

from tests.test_adversarial_corpus import EVENTS


@pytest.fixture(scope="module")
def adv_stream_src(spark, tmp_path_factory):
    """The adversarial events rows written as FOUR parquet files, so
    maxFilesPerTrigger=1 makes the engine fold them in four
    micro-batches — NULL rows crossing batch boundaries, the dup row
    and its original landing in different batches."""
    src = str(tmp_path_factory.mktemp("adv_stream") / "src")
    df = spark.createDataFrame(
        EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.repartition(4).write.mode("overwrite").parquet(src)
    return src


def _stream(spark, src):
    from data_engineering_capstone_project_spark.streaming.events import (
        stream_events_from_dir,
    )

    return stream_events_from_dir(spark, src, max_files_per_trigger=1)


def _batch(spark, src):
    return spark.read.parquet(src)


def test_user_counts_maintained_on_adversarial_stream(
    spark, adv_stream_src, tmp_path
):
    """Per-user serving table over the adversarial stream: the
    maintained state must equal the one-shot batch aggregate,
    including the NULL-user group (groupBy keeps NULL keys) and the
    NULL-value row (sum skips NULLs on both paths)."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        maintain_user_counts,
    )

    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    maintain_user_counts(_stream(spark, adv_stream_src), serving, ckpt)

    got = {
        r.user_id: (r.n_events, r.value_fp)
        for r in spark.read.parquet(serving).collect()
    }
    want = {
        r.user_id: (r.n_events, r.value_fp)
        for r in _batch(spark, adv_stream_src)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 10000).cast("bigint")).alias(
                "value_fp"
            ),
        )
        .collect()
    }
    assert None in want  # the NULL-user row is part of the contract
    assert got == want


def test_trending_topk_maintained_on_adversarial_stream(
    spark, adv_stream_src, tmp_path
):
    """Sliding-window trending counts over the adversarial stream: the
    read-time top-3 must equal the batch rank — NULL-ts rows
    contribute no window, the NULL event_type ranks NULLS LAST on
    ties (the r8 batch-side contract), and the dup row counts twice."""
    from pyspark.sql.window import Window

    from data_engineering_capstone_project_spark.streaming.serving import (
        maintain_trending_counts,
        trending_increment,
        trending_topk_view,
    )

    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    maintain_trending_counts(_stream(spark, adv_stream_src), serving, ckpt)

    rnk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("events"), F.asc_nulls_last("event_type")
        )
    )
    def _key(t):
        return [(v is None, v) for v in t]  # None-safe total order

    want = sorted(
        (
            (r.window_start, r.event_type, r.events, r.rnk)
            for r in trending_increment(_batch(spark, adv_stream_src))
            .withColumn("rnk", rnk)
            .filter(F.col("rnk") <= 3)
            .collect()
        ),
        key=_key,
    )
    got = sorted(
        (
            (r.window_start, r.event_type, r.events, r.rnk)
            for r in trending_topk_view(spark, serving).collect()
        ),
        key=_key,
    )
    assert want  # non-NULL-ts rows must have produced windows
    assert got == want


def test_value_histograms_maintained_on_adversarial_stream(
    spark, adv_stream_src, tmp_path
):
    """Per-(user, bucket) histograms over the adversarial stream: the
    maintained grid equals the one-shot increment (NULL users and NULL
    buckets are visible grid rows, per the documented semantics), and
    the read-time p95 equals a python recomputation that skips NULL
    buckets the way the view does."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        maintain_value_histograms,
        user_percentile_view,
        value_histogram_increment,
    )

    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    maintain_value_histograms(_stream(spark, adv_stream_src), serving, ckpt)

    got_grid = {
        (r.user_id, r.bucket): r.n
        for r in spark.read.parquet(serving).collect()
    }
    want_grid = {
        (r.user_id, r.bucket): r.n
        for r in value_histogram_increment(
            _batch(spark, adv_stream_src)
        ).collect()
    }
    assert got_grid == want_grid
    assert any(u is None for (u, _) in want_grid)  # NULL-user rows kept
    assert any(b is None for (_, b) in want_grid)  # NULL-value rows kept

    per_user: dict = {}
    for (u, b), n in want_grid.items():
        if b is None:
            continue
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


def test_drift_histogram_maintained_on_adversarial_stream(
    spark, adv_stream_src, tmp_path
):
    """(day, bucket) drift grid over the adversarial stream: the
    maintained state equals the one-shot increment, and the read-time
    chi-square report equals a python recomputation — the NULL-ts
    day and NULL-value bucket rows must neither crash the view nor
    leak into the latest-vs-history split."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        drift_histogram_increment,
        drift_view,
        maintain_drift_histogram,
    )

    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    maintain_drift_histogram(_stream(spark, adv_stream_src), serving, ckpt)

    got_grid = {
        (r.day, r.bucket): r.n for r in spark.read.parquet(serving).collect()
    }
    want_grid = {
        (r.day, r.bucket): r.n
        for r in drift_histogram_increment(
            _batch(spark, adv_stream_src)
        ).collect()
    }
    assert got_grid == want_grid

    latest = max(d for (d, _) in want_grid if d is not None)
    ref: dict = {}
    cur: dict = {}
    for (d, b), n in want_grid.items():
        if d is None or b is None:
            continue
        tgt = cur if d == latest else ref
        tgt[b] = tgt.get(b, 0) + n
    tot_ref, tot_cur = sum(ref.values()), sum(cur.values())
    want = {}
    for b in sorted(set(ref) | set(cur)):
        p = ref.get(b, 0) / tot_ref if tot_ref else None
        q = cur.get(b, 0) / tot_cur if tot_cur else None
        chi2 = (
            math.floor((p - q) * (p - q) / (p + q) * 1e9) / 1e9
            if p is not None and q is not None and (p + q)
            else None
        )
        want[b] = (ref.get(b, 0), cur.get(b, 0), chi2)
    got = {
        r.bucket: (r.n_ref, r.n_cur, r.chi2)
        for r in drift_view(spark, serving).collect()
    }
    assert got == want


def test_stateful_profiles_on_adversarial_stream(spark, adv_stream_src):
    """The applyInPandasWithState operator over the adversarial stream:
    per-user running profiles must converge to the batch aggregate with
    a NULL user_id group (its own state cell), a NULL value inside a
    group (pandas nansum == Spark's NULL-skipping sum here), and a
    NULL ts row (NaT must not poison the count/sum state). last_ts is
    not compared — its NaT-vs-NULL edge semantics are engine-internal;
    the counted/summed state is the contract."""
    from data_engineering_capstone_project_spark.streaming import (
        run_available_now_to_memory,
    )
    from data_engineering_capstone_project_spark.streaming.stateful import (
        running_user_profiles,
    )

    stream = _stream(spark, adv_stream_src)
    run_available_now_to_memory(
        running_user_profiles(stream, watermark="900 days"),
        "t_adv_profiles",
        output_mode="update",
    )
    # Update mode emits one row per user per micro-batch; the FINAL
    # emission is the one with the largest (monotonic) n_events. A bare
    # max(value_sum) — the clean test's shortcut — is order-dependent
    # here because the adversarial corpus has NEGATIVE values, and the
    # file source's batch order is mod-time-arbitrary (observed flaking
    # under load).
    final = (
        spark.table("t_adv_profiles")
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "value_sum")).alias("s"))
        .select("user_id", "s.n_events", "s.value_sum")
    )
    batch = (
        _batch(spark, adv_stream_src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
    )

    def _rd(v):
        return None if v is None else round(v, 6)

    got = {r.user_id: (r.n_events, _rd(r.value_sum)) for r in final.collect()}
    exp = {r.user_id: (r.n_events, _rd(r.value_sum)) for r in batch.collect()}
    assert None in exp  # the NULL-user state cell is part of the contract
    assert got == exp


def _canon_ns(df):
    """None-safe canonical rows: round floats (micro-batch float sums
    differ from batch sums in the last ulps) and sort with a NULL-last
    total order (the adversarial corpus puts None in every column the
    clean tests' plain sorted() would choke on)."""
    rows = [
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in df.collect()
    ]
    return sorted(rows, key=lambda t: [(v is None, str(type(v)), v) for v in t])


def test_windowed_transforms_stream_equals_batch_on_adversarial(
    spark, adv_stream_src
):
    """The batch/stream parity anchor (file source is exactly-once and
    replayable) must hold on the adversarial corpus for every windowed
    transform: tumbling and sliding counts (NULL ts rows fall into no
    window; NULL event_type is a visible group) and session aggregates
    (NULL ts rows belong to no session). Watermark is far wider than
    the corpus span so no late-row drops confound the comparison."""
    from data_engineering_capstone_project_spark.streaming import (
        run_available_now_to_memory,
        session_aggregate,
        sliding_counts,
        tumbling_counts,
    )

    batch = _batch(spark, adv_stream_src)
    cases = [
        ("tumbling", tumbling_counts, dict()),
        ("sliding", sliding_counts, dict()),
        ("session", session_aggregate, dict(gap="10 minutes")),
    ]
    for name, fn, kw in cases:
        expected = _canon_ns(fn(batch, **kw))
        assert expected, f"{name}: batch twin produced no rows"
        stream = _stream(spark, adv_stream_src)
        run_available_now_to_memory(
            fn(stream, watermark="900 days", **kw), f"t_adv_{name}"
        )
        got = _canon_ns(spark.table(f"t_adv_{name}"))
        assert got == expected, f"{name}: stream != batch"


def test_interval_join_stream_equals_batch_on_adversarial(
    spark, adv_stream_src
):
    """Stream-stream interval join on the adversarial corpus: NULL ts
    on either side joins nothing (the interval predicate is
    three-valued NULL -> no match), NULL user_id equi-joins nothing,
    and the NULL purchase value rides through as a NULL payload —
    stream must equal batch under a corpus-wide watermark. The corpus
    has a same-timestamp-microsecond view->purchase pair (user 1) and
    a converted pair (user 5), so the join is non-vacuous."""
    from data_engineering_capstone_project_spark.streaming import (
        run_available_now_to_memory,
    )
    from data_engineering_capstone_project_spark.streaming.events import (
        views_purchase_interval_join,
    )

    expected = _canon_ns(
        views_purchase_interval_join(_batch(spark, adv_stream_src))
    )
    assert expected, "batch twin found no conversions in the corpus"
    run_available_now_to_memory(
        views_purchase_interval_join(
            _stream(spark, adv_stream_src), watermark="900 days"
        ),
        "t_adv_ij",
        output_mode="append",
    )
    assert _canon_ns(spark.table("t_adv_ij")) == expected


def test_closed_sessions_ignore_null_timestamps(spark, tmp_path):
    """Emit-on-timeout sessionization fed NULL event times (r9
    adversarial sweep): a NULL ts belongs to no session — the batch
    session_window twin drops it, and before the fix a batch-LEADING
    NaT seeded the (start, last) state with NaT, whose TimestampType
    serialization crashed the Arrow worker. Sessions and their event
    counts must be exactly those of the non-NULL rows."""
    import time

    from data_engineering_capstone_project_spark.streaming import (
        run_available_now_to_memory,
        session_aggregate as batch_sessions,
    )
    from data_engineering_capstone_project_spark.streaming.stateful import (
        closed_sessions,
    )

    src = str(tmp_path / "adv_sessions_src")
    T = "2024-03-01 {}"

    def write_batch(rows):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # file-source batches order by mod time

    # batch 1 LEADS with NULL-ts rows (the crash shape), then a real
    # session; a NULL-user row rides along too.
    write_batch(
        [(1, None), (None, None), (1, T.format("10:00:00")),
         (1, T.format("10:01:00"))])
    # batch 2: NULL ts mixed INTO an open session, then the gap-closer.
    write_batch([(1, None), (1, T.format("11:00:00"))])
    # batch 3: sentinel advances the watermark past everything.
    write_batch([(99, T.format("23:00:00"))])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_available_now_to_memory(
        closed_sessions(stream, gap_seconds=600), "t_adv_closed",
        output_mode="append",
    )
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("t_adv_closed").collect()
    )
    final_wm = T.format("23:00:00")
    expected = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch_sessions(
            spark.read.parquet(src), gap="10 minutes"
        )
        .filter(F.col("session_end") <= F.lit(final_wm).cast("timestamp"))
        .collect()
    )
    # sessions A (2 events at 10:00-10:01) and B (1 event at 11:00);
    # the four NULL-ts rows are invisible to both engines.
    assert [e[3] for e in expected] == [2, 1]
    assert got == expected


def test_checkpointed_restart_on_adversarial_stream_is_noop(
    spark, adv_stream_src, tmp_path
):
    """A checkpointed restart with no new adversarial files must leave
    the maintained state byte-identical — the degenerate rows must not
    confuse the file-source's processed-set bookkeeping."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        maintain_user_counts,
    )

    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    def _key(t):
        return [(v is None, v) for v in t]  # None-safe total order

    maintain_user_counts(_stream(spark, adv_stream_src), serving, ckpt)
    before = sorted(
        map(tuple, spark.read.parquet(serving).collect()), key=_key
    )
    maintain_user_counts(_stream(spark, adv_stream_src), serving, ckpt)
    after = sorted(
        map(tuple, spark.read.parquet(serving).collect()), key=_key
    )
    assert after == before
