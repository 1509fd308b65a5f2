"""Property tests for the serving-table merge protocols: fold an
ARBITRARY slicing of a small event set — unbalanced batches, empty
batches, single-batch, all-in-one-batch — through the PRODUCTION
``apply_additive_batch`` / ``apply_kmv_batch`` and require the final
state to equal the from-scratch answer. The registered parities pin
one deterministic 4-way slicing with a crash-replay; these pin the
protocol's convergence claim ("additive/mergeable state is
independent of how the stream was sliced") over the slicings
hypothesis invents — including the empty micro-batch a real
availableNow run can deliver, which no modulo-split parity produces.
"""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import shutil

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.sketches import (
    KMV_A,
    KMV_K,
    KMV_M,
)
from data_engineering_capstone_project_spark.streaming.serving import (
    _user_counts_increment,
    apply_additive_batch,
    apply_kmv_batch,
)

_SETTINGS = dict(max_examples=8, deadline=None)

# (user_id, value, batch assignment 0..3) — values quantized to 1e-4
# like the production fixed-point column.
_ROWS = st.lists(
    st.tuples(
        st.integers(0, 20),
        st.integers(-10000, 10000),  # value * 1e4 as int, exact
        st.integers(0, 3),
    ),
    min_size=0,
    max_size=60,
)


def _mkdf(spark, rows):
    return spark.createDataFrame(
        [(u, v / 10000.0, b) for (u, v, b) in rows],
        "user_id long, value double, b int",
    )


@settings(**_SETTINGS)
@given(rows=_ROWS)
def test_additive_merge_is_slicing_independent(spark, rows, tmp_path_factory):
    serving = str(tmp_path_factory.mktemp("serv")) + "/t"
    shutil.rmtree(serving, ignore_errors=True)
    df = _mkdf(spark, rows)
    applied_any = False
    for i in range(4):
        # Empty batches included: apply_additive_batch must fold a
        # zero-row increment without forking/corrupting state.
        ok = apply_additive_batch(
            spark,
            df.filter(F.col("b") == i).drop("b"),
            i,
            serving,
            _user_counts_increment,
            keys=["user_id"],
            sum_cols=["n_events", "value_fp"],
        )
        assert ok is True
        applied_any = True
    assert applied_any
    got = {
        r.user_id: (r.n_events, r.value_fp)
        for r in spark.read.parquet(serving)
        .select("user_id", "n_events", "value_fp")
        .collect()
    }
    # From-scratch reference (pure python, exact ints).
    want: dict[int, list[int]] = {}
    import math

    for u, v, _ in rows:
        n, s = want.setdefault(u, [0, 0])
        want[u][0] = n + 1
        want[u][1] = s + math.floor((v / 10000.0) * 10000)
    assert got == {u: (n, s) for u, (n, s) in want.items()}


@settings(**_SETTINGS)
@given(rows=_ROWS)
def test_kmv_fold_is_slicing_independent(spark, rows, tmp_path_factory):
    serving = str(tmp_path_factory.mktemp("serv")) + "/k"
    shutil.rmtree(serving, ignore_errors=True)
    df = _mkdf(spark, rows).withColumn("event_type", F.lit("e"))
    for i in range(4):
        assert (
            apply_kmv_batch(
                spark,
                df.filter(F.col("b") == i),
                i,
                serving,
                group_col="event_type",
                id_col="user_id",
            )
            is True
        )
    got = {
        (r.event_type, r.kth, r.n)
        for r in spark.read.parquet(serving)
        .groupBy("event_type")
        .agg(F.max("h").alias("kth"), F.count("*").alias("n"))
        .collect()
    }
    hs = sorted({(u * KMV_A) % KMV_M for u, _, _ in rows})[:KMV_K]
    want = {("e", hs[-1], len(hs))} if hs else set()
    assert got == want


@settings(**_SETTINGS)
@given(rows=_ROWS)
def test_cms_fold_is_slicing_independent(spark, rows, tmp_path_factory):
    """The CMS serving table (6th maintained table) under arbitrary
    slicings: folding any 4-way split of the events — empty batches
    included — through the PRODUCTION apply_additive_batch with the
    cms_cells increment must land on the exact grid a one-pass build
    produces (cell-wise: CMS state is a plain additive counter
    vector, which is the entire reason it needs no protocol
    extension)."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        CMS_HASHES,
        CMS_P,
        CMS_W,
        cms_cells,
    )

    serving = str(tmp_path_factory.mktemp("serv_cms")) + "/t"
    shutil.rmtree(serving, ignore_errors=True)
    df = _mkdf(spark, rows)
    for i in range(4):
        ok = apply_additive_batch(
            spark,
            df.filter(F.col("b") == i).drop("b"),
            i,
            serving,
            lambda b: cms_cells(b, "user_id"),
            keys=["r", "b"],
            sum_cols=["cnt"],
        )
        assert ok is True
    got = {
        (row.r, row.b): row.cnt
        for row in spark.read.parquet(serving)
        .select("r", "b", "cnt")
        .collect()
    }

    expected: dict[tuple[int, int], int] = {}
    for u, _v, _b in rows:
        for r, (a, bb) in enumerate(CMS_HASHES):
            cell = (r, ((u * a + bb) % CMS_P) % CMS_W)
            expected[cell] = expected.get(cell, 0) + 1
    assert got == expected


_OHLC_ROWS = st.lists(
    st.tuples(
        st.integers(0, 3_600_000 * 5),  # ms within 5 hour-buckets
        st.integers(-10000, 10000),     # value * 1e4 as int, exact
        st.integers(0, 3),
    ),
    min_size=0,
    max_size=60,
)


@settings(**_SETTINGS)
@given(rows=_OHLC_ROWS)
def test_ohlc_fold_is_slicing_independent(spark, rows, tmp_path_factory):
    """The OHLC serving table (8th maintained table, second
    mergeable-beyond-additive instance) under arbitrary slicings:
    folding any 4-way split — empty batches, duplicate timestamps
    (event_id tie-break), negative values — through the PRODUCTION
    apply_ohlc_batch must land on the exact bars a one-pass build
    computes, because endpoint-and-extremes state is associative
    under the (ms, event_id) total order."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        apply_ohlc_batch,
        ohlc_serving_view,
    )

    serving = str(tmp_path_factory.mktemp("serv")) + "/o"
    shutil.rmtree(serving, ignore_errors=True)
    data = [(ms, eid, v / 10000.0, b) for eid, (ms, v, b) in enumerate(rows)]
    df = (
        spark.createDataFrame(
            data, "ms long, event_id long, value double, b int"
        )
        .withColumn("ts", F.timestamp_millis(F.col("ms")))
        .withColumn("event_type", F.lit("e"))
    )
    for i in range(4):
        assert (
            apply_ohlc_batch(spark, df.filter(F.col("b") == i), i, serving)
            is True
        )
    got = {
        (r.event_type, r.hr, r.open, r.high, r.low, r.close, r.n_events)
        for r in ohlc_serving_view(spark, serving).collect()
    }

    import math

    bars = {}
    for eid, (ms, v, _) in enumerate(rows):
        fp = math.floor((v / 10000.0) * 10000)  # matches floor(value*1e4)
        bars.setdefault(ms // 3_600_000, []).append((ms, eid, fp))
    want = set()
    for hr, evs in bars.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        fps = [fp for _, _, fp in evs]
        want.add(
            (
                "e",
                hr,
                evs[0][2] / 10000.0,
                max(fps) / 10000.0,
                min(fps) / 10000.0,
                evs[-1][2] / 10000.0,
                len(evs),
            )
        )
    assert got == want
