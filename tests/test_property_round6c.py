"""Property tests for the round-6 third/fourth-batch assemblies: each
distributed re-expression is pinned equal to a sequential Python
reference (or to the naive formulation it replaces) over arbitrary
hypothesis-generated inputs — ties, duplicates, singleton strata,
negative ids, empty windows — the shapes the registered oracles' fixed
corpora may never produce.
"""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.plans.events_windows import (
    daily_streaks,
    dau_wau_from_activity,
)
from data_engineering_capstone_project_spark.plans.relational import (
    pareto_frontier_2d,
)
from data_engineering_capstone_project_spark.plans.text_analysis import (
    grid_offset_stratum_rank,
)

_SETTINGS = dict(max_examples=10, deadline=None)


# --- daily streaks vs a sequential reference -------------------------

_ACT = st.lists(
    st.tuples(st.integers(0, 6), st.integers(-5, 40)),
    min_size=1,
    max_size=80,
)


def _streaks_ref(rows):
    by_user: dict[int, set[int]] = {}
    for u, d in rows:
        by_user.setdefault(u, set()).add(d)
    out = {}
    for u, days in by_user.items():
        ds = sorted(days)
        best_len, best_start = 0, None
        run_len, run_start = 0, None
        prev = None
        for d in ds:
            if prev is not None and d == prev + 1:
                run_len += 1
            else:
                run_len, run_start = 1, d
            # strictly-greater keeps the EARLIEST start on ties
            if run_len > best_len:
                best_len, best_start = run_len, run_start
            prev = d
        out[u] = (len(ds), best_len, best_start)
    return out


@settings(**_SETTINGS)
@given(rows=_ACT)
def test_daily_streaks_match_sequential_reference(spark, rows):
    act = spark.createDataFrame(
        sorted(set(rows)), "user_id long, d long"
    )
    got = {
        r.user_id: (r.active_days, r.best_streak, r.streak_start_day)
        for r in daily_streaks(act).collect()
    }
    assert got == _streaks_ref(rows)


# --- DAU/WAU coverage explosion vs brute trailing window --------------


@settings(**_SETTINGS)
@given(rows=_ACT)
def test_dau_wau_matches_brute_trailing_window(spark, rows):
    ud_rows = sorted(set(rows))
    ud = spark.createDataFrame(ud_rows, "user_id long, d long")
    got = {
        r.day: (r.dau, r.wau, r.stickiness)
        for r in dau_wau_from_activity(ud).collect()
    }
    days = sorted({d for _, d in ud_rows})
    want = {}
    for day in days:
        dau = len({u for u, d in ud_rows if d == day})
        wau = len({u for u, d in ud_rows if day - 6 <= d <= day})
        import math

        want[day] = (dau, wau, math.floor(dau * 10000.0 / wau) / 10000.0)
    assert got == want


# --- 2-D skyline vs brute-force dominance ------------------------------

_PTS = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(pts=_PTS)
def test_skyline_matches_brute_force(spark, pts):
    rows = [(i, mx, mn) for i, (mx, mn) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, mx long, mn long")
    got = {
        r.id
        for r in pareto_frontier_2d(
            df, maximize_col="mx", minimize_col="mn"
        ).collect()
    }
    want = {
        i
        for i, (mx, mn) in enumerate(pts)
        if not any(
            bmx >= mx and bmn <= mn and (bmx > mx or bmn < mn)
            for (bmx, bmn) in pts
        )
    }
    assert got == want


# --- grid-offset stratum rank vs flat per-stratum row_number -----------

_STRAT = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(0, 99),          # hash value (collisions welcome)
        st.integers(-50, 50),        # id tiebreak, negatives included
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: (t[0], t[2]),
)


@settings(**_SETTINGS)
@given(rows=_STRAT, width=st.sampled_from([1, 7, 25, 100]))
def test_grid_offset_rank_equals_flat_rank(spark, rows, width):
    from pyspark.sql.window import Window as W

    df = spark.createDataFrame(rows, "s string, hv long, id long")
    got = {
        (r.s, r.id): r.sample_rank
        for r in grid_offset_stratum_rank(
            df, stratum_col="s", hash_col="hv", id_col="id", width=width
        ).collect()
    }
    flat = {
        (r.s, r.id): r.rk
        for r in df.withColumn(
            "rk",
            F.row_number().over(W.partitionBy("s").orderBy("hv", "id")),
        ).collect()
    }
    assert got == flat


# --- shift-decay mergeability: partials sum to the direct answer -------

_DECAY = st.lists(
    st.tuples(
        st.integers(0, 5),        # user
        st.integers(0, 40),       # age in days
        st.integers(0, 10**7),    # fixed-point value (positive, house rule)
        st.integers(0, 3),        # slice assignment
    ),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(rows=_DECAY)
def test_shift_decay_partials_merge_exactly(spark, rows):
    """sum(v >> age) distributes over ANY slicing of the rows — the
    mergeability claim behind time_decayed_user_scores' serving story."""
    direct: dict[int, int] = {}
    partial: dict[tuple[int, int], int] = {}
    for u, age, v, b in rows:
        direct[u] = direct.get(u, 0) + (v >> age)
        partial[(u, b)] = partial.get((u, b), 0) + (v >> age)
    merged: dict[int, int] = {}
    for (u, _b), s in partial.items():
        merged[u] = merged.get(u, 0) + s
    assert merged == direct
    # And the Spark expression computes the same shift as Python's.
    df = spark.createDataFrame(
        [(u, age, v) for u, age, v, _ in rows], "u long, age int, v long"
    )
    got = {
        r.u: r.s
        for r in df.groupBy("u")
        .agg(F.sum(F.expr("shiftright(v, age)")).alias("s"))
        .collect()
    }
    assert got == direct


# --- CDC latest-state compaction vs a sequential log replay -----------

_LOG = st.lists(
    st.tuples(
        st.integers(0, 8),            # key
        st.integers(0, 20),           # payload
        st.booleans(),                # delete?
    ),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(rows=_LOG)
def test_changelog_compaction_matches_sequential_replay(spark, rows):
    from data_engineering_capstone_project_spark.operators.scd import (
        changelog_latest_state,
    )

    # seq = arrival order (unique per key by construction).
    log = [
        (k, i, "D" if d else "U", p) for i, (k, p, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(log, "k long, seq long, op string, p long")
    got = {
        (r.k, r.p)
        for r in changelog_latest_state(
            df, ["k"], seq_col="seq", op_col="op"
        ).collect()
    }
    state: dict[int, int | None] = {}
    for k, _seq, op, p in log:
        state[k] = None if op == "D" else p
    want = {(k, p) for k, p in state.items() if p is not None}
    assert got == want


# --- LTOB pick vs a sequential max-deviation reference -----------------

_SERIES = st.lists(
    st.tuples(
        st.integers(0, 2),     # bucket
        st.integers(0, 50),    # us (may collide; pick ties to earliest)
        st.integers(-100, 100),  # v
    ),
    min_size=1,
    max_size=50,
)


@settings(**_SETTINGS)
@given(pts=_SERIES)
def test_ltob_pick_matches_sequential_reference(spark, pts):
    from data_engineering_capstone_project_spark.plans.events_windows import (
        ltob_pick,
    )

    # Unique (bucket, us) per row: duplicate-us rows in one bucket would
    # make the pick's us-tiebreak depend on an unordered third column.
    pts = list({(b, us): (b, us, v) for b, us, v in pts}.values())
    df = spark.createDataFrame(
        [("s", b * 300, us, v) for b, us, v in pts],
        "event_type string, bucket_start long, us long, v long",
    )
    got = {
        r.bucket_start: (r.us, r.v, r.v_min, r.v_max, r.n)
        for r in ltob_pick(df).collect()
    }
    want = {}
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for b, us, v in pts:
        by_bucket.setdefault(b * 300, []).append((us, v))
    for b, rows in by_bucket.items():
        n = len(rows)
        sv = sum(v for _, v in rows)
        best = min(rows, key=lambda r: (-abs(r[1] * n - sv), r[0]))
        want[b] = (
            best[0],
            best[1],
            min(v for _, v in rows),
            max(v for _, v in rows),
            n,
        )
    assert got == want
