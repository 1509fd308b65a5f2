"""Property-based tests: the funnel and time-weighted-average window
pipelines must agree with direct single-machine reference
implementations on arbitrary small event logs — ties in event time,
users with no qualifying sequence, single-event users, zero-duration
intervals."""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import datetime as dt
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.plans.events_windows import (
    funnel_over,
    twa_over,
)

_SETTINGS = dict(max_examples=10, deadline=None)

_TYPES = ["view", "click", "purchase", "signup"]

# (user, seconds-offset, type-index, value-in-hundredths)
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=500),
    ),
    min_size=1,
    max_size=16,
)

_EPOCH = dt.datetime(2024, 1, 1)


def _to_df(spark, rows):
    data = [
        (
            i,
            _EPOCH + dt.timedelta(seconds=sec),
            user,
            _TYPES[ti],
            cents / 100.0,
        )
        for i, (user, sec, ti, cents) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )


@settings(**_SETTINGS)
@given(rows=events_strategy)
def test_funnel_matches_reference(spark, rows):
    got = funnel_over(_to_df(spark, rows)).collect()[0]

    # Reference: walk each user's (ts, event_id)-ordered log once.
    users = {}
    order = sorted(range(len(rows)), key=lambda i: (rows[i][1], i))
    for i in order:
        user, _sec, ti, _ = rows[i]
        state = users.setdefault(user, {"view": False, "click": False, "buy": False})
        t = _TYPES[ti]
        if t == "view":
            state["view"] = True
        elif t == "click" and state["view"]:
            state["click"] = True
        elif t == "purchase" and state["click"]:
            state["buy"] = True
    n_view = sum(s["view"] for s in users.values())
    n_click = sum(s["click"] for s in users.values())
    n_buy = sum(s["buy"] for s in users.values())

    assert got.users_total == len(users)
    assert got.users_view == n_view
    assert got.users_view_click == n_click
    assert got.users_full_funnel == n_buy
    want_click_rate = (
        None if n_view == 0 else math.floor(n_click / n_view * 10000) / 10000.0
    )
    want_buy_rate = (
        None if n_click == 0 else math.floor(n_buy / n_click * 10000) / 10000.0
    )
    assert got.click_rate == want_click_rate
    assert got.purchase_rate == want_buy_rate


@settings(**_SETTINGS)
@given(rows=events_strategy)
def test_twa_matches_reference(spark, rows):
    got = {
        r.user_id: (r.twa_value, r.n_intervals)
        for r in twa_over(_to_df(spark, rows)).collect()
    }

    per_user: dict[int, list[tuple[int, int]]] = {}
    order = sorted(range(len(rows)), key=lambda i: (rows[i][1], i))
    for i in order:
        user, sec, _ti, cents = rows[i]
        per_user.setdefault(user, []).append((sec, cents))
    want = {}
    for user, seq in per_user.items():
        sum_vw = sum_w = n = 0
        for (sec, cents), (nxt, _) in zip(seq, seq[1:]):
            w = nxt - sec
            value_fp = math.floor(cents / 100.0 * 10000)
            sum_vw += value_fp * w
            sum_w += w
            n += 1
        if sum_w > 0:
            want[user] = (sum_vw / (sum_w * 10000.0), n)
    assert got == want
