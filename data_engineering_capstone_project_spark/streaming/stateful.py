"""Custom stateful streaming operator via applyInPandasWithState:
a per-user running profile (event count, value sum, last-seen ts) that
survives across micro-batches.

This is the pattern for operators the built-in windows can't express
(counters, ML feature state, CDC merge). State is partitioned by the
group key, so it scales horizontally; each group's state must fit in
one executor's memory -- keep keys fine-grained.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, value_sum double, last_ts timestamp"
)
STATE_SCHEMA = "n_events bigint, value_sum double, last_ts timestamp"


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None else max(last, batch_max)
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [total],
            "last_ts": [last],
        }
    )


def running_user_profiles(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming transform: per-user cumulative profile, emitted each
    micro-batch the user appears in."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
