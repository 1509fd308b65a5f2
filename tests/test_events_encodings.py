"""events_table must normalize ``ts`` to tz-aware TimestampType for
EVERY parquet timestamp encoding the testdata has shipped with.

Round 2 shipped a silent breakage: every existing test inherited one
encoding from the shared testdata, so when the testdata switched from
TIMESTAMP(NANOS) to timestamp[us]-without-UTC-flag (-> TIMESTAMP_NTZ in
Spark 4), 8 queries and the whole bench died on
``unix_micros``/``CAST(ts AS LONG)``. This file pins all three
encodings against fixture parquet it writes itself, so the source
wrapper can never again depend on whatever today's testdata happens
to be.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_capstone_project_spark.plans.registry import events_table

# Two instants, chosen with sub-second parts so unit mix-ups
# (ms-vs-us-vs-ns) shift the value and fail the assertion.
_T0 = dt.datetime(2024, 1, 1, 0, 0, 1, 234567)
_T1 = dt.datetime(2024, 1, 1, 6, 30, 2, 345678)
_EXPECT_US = [
    int(_T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
    int(_T1.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
]


def _write_events(tmpdir: str, ts_type: pa.DataType) -> str:
    """Write a tiny events.parquet with ``ts`` in the given arrow type;
    returns the sf_dir events_table expects."""
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([_T0, _T1], ts_type),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["view", "purchase"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.mark.parametrize(
    "ts_type",
    [
        # today's testdata: micros, no UTC flag -> Spark 4 TIMESTAMP_NTZ
        pa.timestamp("us"),
        # r1's testdata: TIMESTAMP(NANOS) -> int64 under nanosAsLong
        pa.timestamp("ns"),
        # the ordinary case: micros adjusted-to-UTC -> TimestampType
        pa.timestamp("us", tz="UTC"),
    ],
    ids=["micros-ntz", "nanos", "micros-utc"],
)
def test_events_table_normalizes_every_encoding(spark, tmp_path, ts_type):
    from pyspark.sql import functions as F

    sf_dir = _write_events(str(tmp_path), ts_type)
    df = events_table(spark, sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
    got = [
        r[0]
        for r in df.orderBy("event_id")
        .select(F.unix_micros("ts"))
        .collect()
    ]
    assert got == _EXPECT_US
