"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-events generator, registered as a real catalog format
(``spark.read.format("synthetic_events")``).

Why it exists: the sources family (SURVEY.md §2.1) otherwise covers
file formats only; this is the extension seam for anything that is NOT
a file — a REST API, a message queue snapshot, a test-data fixture —
expressed through the same reader contract Spark uses for built-ins:
the driver plans ``partitions()``, each executor pulls exactly its
``InputPartition`` via ``read()``, so generation is parallel and
restart-safe (same partition -> same rows, no RNG state shared across
partitions).

Determinism contract: row content is a pure function of (event_id), so
any two reads — and any retried task — produce identical data. That is
what makes a synthetic source usable in CI parity tests (asserted in
tests/test_sources_synthetic.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EPOCH = datetime(2024, 1, 1)
_TYPES = ("view", "click", "purchase", "signup", "error")


def _row(event_id: int):
    """Pure function event_id -> row (md5-derived, engine-agnostic)."""
    h = hashlib.md5(str(event_id).encode()).hexdigest()
    user_id = int(h[:8], 16) % 150
    etype = _TYPES[int(h[8:10], 16) % len(_TYPES)]
    value = (int(h[10:16], 16) % 50000) / 100.0
    ts = _EPOCH + timedelta(seconds=event_id * 37 + int(h[16:18], 16))
    return (event_id, ts, user_id, etype, value)


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _Partition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Partition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: offsets are row counters, each micro-batch
    serves the next ``rows_per_batch`` ids (capped at ``rows``) — the
    working proof of the NON-FILE streaming-source path that the Kafka
    seam cannot exercise in this sandbox (no connector jar). Offset
    bookkeeping is Spark's: ``read(start)`` returns (rows, nextOffset)
    and a replay between committed offsets regenerates identical rows
    because content is a pure function of event_id — which is exactly
    the replayability contract exactly-once sinks need from a source.
    """

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.per_batch, self.rows)
        return iter([_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["next"], end["next"])])


class SyntheticEventsDataSource(DataSource):
    """``spark.read[Stream].format("synthetic_events").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
