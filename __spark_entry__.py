"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real implementations live in
``data_engineering_capstone_project_spark/``; this module only adapts
them to the driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from data_engineering_capstone_project_spark.plans import ORACLES, QUERIES  # noqa: E402
from tools.rotation import last_verified_rounds, rotation_order  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver samples the FIRST 50 entries in dict order. Standing
# rotation rule (adopted r6, mechanized r7): queries that are NEW or
# whose CODE CHANGED this round lead (their existing driver rows, if
# any, are evidence about code that no longer exists), then every
# other query ordered least-recently-driver-verified first —
# never-sampled queries (round 0) ahead of the r1 tail, and so on,
# alphabetical within a round. The staleness map is COMPUTED from the
# CORRECTNESS_r0*.json artifacts at import time (tools/rotation.py),
# so the order can never drift from the recorded evidence the way the
# hand-maintained r1-r6 lists could; tests/test_bench_registry.py pins
# the invariants (priority head first, then monotone non-decreasing
# staleness, permutation of the full registry).
#
# r11 priority head — new/changed only, kept at 3 (VERDICT r10 #3:
# the 47 remaining slots then drain the stale tail oldest-first —
# all 5 r5 rows + all 40 r6 rows fit, leaving zero pre-r7 latest
# rows after this round — plus the 2 alphabetically-first r7 rows).
_PRIORITY = [
    # NEW r11 (VERDICT r10 #7): publish-and-load for the frozen
    # tokenizer artifacts — train on the base split, PUBLISH the
    # merges + (sym, tid) tables as warehouse parquet, LOAD them
    # back, encode the new split against the LOADED artifacts only;
    # same oracle as bpe_encode_incremental, so the round-trip is
    # hash-checked cross-engine (and row-exact vs the in-memory path
    # in tests/test_bpe_incremental.py).
    "bpe_encode_published",
    # CHANGED r11: body extracted into the shared
    # _encode_frozen_digests helper (one definition for the in-memory
    # and published paths); plan and values identical, but the code
    # the r10 row verified no longer exists as written.
    "bpe_encode_incremental",
    # CHANGED r11 (advice fix): maintain_oov_drift now returns the
    # per-batch applied log and the parity RAISES if any replayed
    # batch reports applied=True — the hand-loop parities' explicit
    # failure protocol, previously only an implicit oracle-hash
    # property on this engine path.
    "oov_drift_engine_streamed_parity",
]
# NOT in the head despite touched test files: bpe_decode_roundtrip
# (the r11 sort-merge pin landed in tests/test_plan_shapes.py only;
# the query body is byte-identical to what its r10 row verified).

_DRIVER_SAMPLE_FIRST = rotation_order(
    QUERIES, last_verified_rounds(_REPO), _PRIORITY
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = {n: QUERIES[n] for n in _DRIVER_SAMPLE_FIRST if n in QUERIES}
    ordered.update(QUERIES)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    return dict(ORACLES)
