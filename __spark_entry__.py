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
# r9 priority head — MINIMAL by design (VERDICT r8 #1: the r2/r3
# stale tail is the binding constraint; the r8 adversarial program is
# complete, so r9's change surface is deliberately four queries). The
# remaining 46 slots fall on the stale tail oldest-first: all 22 r2
# rows + the 24 alphabetically-first r3 rows drain this round,
# leaving 3 r3 rows for the r10 sample.
_PRIORITY = [
    # NEW r9: packing over REAL bpe_encode token counts — the closed
    # tokenizer chain driver-visible end-to-end (VERDICT #5); oracle
    # composes the bpe_encode and packing oracles
    "sequence_packing_bpe",
    # CHANGED r9 (advice fix + stack fix): the training loop now STOPS
    # on an empty merge round, passing the symbol frame through like
    # the oracle's LEFT JOIN ON TRUE, instead of letting the inner-join
    # apply wipe it (latent state divergence; outputs coincided); and
    # bpe_apply_merges — which bpe_encode runs — now inlines
    # driver-known merges as literals with a 16-merge checkpoint batch
    # (the 64-deep default overflowed the driver stack at production
    # merge counts; found by this round's prescribed probe).
    "bpe_learn_merges",
    "bpe_encode",
    # CHANGED r9 (advice fix): the _VALIDATED_PAIRS memo fast path now
    # re-reads the _BUCKETS sidecars on EVERY hit (plain file I/O), so
    # the loud two-writers failure is every-call, not first-call-only.
    "revenue_by_priority_bucketed",
]
# NOT in the head despite touched code: sources/writers.py's breaker
# relic restore (r9 advice fix, _restore_slot) lives on a path only
# reachable through a crashed-breaker relic + triple race — no normal
# driver run executes it, so it invalidates no driver row; its
# contract is pinned by the dedicated two-process/threaded tests in
# tests/test_build_lock.py instead.

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
