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
# r13 priority head — changed only, 6 entries (VERDICT r12 #6: the 44
# remaining slots then drain the stale tail oldest-first — all 30 r8
# rows fit plus the 14 alphabetically-first r9 rows, leaving zero
# pre-r9 latest rows after this round).
_PRIORITY = [
    # CHANGED r13 (VERDICT r12 #3): the co-bucketed pair now lives in
    # a VERSIONED store (_v{N} via commit_build + a CURRENT pointer),
    # closing the replacement-under-concurrency scope line; this query
    # exercises the full build/resolve/adopt path end-to-end.
    "revenue_by_priority_bucketed",
    # CHANGED r13 (advice fix, medium): commit_build's entry now
    # clears debris by atomic rename-aside and adopts a concurrently-
    # published winner instead of check-then-rmtree; these four run
    # through the changed entry (and the adoption parity re-enters it
    # and digests the adopted files).
    "codes_table_adoption_parity",
    "ann_pq_topk_indexed",
    "ann_pq_topk_after_delete",
    "ann_ivfpq_topk_indexed",
    # CHANGED r13 (advice fix): _bpe_apply_arrow memoizes its
    # over-threshold Broadcast per merge-table identity; the
    # registered query rides the closure tier, but its kernel wrapper
    # changed.
    "bpe_encode_arrow",
]

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
