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
# r7 priority head (consolidation round — everything else in the
# sample is the stale tail: the 6 never-sampled queries, the 17 r1
# rows, and the oldest r2 rows fill the remaining ~39 slots):
_PRIORITY = [
    # NEW r7: the IVFPQ cost/recall dial (per-tier recall at
    # n_probe 1/2/4; rerank-tier monotonicity pinned locally)
    "ann_ivfpq_probe_sweep",
    # CHANGED r7: first-builds of the fingerprinted warehouse tables
    # now serialize on the _BUILDING lock (build_exclusive) — these
    # three read the pq/ivfpq codes index through that path, and the
    # bucketed pair query adopts through the same lock
    "ann_pq_topk_indexed",
    "ann_pq_topk_after_delete",
    "ann_ivfpq_topk_indexed",
    "revenue_by_priority_bucketed",
    # CHANGED r7 (empty-input audit): the serving tables' batch-id
    # watermark is now a durable sidecar (applied_watermark) — one
    # driver row per protocol family whose guard-read changed and is
    # not already in the head (cms/kmv/percentile parities lead the
    # never-sampled block below): the REAL-engine path, the
    # mergeable-aggregate (OHLC) class, and the DQ suite whose
    # in-plan denominators gained greatest(count, 1)
    "trending_engine_streamed_parity",
    "ohlc_streamed_parity",
    "dq_expectation_suite",
    # CHANGED r6, never driver-verified on the current code (the r6
    # sample was consumed by that round's 56 new queries; VERDICT r6
    # prescription #1 names these five as the r7 head)
    "co_ordered_parts",          # Apriori min-support prefilter added
    "length_bucketed_batches",   # corpus-scaled shard count applied
    "kmv_distinct_users",        # NULL ids filtered before hashing
    "ab_test_report",            # variant hash mixed before mod-2
    "snapshot_diff",             # insert shift raised to 10B
    # PROMOTED (VERDICT r6 prescription #5): reference parity is the
    # project's core claim; its last driver row is r5
    "star_schema_summary",
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
