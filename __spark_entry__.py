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
# r12 priority head — changed only, 6 entries (VERDICT r11 #5: the 44
# remaining slots then drain the stale tail oldest-first — all 30 r7
# rows fit plus the 14 alphabetically-first r8 rows, leaving zero
# pre-r8 latest rows after this round).
_PRIORITY = [
    # CHANGED r12 (VERDICT r11 #4): pq_codes_table now builds through
    # writers.commit_build — unique fencing-token attempt dir, atomic
    # rename publish, _MANIFEST stamp, external-only registration —
    # closing the documented cross-host first-build race. These four
    # exercise the changed build/adopt path end-to-end; the adoption
    # parity additionally re-enters it and digests the adopted files.
    "codes_table_adoption_parity",
    "ann_pq_topk_indexed",
    "ann_pq_topk_after_delete",
    "ann_ivfpq_topk_indexed",
    # CHANGED r12 (VERDICT r11 #6): _bpe_apply_arrow gained the >1 MB
    # merge-table SparkContext.broadcast switchover (code, not prose);
    # the registered query rides the closure tier, but its kernel
    # wrapper changed.
    "bpe_encode_arrow",
    # CHANGED r12 (advice fix): the publish warehouse now comes from a
    # per-invocation scratch dir, so a held frame survives a second
    # same-process invocation (test_bpe_incremental.py pins it).
    "bpe_encode_published",
]
# NOT in the head despite the shared _parity_scratch_dir change: the
# streamed-parity family (oov_drift_*, trending/kmv engine parities,
# user_counts_streamed_parity) — their bodies are byte-identical; the
# helper change is dir-NAMING only (pid -> pid+seq) and is covered by
# fresh local oracle runs (oov_drift_streamed_parity,
# oov_drift_engine_streamed_parity green at sf0.01 on this code) and
# their r10/r11 driver rows.

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
