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
# r13 priority head — changed only (standing rule: queries whose CODE
# CHANGED this round lead; the remaining slots drain the stale tail
# oldest-first). Two change waves this round: the inherited build
# commits (versioned pair store, commit-protocol entry fix, BPE
# broadcast memo) and the optimization pass (join-order/build-side
# rewrites, the three vectorized Arrow kernels, the plan-construction
# memo — OPTIMIZATION_r13.md has the per-query ledger).
_PRIORITY = [
    # CHANGED r13 build (VERDICT r12 #3): the co-bucketed pair now
    # lives in a VERSIONED store (_v{N} via commit_build + a CURRENT
    # pointer); this query exercises build/resolve/adopt end-to-end.
    "revenue_by_priority_bucketed",
    # CHANGED r13 build (advice fix): commit_build's entry clears
    # debris by atomic rename-aside; these also ride the r13
    # OPTIMIZATION wave (the PQ encode behind the codes table is now
    # an Arrow kernel).
    "codes_table_adoption_parity",
    "ann_pq_topk_indexed",
    "ann_pq_topk_after_delete",
    "ann_ivfpq_topk_indexed",
    # CHANGED r13 build (advice fix): _bpe_apply_arrow Broadcast memo.
    "bpe_encode_arrow",
    # CHANGED r13 optimization — headline rewrites (results identical,
    # oracle-gated; plan diffs in plans/r13/).
    "local_supplier_volume_q5",
    "sole_late_supplier_q21",
    "shipping_priority_q3",
    "returned_revenue_q10",
    "volume_shipping_q7",
    "late_shipment_orders_q4",
    "bm25_topk",
    "embedding_projection",
    "star_schema_summary",
    # CHANGED r13 optimization — shared-operator riders (similarity
    # norm staging, PQ encode kernel, IVF assignment kernel).
    "ann_lsh_topk",
    "cosine_topk",
    "embedding_near_dups",
    "ann_pq_topk",
    "ann_pq_rerank_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_probe_sweep",
    "pq_encode_incremental",
    "cluster_balanced_sample",
    "hybrid_retrieval_rrf",
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
