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
# r10 priority head — new/changed only (VERDICT r9 #2: the 39
# remaining slots then drain the stale tail oldest-first — all 3 r3
# rows + all 13 r4 rows + 23 of the 28 r5 rows — leaving zero pre-r5
# latest rows after this round, the prescribed done-bar; 5 r5 rows
# slip to r11).
_PRIORITY = [
    # NEW r10: the tokenizer's export artifact — the full (sym, tid)
    # vocabulary table (vocab.json half of the shipped pair; the
    # merges table is the other half); oracle re-derives the id
    # assignment independently in SQL.
    "bpe_vocab_table",
    # NEW r10 (VERDICT #1): bpe_encode on the one-pass Arrow apply —
    # the production path for 30k+-merge vocabularies, flat in merge
    # count (SCALE_PROBE_r10: 0.371s@256 vs 0.387s@1024 merges, vs
    # the window path's measured 4.0x per 4x) — against the SAME
    # DuckDB oracle as bpe_encode.
    "bpe_encode_arrow",
    # NEW r10: the detokenizer — decode(encode(text)) through the id
    # space alone (tid -> sym via the vocab export), round-trip
    # equality vs the normalized text per document; the oracle
    # re-derives the whole decode independently in SQL.
    "bpe_decode_roundtrip",
    # NEW r10: frozen-vocab incremental encode — train on the base
    # split only, encode the new split against the frozen artifacts,
    # OOV symbols become counted UNK (-1) instead of silently
    # dropping; the oracle re-applies the frozen merges with
    # apply-only unrolled rounds.
    "bpe_encode_incremental",
    # NEW r10: the 9th maintained serving table — per-source frozen-
    # vocab token/UNK statistics folded through the real additive
    # merge protocol over the document stream (OOV-drift monitoring);
    # oracle recomputes per-source stats from scratch in SQL.
    "oov_drift_streamed_parity",
    # NEW r10: the same table maintained by the REAL streaming engine
    # (readStream -> foreachBatch -> maintain_oov_drift) with a
    # full-job replay the batch-id guard must no-op — the engine-path
    # twin trending has, now for the tokenizer table.
    "oov_drift_engine_streamed_parity",
    # NEW r10 (VERDICT #6): the build-lock/adoption protocol's driver
    # row — build the PQ codes table, drop the catalog entry keeping
    # files, re-enter (must ADOPT), assert digest + file-listing
    # identity in-engine AND hash-check the adopted digest vs DuckDB.
    "codes_table_adoption_parity",
    # CHANGED r10 (advice fix): the training loop's empty-merge-round
    # guard is now a LAZY LEFT JOIN ON TRUE in the merge apply
    # (mirrors the oracle) instead of an eager per-round take(1) at
    # plan-construction time; bpe_encode additionally gained the mode
    # parameter (default "window", same plan).
    "bpe_learn_merges",
    "bpe_encode",
    "sequence_packing_bpe",
    # CHANGED r10 (advice fix): memo invalidation uses pop(key, None)
    # so a concurrent double-invalidate can't mask the two-writers
    # RuntimeError with a KeyError.
    "revenue_by_priority_bucketed",
]
# NOT in the head despite touched code: sources/writers.py's
# _release_own stat-retry (r10 advice fix) lives on a transient-EIO
# path no normal driver run executes; its contract is pinned by
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
