"""Plan census: one structural row per registered query — the
whole-surface audit of the physical-plan properties that decide
100 TB behavior, generated instead of hand-claimed.

For every query (built at the smallest SF — these are PLAN
properties, data-size independent) it records, from the executed
plan string:

* ``exchanges``   — DISTINCT structural shuffle count
  (hash/range/single-partition): counted on expression-id-stripped,
  line-deduplicated plan text, because the textual plan prints a
  cached (InMemoryTableScan) subtree once PER REFERENCE — a query
  whose cached frame feeds 4 consumers would otherwise report the
  subtree's shuffles 4+ times (and Spark's own ReusedExchange
  collapses genuinely identical shuffles at runtime anyway). The
  per-query tests pin exact counts for the asserted plans; this
  census shows the whole distribution at a glance.
* ``range_part``  — rangepartitioning Exchanges (global sorts);
  expected ONLY in the queries whose contract is a globally ordered
  result (top-k via TakeOrderedAndProject does not count one).
* ``cartesian``   — CartesianProduct / BroadcastNestedLoopJoin
  nodes; expected ONLY in the declared brute-force verifier tier
  and the tiny broadcast centroid/constant-frame joins.
* ``wgl``         — WindowGroupLimit present (running top-k).
* ``python``      — ArrowEvalPython / FlatMapGroupsInPandas /
  MapInPandas nodes (the declared Arrow escape hatches; any OTHER
  Python node would be a row-at-a-time regression).
* ``take_ordered``— TakeOrderedAndProject present.

Queries that RUN work at build time (the streamed parities, the
codes-table builders) are skipped by default — their plan is the
read-side view, and building them here would replay merge protocols
just to print a string; pass --all to include them.

Usage: python tools/plan_census.py [sf_dir] [--all] > PLAN_CENSUS.md
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

_RE_ID = re.compile(r"#\d+L?|plan_id=\d+|cachedrdd_\d+")
# Tree-drawing prefix (":  +- " etc.): the SAME structural node
# prints with different indentation at each cached-subtree
# reference, so dedup must ignore it.
_RE_TREE = re.compile(r"^[\s:+*-]+")

# Queries whose *construction* executes jobs (parity protocols fold
# micro-batches; index builders encode-and-write on first touch).
# Their scale posture is probed/asserted elsewhere; the census
# documents the declarative tier.
_EAGER = {
    "trending_streamed_parity",
    "drift_streamed_parity",
    "user_counts_streamed_parity",
    "percentile_streamed_parity",
    "trending_engine_streamed_parity",
    "star_schema_summary",
    "revenue_by_priority_bucketed",
    "ann_pq_topk_indexed",
    "ann_ivfpq_topk_indexed",
    "ann_pq_topk_after_delete",
    "pq_codes_table",
    "kmv_streamed_parity",
    "cms_streamed_parity",
    "decayed_streamed_parity",
    "merge_upsert_parity",
    "orc_roundtrip_parity",
    "ohlc_streamed_parity",
    "ivm_revenue_by_nation_parity",
    # r10: runs the full build->drop->adopt lifecycle at call time;
    # its read-side plan is pq_codes_table's (already skipped).
    "codes_table_adoption_parity",
    # r10: folds 4 document micro-batches through the serving merge
    # at call time; the read side is a plain parquet scan.
    "oov_drift_streamed_parity",
    "oov_drift_engine_streamed_parity",
}


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    include_eager = "--all" in sys.argv
    for a in sys.argv[1:]:
        if not a.startswith("-"):
            sf_dir = a

    from data_engineering_capstone_project_spark.plans import QUERIES
    from data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark(app_name="plan-census", shuffle_partitions=8)

    print(f"# Plan census ({len(QUERIES)} registered queries, sf={sf_dir})")
    print()
    print("| query | exchanges | reused | range_part | cartesian | wgl | python | take_ordered |")
    print("|---|---|---|---|---|---|---|---|")
    skipped = []
    for name, fn in QUERIES.items():
        if name in _EAGER and not include_eager:
            skipped.append(name)
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — census must finish
            print(f"| {name} | ERROR: {type(exc).__name__} | | | | | | |")
            continue
        # ReusedExchange nodes are reads of an already-computed
        # shuffle, not new shuffles — count them separately. Dedup
        # structural lines (expression ids stripped) first: cached
        # subtrees print once per InMemoryTableScan reference, and
        # identical shuffles are ReusedExchange-collapsed at runtime.
        stripped = _RE_ID.sub("#x", plan)
        lines = {
            _RE_TREE.sub("", ln) for ln in stripped.splitlines()
        }
        reused = sum("ReusedExchange" in ln for ln in lines)
        ex = sum("Exchange" in ln for ln in lines) - reused
        rp = sum("rangepartitioning" in ln for ln in lines)
        cart = sum(
            ("CartesianProduct" in ln) or ("BroadcastNestedLoopJoin" in ln)
            for ln in lines
        )
        wgl = "y" if "WindowGroupLimit" in plan else ""
        py = sum(
            plan.count(n)
            for n in (
                "ArrowEvalPython",
                "FlatMapGroupsInPandas",
                "MapInPandas",
                # r13: the vectorized Arrow kernels (embedding
                # projection, PQ encode, IVF cell assignment) plan as
                # MapInArrow — a declared Arrow escape hatch, counted
                # so the census can't under-report the Python surface.
                "MapInArrow",
            )
        )
        tops = "y" if "TakeOrderedAndProject" in plan else ""
        print(
            f"| {name} | {ex} | {reused or ''} | {rp} | {cart} | {wgl} |"
            f" {py or ''} | {tops} |"
        )
    if skipped:
        print()
        print(
            f"Skipped (eager build-time work; probed/asserted elsewhere): "
            f"{', '.join(sorted(skipped))}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
