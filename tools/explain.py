"""Print the optimized/physical plan of any registered query — the
debugging surface for plan-quality work (is the filter pushed? did the
dim broadcast? where are the Exchanges?).

Usage: python tools/explain.py QUERY [sf_dir] [mode]
       mode: formatted (default) | extended | cost | codegen
       python tools/explain.py --list     # all registered query names
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> int:
    from data_engineering_capstone_project_spark.plans import QUERIES

    if len(sys.argv) < 2 or sys.argv[1] in ("--list", "-l"):
        for name in QUERIES:
            print(name)
        return 0

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    mode = sys.argv[3] if len(sys.argv) > 3 else "formatted"
    if name not in QUERIES:
        print(f"unknown query {name!r}; try --list", file=sys.stderr)
        return 2

    from data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark(app_name="explain", shuffle_partitions=8)
    df = QUERIES[name](spark, sf_dir)
    df.explain(mode)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange")
    print(f"-- {name}: {n_ex} Exchange(s) in the executed plan")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
