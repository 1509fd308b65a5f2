"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, sorted column
names, and an order-insensitive canonical value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from tools.compare import compare_query, duck_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duck_connection(sf_dir)

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if name not in oracles:
                n = fn(spark, sf_dir).count()
                print(f"ok?  {name}: rows-only ({n} rows, no oracle) "
                      f"[{time.time()-t0:.1f}s]")
                continue
            problems = compare_query(spark, con, fn, oracles[name], sf_dir)
        except Exception as ex:
            problems = [f"error: {ex}"]
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name} [{time.time()-t0:.1f}s]")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
