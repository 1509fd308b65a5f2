"""Scaling probe: how do the headline plans behave as data grows?

Materializes a K-times-replicated copy of the sf0.1 fact tables (key
spaces shifted per replica so join fan-outs and group cardinalities
scale realistically, not degenerate hot keys), then times a
representative query per physical pattern at 1x and Kx. Near-linear
wall-clock growth (at fixed parallelism) is the evidence that the plans
have no super-linear term waiting at 100 TB.

Usage: python tools/scale_probe.py [K] [out_dir]
       (defaults: K=8, out_dir=/tmp/scale_probe)
Prints one JSON line per query: name, rows_1x, sec_1x, sec_kx, ratio.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_capstone_project_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicate(spark, name: str, out: str, k: int, shift_cols: dict[str, int]):
    """Union k copies with per-replica key shifts (column -> keyspace
    stride), so replica i's keys are disjoint from replica j's."""
    df = spark.read.parquet(f"{SF_DIR}/{name}.parquet")
    reps = []
    for i in range(k):
        rep = df
        for col, stride in shift_cols.items():
            rep = rep.withColumn(col, F.col(col) + F.lit(i * stride))
        reps.append(rep)
    out_df = reps[0]
    for r in reps[1:]:
        out_df = out_df.unionByName(r)
    out_df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe"
    spark = get_spark(app_name="scale-probe")

    shutil.rmtree(out, ignore_errors=True)
    # Strides chosen >= the 1x keyspace of each column.
    replicate(spark, "lineitem", out, k, {"l_orderkey": 10_000_000})
    replicate(
        spark, "orders", out, k,
        {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    )
    replicate(spark, "customer", out, k, {"c_custkey": 1_000_000})
    for small in ("nation", "region"):
        src, dst = f"{SF_DIR}/{small}.parquet", f"{out}/{small}.parquet"
        if Path(src).is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)

    import __spark_entry__ as e

    qs = e.queries()
    probes = [
        "pricing_summary",       # scan + partial/final agg
        "revenue_by_priority",   # fact-fact shuffle join
        "visits_by_region",      # broadcast dim chain
        "top_nations_by_month",  # join + window top-k
        "customer_order_progression",  # partitioned sort window
    ]
    for name in probes:
        times = {}
        for label, d in (("1x", SF_DIR), (f"{k}x", out)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, d).collect()
                best = min(best, time.time() - t0)
            times[label] = round(best, 3)
        print(
            json.dumps(
                {
                    "query": name,
                    "sec_1x": times["1x"],
                    f"sec_{k}x": times[f"{k}x"],
                    "ratio": round(times[f"{k}x"] / max(times["1x"], 1e-9), 2),
                    "k": k,
                }
            )
        )


if __name__ == "__main__":
    main()
