"""Core-scaling probe: do the plans parallelize over CORES, not just
over data? (r14, VERDICT r13 #7.)

The bench's 8-vs-32-core block is vacuous at sf0.1 — every headline
query sits at the ~0.3 s job-submission/AQE floor, so every ratio is
~1 regardless of plan quality. This leg times a representative set of
shuffle-heavy queries on the K-times-replicated probe dataset (the
same replication scheme and completion marker as tools/scale_probe.py)
at two core counts, each in its OWN subprocess (local[N] is fixed at
session creation; SPARK_GRAFT_CPUS drives both the master and the
default shuffle partitioning, exactly as the driver's own low-core
bench leg does).

Usage: python tools/core_scaling_probe.py [--record [FILE]] [K] [out_dir]
       [lo_cores] [hi_cores] [query ...]
Defaults: K=8, out_dir=/tmp/scale_probe8, 8 vs 32 cores, the PROBES
list below. Emits one JSON row per query:
  {"name": "core_scaling_<q>", "k": K, "cores_lo": 8, "cores_hi": 32,
   "sec_lo": ..., "sec_hi": ..., "ratio_lo_over_hi": ...}
A healthy parallel plan shows ratio >> 1 (toward cores_hi/cores_lo);
~1 means the query is serial or still floor-bound at this K.
--record appends rows to the round's SCALE_PROBE ledger, like the
data-scaling probe.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import tools.scale_probe as sp  # noqa: E402

# Shuffle-heavy representatives across the physical patterns: fact-fact
# shuffle join, multi-join with pre-aggregate, repartition + dual-level
# agg, session_window shuffle, banded self-join.
PROBES = [
    "revenue_by_priority",
    "local_supplier_volume_q5",
    "sole_late_supplier_q21",
    "events_sessionization",
    "minhash_lsh_pairs",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from data_engineering_capstone_project_spark.session import get_spark
import __spark_entry__ as e
qs = e.queries()
spark = get_spark(app_name="core-scaling-probe")
out = {{}}
for name in {names!r}:
    fn = qs[name]
    def noop():
        fn(spark, {data!r}).write.mode("overwrite").format("noop").save()
    try:
        noop()  # untimed warm pass (codegen/JIT), same as the bench
        samples = []
        for _ in range(2):
            t0 = time.time(); noop(); samples.append(time.time() - t0)
        out[name] = round(min(samples), 3)
    except Exception as exc:
        out[name] = "ERR " + type(exc).__name__
print("CORESCALE " + json.dumps(out))
"""


def _run_at(cores: int, names: list[str], data: str) -> dict:
    import os

    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(cores)
    code = _CHILD.format(repo=str(_REPO), names=names, data=data)
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    for line in res.stdout.splitlines():
        if line.startswith("CORESCALE "):
            return json.loads(line[len("CORESCALE "):])
    raise RuntimeError(
        f"core-scaling child at {cores} cores produced no result line:\n"
        f"{res.stdout[-2000:]}\n{res.stderr[-2000:]}"
    )


def main() -> None:
    argv = list(sys.argv[1:])
    record: Path | None = None
    if "--record" in argv:
        i = argv.index("--record")
        argv.pop(i)
        if i < len(argv) and argv[i].endswith(".jsonl"):
            record = Path(argv.pop(i))
        else:
            record = sp._default_record_path()
        print(f"recording rows to {record}", file=sys.stderr)
    k = int(argv[0]) if len(argv) > 0 else 8
    out = argv[1] if len(argv) > 1 else f"/tmp/scale_probe{k}"
    lo = int(argv[2]) if len(argv) > 2 else 8
    hi = int(argv[3]) if len(argv) > 3 else 32
    names = argv[4:] or PROBES

    import bench

    sp._CODE_REV = bench._git_rev()
    from data_engineering_capstone_project_spark.session import get_spark

    sp.materialize(get_spark(app_name="core-scaling-materialize"), k, out)

    env0 = sp._env_start()
    hi_res = _run_at(hi, names, out)
    lo_res = _run_at(lo, names, out)
    stamp = sp._env_fields(env0)
    for name in names:
        sec_hi, sec_lo = hi_res.get(name), lo_res.get(name)
        row = {
            "name": f"core_scaling_{name}",
            "k": k,
            "cores_lo": lo,
            "cores_hi": hi,
            "sec_lo": sec_lo,
            "sec_hi": sec_hi,
            "ratio_lo_over_hi": (
                round(sec_lo / sec_hi, 2)
                if isinstance(sec_lo, float)
                and isinstance(sec_hi, float)
                and sec_hi > 0
                else None
            ),
            **stamp,
        }
        line = json.dumps(row)
        print(line)
        if record is not None:
            with open(record, "a") as f:
                f.write(line + "\n")
    _ = time  # parity with scale_probe's import surface


if __name__ == "__main__":
    main()
