"""build_exclusive — the first-build write-write lock (r7, closing the
r6 residual): exactly one process builds a content-fingerprinted
warehouse dir; concurrent callers wait for the complete dir and adopt.

Thread-level tests pin the protocol mechanics deterministically (the
lock is an O_EXCL file, so threads of one process exercise the same
acquire/release path as processes); the two-process test runs the REAL
scenario from SURVEY.md's round-6 close — two SparkSessions with
in-memory catalogs racing the first build of the same pq_codes table
over one shared warehouse — and asserts both serve identical rows with
no rmtree-under-reader and no leftover lock.
"""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

import pytest

from data_engineering_capstone_project_spark.sources.writers import (
    build_exclusive,
)

SF_SMALL = "/root/testdata/sf0.001"
_REPO = Path(__file__).resolve().parent.parent


def _mk_build(loc: Path, calls: list, sleep: float = 0.0):
    def build() -> None:
        calls.append(threading.get_ident())
        if sleep:
            time.sleep(sleep)
        loc.mkdir(parents=True, exist_ok=True)
        (loc / "part-0").write_text("data")
        (loc / "_SUCCESS").write_text("")  # markers LAST, like Spark

    return build


def test_exactly_one_thread_builds(tmp_path):
    loc = tmp_path / "tbl"
    calls: list = []
    outcomes: list[str] = []
    build = _mk_build(loc, calls, sleep=0.3)

    def run() -> None:
        outcomes.append(
            build_exclusive(loc, build, lambda: (loc / "_SUCCESS").exists())
        )

    threads = [threading.Thread(target=run) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1, f"build_fn ran {len(calls)} times"
    assert sorted(outcomes) == ["adopted"] * 7 + ["built"]
    assert (loc / "_SUCCESS").exists()
    assert not (tmp_path / "_BUILDING.tbl").exists(), "lock leaked"


def test_complete_dir_adopted_without_lock_traffic(tmp_path):
    loc = tmp_path / "tbl"
    calls: list = []
    _mk_build(loc, [])()  # pre-complete the dir
    out = build_exclusive(
        loc, _mk_build(loc, calls), lambda: (loc / "_SUCCESS").exists()
    )
    assert out == "adopted" and calls == []


def test_lock_released_on_build_failure_then_retry_builds(tmp_path):
    loc = tmp_path / "tbl"

    def boom() -> None:
        raise RuntimeError("mid-build crash (clean)")

    with pytest.raises(RuntimeError):
        build_exclusive(loc, boom, lambda: False)
    assert not (tmp_path / "_BUILDING.tbl").exists(), (
        "a failed build must release the lock so a retry can acquire it"
    )
    calls: list = []
    out = build_exclusive(
        loc, _mk_build(loc, calls), lambda: (loc / "_SUCCESS").exists()
    )
    assert out == "built" and len(calls) == 1


def test_dead_holder_lock_is_broken(tmp_path):
    loc = tmp_path / "tbl"
    # A pid that cannot be alive: fork a child that exits immediately,
    # then stamp ITS pid into the lock — a real SIGKILLed-holder relic.
    child = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(child.stdout.strip())
    (tmp_path / "_BUILDING.tbl").write_text(str(dead_pid))
    calls: list = []
    out = build_exclusive(
        loc,
        _mk_build(loc, calls),
        lambda: (loc / "_SUCCESS").exists(),
        timeout_sec=10,
    )
    assert out == "built" and len(calls) == 1


def test_live_holder_times_out_loudly(tmp_path):
    loc = tmp_path / "tbl"
    # Our own pid is definitionally alive; with no markers appearing the
    # waiter must raise rather than break the lock or spin forever.
    (tmp_path / "_BUILDING.tbl").write_text(str(os.getpid()))
    with pytest.raises(TimeoutError):
        build_exclusive(
            loc,
            lambda: None,
            lambda: False,
            timeout_sec=1.0,
            poll_sec=0.05,
        )


_WORKER = r"""
import json, sys, time
from pathlib import Path

repo, warehouse, go_file = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("build-lock-worker")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from data_engineering_capstone_project_spark.plans.similarity_search import (
    pq_codes_table,
)

print("READY", flush=True)
while not Path(go_file).exists():  # barrier: start both builds together
    time.sleep(0.05)
df = pq_codes_table(spark, "/root/testdata/sf0.001")
rows = sorted((r.vec_id, r.s, r.code) for r in df.collect())
print("RESULT " + json.dumps({"n": len(rows), "rows": rows[:5], "tail": rows[-5:]}), flush=True)
spark.stop()
"""


def test_two_process_concurrent_first_build(tmp_path):
    """The SURVEY round-6-close scenario: two processes (separate JVMs,
    in-memory catalogs — neither can see the other's registration) hit
    pq_codes_table for the same never-built fingerprint at the same
    instant. Done-condition from VERDICT r6 #4: both succeed, both
    serve identical rows, exactly one complete dir, no lock leak."""
    warehouse = tmp_path / "wh"
    warehouse.mkdir()
    go_file = tmp_path / "go"
    procs = []
    for i in range(2):
        cwd = tmp_path / f"p{i}"  # distinct CWDs: no derby/log collisions
        cwd.mkdir()
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    _WORKER,
                    str(_REPO),
                    str(warehouse),
                    str(go_file),
                ],
                cwd=cwd,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    # Release the barrier only once BOTH sessions are up, so the two
    # pq_codes_table calls genuinely overlap instead of serializing on
    # JVM startup variance.
    deadline = time.monotonic() + 240

    def read_until_ready(p) -> list[str]:
        lines: list[str] = []
        while time.monotonic() < deadline:
            line = p.stdout.readline()
            if not line:
                break
            lines.append(line)
            if line.startswith("READY"):
                return lines
        raise AssertionError(
            f"worker never reached READY; out={''.join(lines)!r} "
            f"err={p.stderr.read()!r}"
        )

    for p in procs:
        read_until_ready(p)
    go_file.write_text("")
    results = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        payload = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert payload, f"no RESULT line: {out!r}"
        results.append(json.loads(payload[-1][len("RESULT ") :]))
    assert results[0] == results[1], "processes served different rows"
    assert results[0]["n"] > 0
    dirs = [d for d in warehouse.iterdir() if d.name.startswith("pq_codes_")]
    assert len(dirs) == 1, f"expected one codes dir, found {dirs}"
    assert (dirs[0] / "_SUCCESS").exists()
    assert not list(warehouse.glob("_BUILDING.*")), "lock leaked"


def test_sigkilled_holder_partial_dir_is_rebuilt(tmp_path):
    """End-to-end crashed-holder recovery: a real subprocess acquires
    the lock, writes PARTIAL output (data file, no _SUCCESS), then
    SIGKILLs itself — the lock file survives with the dead pid inside,
    exactly what an OOM-killed builder leaves. A later caller must
    break the lock via pid-liveness, clear the marker-less partial,
    and rebuild."""
    import signal

    loc = tmp_path / "tbl"
    crasher = (
        "import os, sys, signal\n"
        "sys.path.insert(0, sys.argv[1])\n"
        "from pathlib import Path\n"
        "from data_engineering_capstone_project_spark.sources.writers"
        " import build_exclusive\n"
        "loc = Path(sys.argv[2])\n"
        "def build():\n"
        "    loc.mkdir()\n"
        "    (loc / 'part-0').write_text('PARTIAL GARBAGE')\n"
        "    os.kill(os.getpid(), signal.SIGKILL)\n"
        "build_exclusive(loc, build, lambda: (loc / '_SUCCESS').exists())\n"
    )
    p = subprocess.run(
        [sys.executable, "-c", crasher, str(_REPO), str(loc)],
        capture_output=True,
    )
    assert p.returncode == -signal.SIGKILL
    lock = tmp_path / "_BUILDING.tbl"
    assert lock.exists(), "SIGKILL must leave the lock behind"
    assert (loc / "part-0").exists() and not (loc / "_SUCCESS").exists()

    calls: list = []

    def rebuild() -> None:
        calls.append(1)
        # the marker-less partial is the builder's to clear
        import shutil

        if loc.exists():
            shutil.rmtree(loc)
        loc.mkdir()
        (loc / "part-0").write_text("good data")
        (loc / "_SUCCESS").write_text("")

    out = build_exclusive(
        loc, rebuild, lambda: (loc / "_SUCCESS").exists(), timeout_sec=30
    )
    assert out == "built" and calls == [1]
    assert (loc / "part-0").read_text() == "good data"
    assert not lock.exists()


def test_recycled_pid_lock_is_broken_via_starttime(tmp_path):
    """Pid-reuse defense: a lock stamped with a LIVE pid but the wrong
    /proc starttime is a dead holder whose pid was recycled — it must
    be broken and rebuilt, not waited on until timeout."""
    loc = tmp_path / "tbl"
    (tmp_path / "_BUILDING.tbl").write_text(f"{os.getpid()}:999999999")
    calls: list = []
    out = build_exclusive(
        loc,
        _mk_build(loc, calls),
        lambda: (loc / "_SUCCESS").exists(),
        timeout_sec=10,
    )
    assert out == "built" and len(calls) == 1


def test_unparseable_lock_content_waits_then_times_out(tmp_path):
    """Foreign/corrupted lock content must be treated as a LIVE holder
    (waiting is safe, breaking is not) and bounded by the deadline —
    the r7 review found the old loop busy-spun forever on it."""
    loc = tmp_path / "tbl"
    (tmp_path / "_BUILDING.tbl").write_text("not-a-pid")
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        build_exclusive(
            loc, lambda: None, lambda: False, timeout_sec=1.0, poll_sec=0.05
        )
    elapsed = time.monotonic() - t0
    assert 0.9 <= elapsed < 5, f"deadline not honored: {elapsed}s"


def test_break_is_serialized_by_breaker_lock(tmp_path):
    """While another process holds the BREAKER lock (fresh mtime), a
    waiter must NOT unlink the dead-pid main lock itself — double
    unlink is the two-waiter race that could delete a new holder's
    freshly acquired lock. With the breaker held and never released,
    the waiter waits out its deadline."""
    child = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(child.stdout.strip())
    loc = tmp_path / "tbl"
    lock = tmp_path / "_BUILDING.tbl"
    lock.write_text(str(dead_pid))
    (tmp_path / "_BUILDING.tbl.breaker").write_text("held")
    with pytest.raises(TimeoutError):
        build_exclusive(
            loc, lambda: None, lambda: False, timeout_sec=1.5, poll_sec=0.05
        )
    assert lock.exists(), "waiter must not unlink outside the breaker"


def test_stale_breaker_relic_is_cleared_and_break_proceeds(tmp_path):
    """A breaker file older than 60s is a crashed breaker's relic; the
    next waiter clears it and completes the break."""
    child = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(child.stdout.strip())
    loc = tmp_path / "tbl"
    (tmp_path / "_BUILDING.tbl").write_text(str(dead_pid))
    breaker = tmp_path / "_BUILDING.tbl.breaker"
    breaker.write_text("relic")
    old = time.time() - 120
    os.utime(breaker, (old, old))
    calls: list = []
    out = build_exclusive(
        loc,
        _mk_build(loc, calls),
        lambda: (loc / "_SUCCESS").exists(),
        timeout_sec=10,
    )
    assert out == "built" and len(calls) == 1
    assert not breaker.exists()
    # The r8 rename-based cleanup must not leak its trash names.
    leftovers = [p.name for p in tmp_path.glob("_BUILDING.*")]
    assert not leftovers, f"lock trash leaked: {leftovers}"


_RELIC_RACE_WORKER = r"""
import json, os, sys, time
from pathlib import Path

repo, loc, go_file = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
from data_engineering_capstone_project_spark.sources.writers import (
    build_exclusive,
)

loc = Path(loc)
print("READY", flush=True)
while not Path(go_file).exists():  # barrier: race the relic cleanup
    time.sleep(0.01)


def build() -> None:
    loc.mkdir(parents=True, exist_ok=True)
    with open(loc / "builder_pids", "a") as f:  # append: double-build shows
        f.write(f"{os.getpid()}\n")
    (loc / "_SUCCESS").write_text("")


out = build_exclusive(
    loc, build, lambda: (loc / "_SUCCESS").exists(),
    timeout_sec=30, poll_sec=0.02,
)
print("RESULT " + json.dumps({"outcome": out}), flush=True)
"""


def test_two_waiters_race_on_stale_relic(tmp_path):
    """The r8 advice scenario: a dead main lock plus a >60s breaker
    relic, hit by TWO waiters at the same instant. The old unlink-based
    relic cleanup let one waiter delete the other's FRESH breaker,
    opening a double-breaker (and ultimately double-builder) window;
    the rename-based cleanup has one winner. Assert exactly one build,
    both processes succeed, and no lock/breaker/trash files remain."""
    child = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(child.stdout.strip())
    loc = tmp_path / "tbl"
    (tmp_path / "_BUILDING.tbl").write_text(str(dead_pid))
    breaker = tmp_path / "_BUILDING.tbl.breaker"
    breaker.write_text("relic")
    old = time.time() - 120
    os.utime(breaker, (old, old))

    go_file = tmp_path / "go"
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                _RELIC_RACE_WORKER,
                str(_REPO),
                str(loc),
                str(go_file),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for _ in range(2)
    ]
    for p in procs:
        assert p.stdout.readline().startswith("READY")
    go_file.write_text("")
    outcomes = []
    for p in procs:
        out, err = p.communicate(timeout=60)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        payload = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert payload, f"no RESULT line: {out!r}"
        outcomes.append(json.loads(payload[-1][len("RESULT ") :])["outcome"])
    assert sorted(outcomes) == ["adopted", "built"], outcomes
    pids = (loc / "builder_pids").read_text().split()
    assert len(pids) == 1, f"double build: {pids}"
    leftovers = [p.name for p in tmp_path.glob("_BUILDING.*")]
    assert not leftovers, f"lock trash leaked: {leftovers}"


def test_restore_slot_retries_until_transient_occupier_clears(tmp_path):
    """r9 advice fix: a fresh breaker grabbed by the relic cleanup must
    be RESTORED even when a third process momentarily O_EXCL-holds the
    slot — the old code discarded the grabbed file on FileExistsError,
    leaving the fresh holder file-less so later waiters could acquire
    while it was mid-critical-section. The helper retries until the
    transient occupier clears."""
    import threading

    from data_engineering_capstone_project_spark.sources.writers import (
        _restore_slot,
    )

    src = tmp_path / "grabbed"
    src.write_text("fresh-holder")
    slot = tmp_path / "breaker"
    slot.write_text("third-process")  # transient occupier

    def clear_soon():
        time.sleep(0.15)
        slot.unlink()

    t = threading.Thread(target=clear_soon)
    t.start()
    assert _restore_slot(src, slot, retry_sec=5.0) is True
    t.join()
    assert slot.read_text() == "fresh-holder"


def test_restore_slot_gives_up_on_persistent_occupier(tmp_path):
    """The retry is BOUNDED: a slot that never clears (would need a
    multi-second breaker section on top of the triple race) returns
    False so the caller's documented discard fallback runs instead of
    hanging the waiter."""
    from data_engineering_capstone_project_spark.sources.writers import (
        _restore_slot,
    )

    src = tmp_path / "grabbed"
    src.write_text("fresh-holder")
    slot = tmp_path / "breaker"
    slot.write_text("stuck")
    assert _restore_slot(src, slot, retry_sec=0.1) is False
    assert slot.read_text() == "stuck"  # occupier untouched


def test_release_own_unlinks_only_own_inode(tmp_path):
    """r9 inode-verified release: a holder whose lock file was renamed
    away by a breaker race must NOT unlink the different file now in
    the slot (another process's live lock); it must unlink its own
    file when the slot is untouched."""
    import os

    from data_engineering_capstone_project_spark.sources.writers import (
        _release_own,
    )

    slot = tmp_path / "lock"
    slot.write_text("mine")
    st = os.stat(slot)
    ino = (st.st_dev, st.st_ino)

    # The race being modelled: the holder's file is RENAMED away (its
    # inode stays alive under the trash name, so it cannot be
    # recycled) and a different process's file occupies the slot.
    slot.rename(tmp_path / "grabbed")
    slot.write_text("theirs")
    assert _release_own(slot, ino) is False
    assert slot.read_text() == "theirs"

    # Vanished slot: nothing to release.
    slot.unlink()
    assert _release_own(slot, ino) is False

    # Untouched slot (the normal case): released.
    (tmp_path / "grabbed").rename(slot)
    assert _release_own(slot, ino) is True
    assert not slot.exists()


def test_raced_holder_release_leaves_foreign_lock_alone(tmp_path):
    """Integration pin for the r9 inode-verified release wiring: a
    builder whose lock file is renamed away MID-BUILD (the breaker-race
    shape) must not, at release time, delete the different lock file
    now occupying the slot — that file is another process's live lock,
    and deleting it cascaded the race one more generation."""
    import threading

    from data_engineering_capstone_project_spark.sources.writers import (
        build_exclusive,
    )

    loc = tmp_path / "tbl"
    lock = tmp_path / "_BUILDING.tbl"
    built_gate = threading.Event()
    release_gate = threading.Event()

    def build():
        loc.mkdir(parents=True, exist_ok=True)
        (loc / "_SUCCESS").write_text("")
        built_gate.set()
        assert release_gate.wait(30)  # hold the build while we race it

    out: list = []
    t = threading.Thread(
        target=lambda: out.append(
            build_exclusive(loc, build, lambda: (loc / "_SUCCESS").exists())
        )
    )
    t.start()
    assert built_gate.wait(30)
    # The race: the holder's lock is renamed away and a "foreign"
    # process's lock takes the slot while the build is still running.
    lock.rename(tmp_path / "stolen")
    lock.write_text("99999:foreign")
    release_gate.set()
    t.join(30)
    assert out == ["built"]
    assert lock.read_text() == "99999:foreign"  # foreign lock survived


def test_restore_slot_handles_vanished_source(tmp_path):
    """A vanished src (another cleaner unlinked the same trash path)
    is 'nothing left to restore', not a crash."""
    from data_engineering_capstone_project_spark.sources.writers import (
        _restore_slot,
    )

    assert _restore_slot(tmp_path / "gone", tmp_path / "breaker") is False


def test_last_verified_rounds_parses_double_digit_rounds(tmp_path):
    """Round 10+ artifacts must not be silently dropped (the r7 review
    caught a glob requiring a literal '0' after 'r')."""
    from tools.rotation import last_verified_rounds

    (tmp_path / "CORRECTNESS_r09.json").write_text('{"q_a": {}, "q_b": {}}')
    (tmp_path / "CORRECTNESS_r10.json").write_text('{"q_a": {}}')
    (tmp_path / "CORRECTNESS_r2.json").write_text('{"q_c": {}}')
    got = last_verified_rounds(tmp_path)
    assert got == {"q_a": 10, "q_b": 9, "q_c": 2}


_BKT_WORKER = r"""
import json, sys, time
from pathlib import Path

repo, warehouse, go_file = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("bkt-lock-worker")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from data_engineering_capstone_project_spark.plans.relational import (
    bucketed_orderkey_tables,
)

print("READY", flush=True)
while not Path(go_file).exists():
    time.sleep(0.05)
li, orders = bucketed_orderkey_tables(spark, "/root/testdata/sf0.001")
res = {
    "li": li.count(),
    "orders": orders.count(),
    "joined": li.join(orders, li.l_orderkey == orders.o_orderkey).count(),
}
print("RESULT " + json.dumps(res), flush=True)
spark.stop()
"""


def test_two_process_concurrent_bucketed_pair_build(tmp_path):
    """The bucketed-pair twin of the pq_codes two-process test: both
    processes race the FIRST build of the co-bucketed (lineitem,
    orders) pair over one shared warehouse; both must serve identical
    counts (including through the zero-Exchange join), the pair dirs
    must be complete with agreeing _BUCKETS sidecars, and no lock may
    leak."""
    warehouse = tmp_path / "wh"
    warehouse.mkdir()
    go_file = tmp_path / "go"
    procs = []
    for i in range(2):
        cwd = tmp_path / f"p{i}"
        cwd.mkdir()
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    _BKT_WORKER,
                    str(_REPO),
                    str(warehouse),
                    str(go_file),
                ],
                cwd=cwd,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    deadline = time.monotonic() + 240
    for p in procs:
        while time.monotonic() < deadline:
            line = p.stdout.readline()
            if not line or line.startswith("READY"):
                break
    go_file.write_text("")
    results = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        payload = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert payload, f"no RESULT line: {out!r}"
        results.append(json.loads(payload[-1][len("RESULT ") :]))
    assert results[0] == results[1], "processes served different counts"
    assert results[0]["li"] > 0 and results[0]["joined"] > 0
    # r13 versioned pair store: ONE store dir, ONE published version
    # holding the whole pair (same-host racers wait+adopt through
    # build_exclusive, so no duplicate version), shared _BUCKETS
    # sidecar at the version root, CURRENT pointing at it, no lock leak.
    stores = [d for d in warehouse.iterdir() if d.name.startswith("bktstore_")]
    assert len(stores) == 1, stores
    from data_engineering_capstone_project_spark.sources.writers import (
        resolve_current as _resolve,
    )

    vdir, n = _resolve(stores[0])
    assert n == 1 and (vdir / "_SUCCESS").exists()
    assert (vdir / "_BUCKETS").read_text().isdigit()
    for tbl in ("lineitem", "orders"):
        assert (vdir / tbl / "_SUCCESS").exists(), f"{tbl} incomplete"
    versions = [d.name for d in stores[0].glob("_v*") if d.is_dir()]
    assert versions == ["_v1"], f"duplicate versions built: {versions}"
    assert not list(stores[0].glob("_BUILDING.*")), "lock leaked"


# ---------------------------------------------------------------------------
# commit_build — the cross-host atomic first-build commit (r12, VERDICT r11
# #4). build_exclusive's mutual exclusion is same-host pid liveness; these
# tests pin the layer UNDER it: lockless writers (the cross-host shape, where
# neither can see the other's pid) build into unique fencing-token attempt
# dirs and publish via one atomic rename — exactly one wins, losers adopt,
# and no observer can ever see a partial table at the published location.
# ---------------------------------------------------------------------------

from data_engineering_capstone_project_spark.sources.writers import (  # noqa: E402
    _ATTEMPT_MARK,
    _gc_dead_attempts,
    commit_build,
)


def _mk_build_to(payload: str, n_files: int = 2, success: bool = True):
    def build_to(attempt: str) -> None:
        d = Path(attempt)
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_files):
            (d / f"part-{i}").write_text(f"{payload}-{i}")
        if success:
            (d / "_SUCCESS").write_text("")  # markers LAST, like Spark

    return build_to


def test_commit_build_publishes_complete_dir_with_manifest(tmp_path):
    loc = tmp_path / "tbl"
    out = commit_build(loc, _mk_build_to("a"), {"source_fingerprint": "fp1"})
    assert out == "built"
    assert (loc / "_SUCCESS").exists()
    man = json.loads((loc / "_MANIFEST").read_text())
    # The fencing token is host.pid.starttime.seq of THIS process
    # (rsplit: the hostname itself may contain dots).
    host, pid, _start, _seq = man["token"].rsplit(".", 3)
    import socket

    assert host == socket.gethostname() and int(pid) == os.getpid()
    assert man["source_fingerprint"] == "fp1"
    # The manifest lists the DATA files (itself excluded — it is written
    # after the listing, immediately before the atomic publish).
    listed = {tuple(f) for f in man["files"]}
    actual = {
        (p.relative_to(loc).as_posix(), p.stat().st_size)
        for p in loc.rglob("*")
        if p.is_file() and p.name != "_MANIFEST"
    }
    assert listed == actual and len(listed) == 3  # 2 parts + _SUCCESS
    # no attempt dirs leaked
    assert not list(tmp_path.glob(f"tbl{_ATTEMPT_MARK}*"))


def test_commit_build_second_caller_adopts_without_building(tmp_path):
    loc = tmp_path / "tbl"
    assert commit_build(loc, _mk_build_to("a")) == "built"
    calls: list = []

    def never(attempt: str) -> None:
        calls.append(attempt)

    assert commit_build(loc, never) == "adopted"
    assert calls == []


def test_commit_build_refuses_markerless_build(tmp_path):
    loc = tmp_path / "tbl"
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        commit_build(loc, _mk_build_to("a", success=False))
    assert not loc.exists(), "a marker-less build must never publish"
    assert not list(tmp_path.glob(f"tbl{_ATTEMPT_MARK}*")), "attempt leaked"


def test_commit_build_clears_preprotocol_partial_loc(tmp_path):
    """A marker-less loc (debris from a pre-r12 direct writer that
    crashed) is cleared and rebuilt; a COMPLETE loc is adopted."""
    loc = tmp_path / "tbl"
    loc.mkdir()
    (loc / "part-0").write_text("stale partial, no _SUCCESS")
    assert commit_build(loc, _mk_build_to("fresh")) == "built"
    assert (loc / "part-0").read_text() == "fresh-0"


def test_commit_build_loser_adopts_and_winner_files_survive(tmp_path):
    """Deterministic mid-build race (threads; the protocol is lockless
    so threads exercise the same rename-commit path as remote hosts):
    writer A is still building when writer B publishes; A's commit must
    come back 'adopted', B's files must survive untouched, and A's
    duplicate attempt dir must be cleaned up."""
    loc = tmp_path / "tbl"
    a_building = threading.Event()
    b_published = threading.Event()
    outcomes: dict[str, str] = {}

    def a_build_to(attempt: str) -> None:
        _mk_build_to("A")(attempt)
        a_building.set()
        assert b_published.wait(30)  # hold A until B has committed

    def run_a() -> None:
        outcomes["a"] = commit_build(loc, a_build_to)

    t = threading.Thread(target=run_a)
    t.start()
    assert a_building.wait(30)
    outcomes["b"] = commit_build(loc, _mk_build_to("B"))
    b_published.set()
    t.join(30)
    assert outcomes == {"a": "adopted", "b": "built"}
    assert (loc / "part-0").read_text() == "B-0"
    assert json.loads((loc / "_MANIFEST").read_text())["token"]
    assert not list(tmp_path.glob(f"tbl{_ATTEMPT_MARK}*")), "attempt leaked"


def test_gc_dead_attempts_sweeps_same_host_dead_only(tmp_path):
    import socket

    loc = tmp_path / "tbl"
    host = socket.gethostname()
    child = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(child.stdout.strip())
    dead = tmp_path / f"tbl{_ATTEMPT_MARK}{host}.{dead_pid}.0.0"
    live = tmp_path / f"tbl{_ATTEMPT_MARK}{host}.{os.getpid()}.0.1"
    foreign = tmp_path / f"tbl{_ATTEMPT_MARK}otherhost.12345.0.0"
    for d in (dead, live, foreign):
        d.mkdir()
    _gc_dead_attempts(loc)
    assert not dead.exists(), "same-host dead writer's attempt must be GC'd"
    assert live.exists(), "a live writer's attempt must survive"
    assert foreign.exists(), "a foreign host's attempt must never be probed"


def test_gc_dead_attempts_parses_dotted_hostnames(tmp_path, monkeypatch):
    """The fencing token is host.pid.starttime.seq and hostnames may
    themselves contain dots (host.example.com): the GC must rsplit so
    a dotted same-host dead attempt is still swept and a foreign FQDN
    sharing this host's prefix is still left alone."""
    import socket as socket_mod

    import data_engineering_capstone_project_spark.sources.writers as w

    monkeypatch.setattr(
        socket_mod, "gethostname", lambda: "host.example.com"
    )
    loc = tmp_path / "tbl"
    child = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(child.stdout.strip())
    dead = tmp_path / f"tbl{w._ATTEMPT_MARK}host.example.com.{dead_pid}.0.0"
    prefix_foreign = tmp_path / f"tbl{w._ATTEMPT_MARK}host.{dead_pid}.0.0"
    for d in (dead, prefix_foreign):
        d.mkdir()
    w._gc_dead_attempts(loc)
    assert not dead.exists(), "dotted same-host dead attempt must be GC'd"
    assert prefix_foreign.exists(), (
        "an attempt whose host is a prefix of ours is FOREIGN"
    )


def test_gc_dead_attempts_skips_fallback_starttime_tokens(tmp_path):
    """r13 advice fix: a 't'-tagged time-millis fallback starttime
    (minted when /proc was transiently unreadable at token time) is
    never comparable to a tick-based /proc read — the old compare
    judged a LIVE writer 'recycled' and swept its attempt dir
    mid-build. Liveness still rules: a dead pid sweeps regardless of
    the token form."""
    import socket

    host = socket.gethostname()
    loc = tmp_path / "tbl"
    from data_engineering_capstone_project_spark.sources.writers import (
        _ATTEMPT_MARK as MARK,
    )

    live = tmp_path / f"tbl{MARK}{host}.{os.getpid()}.t1723800000000.0"
    child = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(child.stdout.strip())
    dead = tmp_path / f"tbl{MARK}{host}.{dead_pid}.t1723800000000.1"
    for d in (live, dead):
        d.mkdir()
    _gc_dead_attempts(loc)
    assert live.exists(), "live writer's fallback-token attempt must survive"
    assert not dead.exists(), "dead pid sweeps regardless of token form"


def test_commit_token_fallback_starttime_is_tagged(monkeypatch):
    """The fallback starttime must be distinguishable from a real tick
    count (see test above): tagged 't<millis>'."""
    import data_engineering_capstone_project_spark.sources.writers as w

    monkeypatch.setattr(w, "_proc_starttime", lambda pid: None)
    start = w._commit_token().rsplit(".", 3)[2]
    assert start.startswith("t") and start[1:].isdigit()


def test_commit_build_entry_race_adopts_concurrent_publish(
    tmp_path, monkeypatch
):
    """r13 advice fix (medium): between commit_build's entry _SUCCESS
    probe and its debris clear, a concurrent writer's atomic rename
    can land the COMPLETE winning table at loc. The old
    check-then-rmtree destroyed it — loc then stayed ABSENT for this
    writer's whole rebuild, breaking the 'no reader ever observes a
    partial table' guarantee. Staged deterministically: the table on
    disk is complete, but the first _SUCCESS probe is forced to miss
    (the pre-publish read); the rename-aside must inspect what it
    grabbed, put the winner back, and adopt."""
    loc = tmp_path / "tbl"
    assert commit_build(loc, _mk_build_to("winner")) == "built"
    before = sorted(p.name for p in loc.iterdir())
    real_exists = Path.exists
    raced = {"done": False}

    def missed_once(self):
        if not raced["done"] and self == loc / "_SUCCESS":
            raced["done"] = True
            return False
        return real_exists(self)

    monkeypatch.setattr(Path, "exists", missed_once)

    def never(attempt: str) -> None:
        raise AssertionError("must adopt the published table, not rebuild")

    assert commit_build(loc, never) == "adopted"
    monkeypatch.undo()
    assert sorted(p.name for p in loc.iterdir()) == before
    assert (loc / "part-0").read_text() == "winner-0"
    assert not list(tmp_path.glob("tbl.__debris__*")), "trash leaked"


_COMMIT_RACE_WORKER = r"""
import json, os, sys, time
from pathlib import Path

repo, loc, go_file, payload = sys.argv[1:5]
sys.path.insert(0, repo)
from data_engineering_capstone_project_spark.sources.writers import (
    commit_build,
)

loc = Path(loc)
print("READY", flush=True)
while not Path(go_file).exists():  # barrier: race the commit
    time.sleep(0.01)


def build_to(attempt: str) -> None:
    d = Path(attempt)
    d.mkdir(parents=True, exist_ok=True)
    (d / "part-0").write_text(payload)
    (d / "writer_pid").write_text(str(os.getpid()))
    time.sleep(0.2)  # stretch the build so both writers overlap
    (d / "_SUCCESS").write_text("")


out = commit_build(loc, build_to)
print("RESULT " + json.dumps({"outcome": out, "pid": os.getpid()}), flush=True)
"""


def test_two_lockless_processes_exactly_one_publishes(tmp_path):
    """THE cross-host scenario (r12): two processes race commit_build
    with NO shared lock — the same shape as two hosts whose pid
    liveness is mutually invisible. Exactly one publishes, the loser
    adopts, the published dir is internally consistent (its writer_pid
    matches the winning process and the manifest's fencing token), and
    no attempt dirs remain."""
    loc = tmp_path / "tbl"
    go_file = tmp_path / "go"
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                _COMMIT_RACE_WORKER,
                str(_REPO),
                str(loc),
                str(go_file),
                f"payload-{i}",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        assert p.stdout.readline().startswith("READY")
    go_file.write_text("")
    results = []
    for p in procs:
        out, err = p.communicate(timeout=60)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        payload = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert payload, f"no RESULT line: {out!r}"
        results.append(json.loads(payload[-1][len("RESULT ") :]))
    outcomes = sorted(r["outcome"] for r in results)
    assert outcomes == ["adopted", "built"], results
    winner_pid = next(
        r["pid"] for r in results if r["outcome"] == "built"
    )
    assert (loc / "_SUCCESS").exists()
    assert int((loc / "writer_pid").read_text()) == winner_pid
    man = json.loads((loc / "_MANIFEST").read_text())
    assert int(man["token"].split(".")[1]) == winner_pid
    assert not list(tmp_path.glob(f"tbl{_ATTEMPT_MARK}*")), "attempt leaked"


def test_build_exclusive_composed_with_commit_build(tmp_path):
    """The production wiring (pq_codes_table): build_exclusive
    serializes same-host callers so only ONE pays the build, and that
    build publishes through commit_build — waiters adopt the atomically
    published dir."""
    loc = tmp_path / "tbl"
    calls: list = []

    def build_to(attempt: str) -> None:
        calls.append(threading.get_ident())
        time.sleep(0.2)
        _mk_build_to("x")(attempt)

    outcomes: list[str] = []

    def run() -> None:
        outcomes.append(
            build_exclusive(
                loc,
                lambda: commit_build(loc, build_to),
                lambda: (loc / "_SUCCESS").exists(),
            )
        )

    threads = [threading.Thread(target=run) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1, f"build_to ran {len(calls)} times"
    assert sorted(outcomes) == ["adopted"] * 5 + ["built"]
    assert (loc / "_SUCCESS").exists() and (loc / "_MANIFEST").exists()
    assert not list(tmp_path.glob("_BUILDING.*")), "lock leaked"
    assert not list(tmp_path.glob(f"tbl{_ATTEMPT_MARK}*")), "attempt leaked"


# ---------------------------------------------------------------------------
# Versioned replacement (r13, VERDICT r12 #3): _v{N} dirs over
# commit_build + a CURRENT pointer published by atomic rename.
# ---------------------------------------------------------------------------

from data_engineering_capstone_project_spark.sources.writers import (  # noqa: E402
    _advance_current,
    _read_current,
    commit_build_conditional,
    gc_versions,
    resolve_conditional,
    resolve_current,
    versioned_replace,
)


def test_versioned_replace_builds_monotonic_versions(tmp_path):
    store = tmp_path / "store"
    assert resolve_current(store) == (None, 0)
    p1, n1 = versioned_replace(store, _mk_build_to("one"), {"pin": 16})
    assert n1 == 1 and _read_current(store) == 1
    vdir, n = resolve_current(store)
    assert (vdir, n) == (Path(p1), 1)
    assert (vdir / "part-0").read_text() == "one-0"
    assert json.loads((vdir / "_MANIFEST").read_text())["pin"] == 16
    p2, n2 = versioned_replace(store, _mk_build_to("two"), {"pin": 32})
    assert n2 == 2 and _read_current(store) == 2
    # the replaced version stays on disk for in-flight readers...
    assert (Path(p1) / "part-0").read_text() == "one-0"
    assert (resolve_current(store)[0] / "part-0").read_text() == "two-0"
    # ...until the GC policy sweeps beyond the keep window
    assert gc_versions(store, keep=2) == []
    _, n3 = versioned_replace(store, _mk_build_to("three"))
    assert n3 == 3
    assert gc_versions(store, keep=2) == [str(Path(p1))]
    assert not Path(p1).exists() and Path(p2).exists()


def test_versioned_replace_never_adopts_orphan_version(tmp_path):
    """A crashed replacer can leave a PUBLISHED _v{N} that CURRENT
    never named. Its content is that writer's, not ours: a later
    replace must version-number PAST it, never serve it."""
    store = tmp_path / "store"
    versioned_replace(store, _mk_build_to("live"))
    # orphan _v2: published complete but the pointer was never moved
    assert commit_build(store / "_v2", _mk_build_to("orphan")) == "built"
    assert _read_current(store) == 1
    p, n = versioned_replace(store, _mk_build_to("mine"))
    assert n == 3 and _read_current(store) == 3
    assert (Path(p) / "part-0").read_text() == "mine-0"


def test_advance_current_is_monotonic_and_breaks_stale_lock(tmp_path):
    store = tmp_path / "store"
    store.mkdir()
    _advance_current(store, 3)
    assert _read_current(store) == 3
    _advance_current(store, 2)  # slower lower-version writer
    assert _read_current(store) == 3, "pointer must never regress"
    _advance_current(store, 4)
    assert _read_current(store) == 4
    # a crashed advancer's lock (old mtime) must not wedge the pointer
    lock = store / "CURRENT.lock"
    lock.write_text("")
    old = time.time() - 60
    os.utime(lock, (old, old))
    _advance_current(store, 5, stale_sec=10.0, timeout_sec=10.0)
    assert _read_current(store) == 5
    # a FRESH lock blocks until the deadline, loudly
    lock.write_text("")
    with pytest.raises(TimeoutError):
        _advance_current(store, 6, stale_sec=30.0, timeout_sec=0.3)


_REPLACE_RACE_WORKER = r"""
import json, sys, time
from pathlib import Path

repo, store, go_file, payload = sys.argv[1:5]
sys.path.insert(0, repo)
from data_engineering_capstone_project_spark.sources.writers import (
    versioned_replace,
)

print("READY", flush=True)
while not Path(go_file).exists():  # barrier: race the replace
    time.sleep(0.01)


def build_to(attempt: str) -> None:
    d = Path(attempt)
    d.mkdir(parents=True, exist_ok=True)
    for i in range(3):
        (d / f"part-{i}").write_text(payload)
        time.sleep(0.05)  # stretch the build so the writers overlap
    (d / "_SUCCESS").write_text("")


p, n = versioned_replace(Path(store), build_to, {"writer": payload})
print("RESULT " + json.dumps({"path": p, "version": n}), flush=True)
"""


def test_two_process_concurrent_replace_readers_never_see_a_mix(tmp_path):
    """THE r13 done-criterion (VERDICT r12 #3): two processes replace
    a published store concurrently while a reader loop resolves
    CURRENT and reads the full table each pass. Every read must be one
    internally-consistent version (all files same content, _SUCCESS
    present, manifest's writer matches the files) — old or new, never
    a mix; both replacers must succeed in DISTINCT versions; the
    pointer must converge to the highest."""
    store = tmp_path / "store"
    versioned_replace(store, _mk_build_to("OLD", n_files=3), {"writer": "OLD"})
    go = tmp_path / "go"
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                _REPLACE_RACE_WORKER,
                str(_REPO),
                str(store),
                str(go),
                payload,
            ],
            stdout=subprocess.PIPE,
            text=True,
        )
        for payload in ("NEW_A", "NEW_B")
    ]
    for p in procs:
        assert p.stdout.readline().strip() == "READY"
    go.write_text("")
    results = []
    observed: set[str] = set()
    deadline = time.monotonic() + 120
    # Reader loop concurrent with the race: resolve once, read all.
    while len(results) < 2 and time.monotonic() < deadline:
        vdir, n = resolve_current(store)
        assert vdir is not None and (vdir / "_SUCCESS").exists()
        parts = [
            (vdir / f"part-{i}").read_text().split("-")[0] for i in range(3)
        ]
        assert len(set(parts)) == 1, f"torn read in _v{n}: {parts}"
        man = json.loads((vdir / "_MANIFEST").read_text())
        assert man["writer"] == parts[0], "manifest/file mismatch"
        observed.add(parts[0])
        for p in procs:
            if p not in [r[0] for r in results] and p.poll() is not None:
                out = p.stdout.read()
                line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
                results.append((p, json.loads(line[len("RESULT "):])))
        time.sleep(0.01)
    assert len(results) == 2, "replacers did not finish"
    versions = sorted(r["version"] for _, r in results)
    assert versions == [2, 3], f"replacers must land distinct versions: {versions}"
    assert _read_current(store) == 3, "pointer must converge to the highest"
    # the reader only ever saw full versions
    assert observed <= {"OLD", "NEW_A", "NEW_B"}
    # each writer's returned dir is its own complete table
    for _, r in results:
        d = Path(r["path"])
        assert (d / "_SUCCESS").exists()
        assert json.loads((d / "_MANIFEST").read_text())["writer"] in (
            "NEW_A",
            "NEW_B",
        )


# ---------------------------------------------------------------------------
# Conditional-PUT commit variant (r13, VERDICT r12 #7): same protocol,
# the object store's put-if-absent as the atomic primitive.
# ---------------------------------------------------------------------------


class InMemoryConditionalStore:
    """Object-store fake for the rename-less commit shape: flat
    key->bytes map whose ONE atomic primitive is put_if_absent
    (rejects double-creates, like S3 If-None-Match: * / GCS
    ifGenerationMatch=0). A threading.Lock stands in for the store's
    server-side atomicity."""

    def __init__(self):
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self.conditional_rejections = 0

    def put(self, key: str, data: bytes) -> None:
        with self._lock:
            self._objects[key] = bytes(data)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._lock:
            if key in self._objects:
                self.conditional_rejections += 1
                return False
            self._objects[key] = bytes(data)
            return True

    def get(self, key: str):
        with self._lock:
            return self._objects.get(key)

    def list_prefix(self, prefix: str):
        with self._lock:
            return [k for k in self._objects if k.startswith(prefix)]

    def delete(self, key: str) -> None:
        with self._lock:
            self._objects.pop(key, None)


def _mk_cond_build(payload: str, success: bool = True):
    def build_to(write) -> None:
        for i in range(2):
            write(f"part-{i}", f"{payload}-{i}")
        if success:
            write("_SUCCESS", b"")

    return build_to


def test_conditional_commit_publishes_and_second_adopts():
    store = InMemoryConditionalStore()
    assert commit_build_conditional(store, "tbl", _mk_cond_build("a")) == "built"
    rec = resolve_conditional(store, "tbl")
    assert rec["token"] and rec["attempt_prefix"]
    assert store.get(f"{rec['attempt_prefix']}/part-0") == b"a-0"
    assert store.get(f"{rec['attempt_prefix']}/_SUCCESS") is not None
    calls: list = []
    out = commit_build_conditional(store, "tbl", lambda w: calls.append(w))
    assert out == "adopted" and calls == []


def test_conditional_commit_refuses_markerless_build():
    store = InMemoryConditionalStore()
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        commit_build_conditional(store, "tbl", _mk_cond_build("a", success=False))
    assert resolve_conditional(store, "tbl") is None
    assert store.list_prefix("tbl") == [], "failed attempt's uploads leaked"


def test_conditional_commit_race_exactly_one_wins():
    """The fake-store race (r13 done-criterion for #7): N writers race
    the conditional create; exactly one wins, the store records the
    rejected double-creates, losers' uploads are deleted, and the
    resolved table is the winner's complete upload set."""
    store = InMemoryConditionalStore()
    barrier = threading.Barrier(4)
    outcomes: list[str] = []

    def run(payload: str) -> None:
        def build_to(write) -> None:
            barrier.wait(timeout=30)  # all four upload concurrently
            _mk_cond_build(payload)(write)

        outcomes.append(commit_build_conditional(store, "tbl", build_to))

    threads = [
        threading.Thread(target=run, args=(f"w{i}",)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert sorted(outcomes) == ["adopted", "adopted", "adopted", "built"]
    assert store.conditional_rejections == 3
    rec = resolve_conditional(store, "tbl")
    winner_keys = set(store.list_prefix(rec["attempt_prefix"]))
    assert winner_keys == {
        f"{rec['attempt_prefix']}/part-0",
        f"{rec['attempt_prefix']}/part-1",
        f"{rec['attempt_prefix']}/_SUCCESS",
    }
    # losers' uploads are gone: the only objects left are the winner's
    # prefix plus the commit record
    all_keys = set(store.list_prefix(""))
    assert all_keys == winner_keys | {"tbl/_COMMIT"}
