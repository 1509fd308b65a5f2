"""Bench/probe registry integrity: every headline bench query and
every scale-probe query must be a registered queries() entry (the
bench skips unknown names SILENTLY — a typo or a renamed query would
shrink the bench total and read as a speedup across rounds)."""

from __future__ import annotations

from pathlib import Path

import pytest

import bench
import tools.scale_probe as sp

import __spark_entry__ as entry_mod


def test_headline_queries_all_registered_with_oracles():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == [], f"headline names not registered: {missing}"
    no_oracle = [n for n in bench.HEADLINE if n not in oracles]
    assert no_oracle == [], f"headline names without oracle: {no_oracle}"


def test_driver_sample_first_all_registered():
    qs = entry_mod.queries()
    missing = [n for n in entry_mod._DRIVER_SAMPLE_FIRST if n not in qs]
    assert missing == [], f"sample-first names not registered: {missing}"


def test_rotation_matches_artifacts():
    """VERDICT r6 #2: the driver-sample order must BE the
    least-recently-verified order derived from CORRECTNESS_r0*.json
    (modulo the declared new/changed-first priority head) — this test
    fails if the entry-module order ever diverges from the generator,
    and the generator's own invariants are pinned below."""
    from pathlib import Path

    from data_engineering_capstone_project_spark.plans import QUERIES
    from tools.rotation import last_verified_rounds, rotation_order

    repo = Path(entry_mod.__file__).resolve().parent
    last = last_verified_rounds(repo)
    expect = rotation_order(QUERIES, last, entry_mod._PRIORITY)
    assert entry_mod._DRIVER_SAMPLE_FIRST == expect
    # Full permutation of the registry: nothing dropped, nothing extra.
    assert sorted(expect) == sorted(QUERIES)
    # Priority head leads verbatim (every declared name must exist —
    # a typo here would silently demote a changed query to the tail).
    missing = [n for n in entry_mod._PRIORITY if n not in QUERIES]
    assert missing == [], f"priority names not registered: {missing}"
    head = expect[: len(entry_mod._PRIORITY)]
    assert head == entry_mod._PRIORITY
    # After the head: staleness is monotone non-decreasing, with
    # never-sampled (round 0) queries first and names alphabetical
    # within a round.
    tail_keys = [(last.get(n, 0), n) for n in expect[len(head) :]]
    assert tail_keys == sorted(tail_keys)


def test_rotation_order_unit():
    from tools.rotation import rotation_order

    names = ["a", "b", "c", "d", "e"]
    last = {"a": 3, "b": 1, "d": 1}  # c, e never sampled
    # priority dedupes, ignores unknowns, leads; tail is (round, name)
    got = rotation_order(names, last, ["d", "zz", "d"])
    assert got == ["d", "c", "e", "b", "a"]
    assert rotation_order(names, last) == ["c", "e", "b", "d", "a"]


def test_probe_list_all_registered():
    import ast
    import inspect

    # The probes list lives inside _run_probes; extract it statically
    # so this guard needs no SparkSession.
    tree = ast.parse(inspect.getsource(sp))
    names: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if getattr(t, "id", None) == "probes" and isinstance(
                    node.value, ast.List
                ):
                    names = [
                        c.value
                        for c in node.value.elts
                        if isinstance(c, ast.Constant)
                    ]
    assert names, "could not locate the probes list"
    qs = entry_mod.queries()
    missing = [n for n in names if n not in qs]
    assert missing == [], f"probe names not registered: {missing}"


def test_rotation_order_properties():
    """Property pin for the rotation generator: for arbitrary
    (names, last-verified, priority) inputs, the output is a
    permutation of names, the known priority entries lead verbatim
    (deduplicated), and the tail is exactly sorted by
    (last-verified round, name) with missing entries treated as
    round 0."""
    from hypothesis import given, strategies as st

    from tools.rotation import rotation_order

    name = st.text(
        alphabet="abcdefgh_", min_size=1, max_size=8
    )

    @given(
        names=st.lists(name, max_size=30, unique=True),
        last=st.dictionaries(name, st.integers(0, 9), max_size=30),
        priority=st.lists(name, max_size=10),
    )
    def check(names, last, priority):
        got = rotation_order(names, last, priority)
        assert sorted(got) == sorted(names)
        want_head = []
        seen = set()
        for n in priority:
            if n in set(names) and n not in seen:
                want_head.append(n)
                seen.add(n)
        assert got[: len(want_head)] == want_head
        tail_keys = [(last.get(n, 0), n) for n in got[len(want_head) :]]
        assert tail_keys == sorted(tail_keys)

    check()


def test_choose_series_prefers_stabler_canary():
    """r9 canary gate: the recorded bench series is whichever run has
    the smaller |canary drift|; the record is flagged unstable only
    when even the chosen run sits outside the +-5% band."""
    a = {"drift_pct": -21.8}
    b = {"drift_pct": 1.7}
    chosen, unstable, reruns = bench.choose_series(a, b)
    assert chosen is b and not unstable and reruns == 1

    # Both drifting: the less-bad one is recorded, flagged unstable.
    c = {"drift_pct": 9.0}
    chosen, unstable, _ = bench.choose_series(a, c)
    assert chosen is c and unstable

    # Stable first run, no rerun requested.
    chosen, unstable, reruns = bench.choose_series(b, None)
    assert chosen is b and not unstable and reruns == 0

    # A failed canary (None drift) is infinitely unstable: lose to any
    # measured rerun, and flag unstable if it is all there is.
    d = {"drift_pct": None}
    chosen, unstable, _ = bench.choose_series(d, c)
    assert chosen is c and unstable
    chosen, unstable, _ = bench.choose_series(d, None)
    assert chosen is d and unstable


def test_steal_pct_arithmetic():
    """steal_pct = delta / (elapsed * HZ * ncpus) * 100, pure: 1 CPU
    fully stolen for the whole window on a 32-CPU/100Hz box = 3.12%."""
    assert bench.steal_pct(100 * 60, 60.0, ncpus=32, hz=100) == 3.12
    # full capacity stolen
    assert bench.steal_pct(100 * 60 * 32, 60.0, ncpus=32, hz=100) == 100.0
    # unreadable counter / degenerate window -> None, never a flag
    assert bench.steal_pct(None, 60.0) is None
    assert bench.steal_pct(500, 0.0) is None


_HAS_PROC_STAT = Path("/proc/stat").exists()


@pytest.mark.skipif(
    not _HAS_PROC_STAT,
    reason="no /proc/stat: bench.py itself degrades steal to None here",
)
def test_proc_stat_steal_readable_on_this_host():
    """The counter must parse on a Linux build/driver box: a
    cumulative non-negative integer, monotone across two reads.
    Skipped where /proc/stat doesn't exist (r12 advice fix: the code
    deliberately degrades to None on non-Linux hosts; the suite must
    stay as portable as the code it pins)."""
    a = bench._proc_stat_steal()
    b = bench._proc_stat_steal()
    assert isinstance(a, int) and a >= 0
    assert isinstance(b, int) and b >= a


def test_choose_series_steal_gate():
    """r11 steal gate: a steal-contaminated series loses to a clean
    one even when its canary drift is SMALLER (steal inflates every
    absolute timing while the canary can stay flat); the chosen
    series is flagged unstable if even it exceeds the steal gate; a
    missing steal reading (non-Linux) degrades to the r9 drift rule."""
    stolen_flat = {"drift_pct": 0.5, "steal_pct": 11.6}
    clean = {"drift_pct": 3.0, "steal_pct": 0.1}
    chosen, unstable, reruns = bench.choose_series(stolen_flat, clean)
    assert chosen is clean and not unstable and reruns == 1

    # both stolen: smaller drift wins, record flagged unstable
    stolen2 = {"drift_pct": 4.0, "steal_pct": 2.5}
    chosen, unstable, _ = bench.choose_series(stolen_flat, stolen2)
    assert chosen is stolen_flat and unstable

    # steal alone flags a drift-stable single series
    chosen, unstable, _ = bench.choose_series(stolen_flat, None)
    assert chosen is stolen_flat and unstable

    # missing steal reading is not a flag (r9 behavior preserved)
    legacy = {"drift_pct": 1.7}
    chosen, unstable, _ = bench.choose_series(legacy, None)
    assert chosen is legacy and not unstable


def test_scale_probe_rows_carry_provenance_stamp():
    """r11 (VERDICT r10 #4): every probe-ledger row carries code_rev +
    steal/load fields via _env_start/_env_fields, so pre-fix vs
    post-fix vs steal-contaminated legs are machine-distinguishable.
    The steal arithmetic is bench.py's (one definition)."""
    import time as _time

    from tools import scale_probe as sp

    start = sp._env_start()
    assert set(start) == {"steal", "load", "t"}
    _time.sleep(0.05)
    fields = sp._env_fields(start)
    assert set(fields) == {
        "code_rev",
        "steal_jiffies_delta",
        "steal_pct",
        "load_avg",
    }
    # on a Linux host the counters must be real readings; elsewhere
    # the code degrades them to None by design (r12 advice fix)
    if _HAS_PROC_STAT:
        assert fields["steal_jiffies_delta"] is not None
        assert fields["steal_jiffies_delta"] >= 0
    assert len(fields["load_avg"]) == 2


@pytest.mark.slow  # ~3 min: runs the whole bench CLI (r14 split)
def test_bench_cli_emits_parseable_summary_line():
    """End-to-end pin of the driver's bench contract (the r7 parse
    regression class: an oversized/clipped stdout line left
    BENCH_r07.json with parsed:null): run bench.py as a subprocess at
    the smallest SF and assert the LAST stdout line is one JSON
    object carrying every field the driver and the comparable-series
    tooling read. ~60-90s; sf0.001 keeps it suite-friendly."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_WARM_DIR="/root/testdata/sf0.001",
        # never clobber the repo's recorded detail/anchor sidecar
        SPARK_GRAFT_DETAIL_PATH="/tmp/bench_detail_test.json",
    )
    proc = subprocess.run(
        [sys.executable, str(repo / "bench.py")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(repo),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    for field in (
        "metric",
        "value",
        "value_comparable",
        "unit",
        "queries",
        "runs_per_query",
        "canary_drift_pct",
        "canary_reruns",
        "steal_pct",
        "steal_jiffies_delta",
        "load_avg",
        "detail",
        "sf",
    ):
        assert field in rec, (field, line[:200])
    assert rec["unit"] == "sec" and rec["queries"], rec["metric"]
    assert rec["sf"] == 0.001
    assert "errors" not in rec, rec.get("errors")
    # non-default protocol: the run may record detail to the override
    # path but must NOT have minted a stable_anchor from itself; run
    # provenance is the per-run field now (r13), and the anchor itself
    # never carries the legacy mutable flag.
    detail = json.loads(Path("/tmp/bench_detail_test.json").read_text())
    assert detail.get("anchor_from_this_run") is False
    a = detail.get("stable_anchor")
    assert a is None or "from_this_run" not in a, a
    # every attempt row carries the fixed-work calibration (r13)
    for row in detail["attempts"]:
        assert row["calib_cpu_s"] and row["calib_cpu_s"] > 0, row
        assert "calib_scan_s" in row, row


def test_choose_series_failed_canary_rerun_never_wins_on_steal_alone():
    """r12 advice fix: a rerun whose canary FAILED entirely (drift
    None) must not beat a first series with a healthy canary just
    because the first measured steal a hair over the gate — a dead
    canary is a stronger broken-run signal than mild steal. Both
    outcomes stay flagged unstable."""
    first = {"drift_pct": 2.0, "steal_pct": 1.2}  # healthy canary, mild steal
    rerun = {"drift_pct": None, "steal_pct": 0.1}  # canary threw
    chosen, unstable, reruns = bench.choose_series(first, rerun)
    assert chosen is first and unstable and reruns == 1


def test_choose_best_errors_fold_into_key():
    """A series that dropped queries has an incomparable total: it
    loses to an error-free series even with a flatter canary."""
    errored = {"drift_pct": 0.2, "steal_pct": 0.1, "errors": {"q": "boom"}}
    clean = {"drift_pct": 3.0, "steal_pct": 0.1, "errors": {}}
    chosen, unstable, _ = bench.choose_best([errored, clean])
    assert chosen is clean and not unstable


def test_choose_best_all_errored_attempts_flag_unstable():
    """r13 advice fix: when EVERY attempt dropped queries, the chosen
    record must carry unstable:true even with a flat canary and low
    steal — its total excludes the failures, so it is incomparable
    across rounds (the same definition series_stable and _series_key
    already use; the flag was the one surface that disagreed)."""
    a = {"drift_pct": 0.2, "steal_pct": 0.1, "errors": {"q": "boom"}}
    b = {"drift_pct": 0.1, "steal_pct": 0.0, "errors": {"q2": "boom"}}
    chosen, unstable, _ = bench.choose_best([a, b])
    assert unstable, "an errored-only hunt must never record a stable series"
    assert chosen is b  # still picks the flatter canary among equals


def test_canary_panel_median_drift_arithmetic():
    """r12 (VERDICT r11 #2): drift is the MEDIAN of per-query
    best-of drifts over the panel; fewer than 2 measured pairs ->
    None (broken canary flags, never passes)."""
    start = {"a": [1.0, 0.9], "b": [2.0], "c": [0.5, 0.6]}
    end = {"a": [0.99, 1.08], "b": [2.2], "c": [0.55]}
    # per-query drifts: a +10%, b +10%, c +10%
    assert bench.canary_drift_pct(start, end) == 10.0
    # one missing side drops that query from the panel, median of rest
    assert bench.canary_drift_pct(
        {"a": [1.0], "b": [1.0], "c": None}, {"a": [1.05], "b": [1.07]}
    ) == 6.0
    # fewer than two measured pairs: None
    assert bench.canary_drift_pct({"a": [1.0]}, {"a": [1.0]}) is None
    assert bench.canary_drift_pct(None, None) is None
    assert bench.canary_drift_pct({"a": [0.0], "b": [1.0]}, {"a": [1.0], "b": [1.0]}) is None


def test_single_small_query_wobble_cannot_reject_quiet_run():
    """THE r11 failure (VERDICT r11 #2, demonstrated with its recorded
    shape): a steal-clean run where ONE 0.35s canary wobbles ±50 ms
    (±15% relative) while the rest of the panel is flat must now pass
    the gate — the median absorbs the outlier."""
    start = {"top_tokens": [0.35], "parse_event_props": [0.23], "label_centroids": [0.22]}
    end = {"top_tokens": [0.296], "parse_event_props": [0.231], "label_centroids": [0.221]}
    d = bench.canary_drift_pct(start, end)  # -15.3%, +0.4%, +0.5%
    assert d is not None and abs(d) <= bench.DRIFT_GATE_PCT
    s = {"drift_pct": d, "steal_pct": 0.07, "errors": {}}
    assert bench.series_stable(s), (
        "a steal-clean run with one wobbling small canary must be "
        "anchor-eligible now"
    )
    # ...while a REAL shift (whole panel moves together) still flags
    shifted = {q: [v[0] * 1.12] for q, v in start.items()}
    d2 = bench.canary_drift_pct(start, shifted)
    assert d2 is not None and abs(d2) > bench.DRIFT_GATE_PCT


def test_series_stable_gates():
    assert bench.series_stable(
        {"drift_pct": 1.0, "steal_pct": 0.5, "errors": {}}
    )
    assert not bench.series_stable({"drift_pct": None, "steal_pct": 0.0})
    assert not bench.series_stable({"drift_pct": 9.0, "steal_pct": 0.0})
    assert not bench.series_stable({"drift_pct": 1.0, "steal_pct": 2.0})
    assert not bench.series_stable(
        {"drift_pct": 1.0, "steal_pct": 0.5, "errors": {"q": "x"}}
    )
    # missing steal reading (non-Linux) is not a flag, as in the gate
    assert bench.series_stable({"drift_pct": 1.0, "steal_pct": None})


def test_current_round_and_anchor_history():
    """_current_round = newest BENCH_r*.json + 1 (during round N the
    driver has recorded through N-1); ANCHOR_HISTORY carries the
    transcribed r9-r11 anchors the stable_anchor_series builds on."""
    rounds = {e["round"] for e in bench.ANCHOR_HISTORY}
    assert rounds == {"r09", "r10", "r11"}
    r11 = next(e for e in bench.ANCHOR_HISTORY if e["round"] == "r11")
    assert r11["value"] == 15.404 and r11["code_rev"] == "4049475"
    repo = Path(bench.__file__).resolve().parent
    import json as _json
    import re as _re

    # Same None-guard as bench._current_round itself: the r13 close
    # added BENCH_r13_c8.json (the driver's 8-core leg), which the
    # glob matches but the round pattern must skip (inherited r14
    # breakage — this derivation crashed on .group of None).
    newest = max(
        int(m.group(1))
        for p in repo.glob("BENCH_r*.json")
        if (m := _re.fullmatch(r"BENCH_r0*(\d+)", p.stem))
    )
    assert bench._current_round() == newest + 1
    # and the tmp-dir form used by unit callers
    assert bench._current_round(Path("/nonexistent-dir-xyz")) == 1
    _ = _json  # imported for symmetry with the CLI test's reader


def test_hunt_stable_stops_on_first_stable_attempt():
    """r12 --until-stable loop contract: stop at the first anchor-grade
    series; sleep between attempts; return EVERY attempt; never exceed
    the budget on a permanently-bad box."""
    script = [
        {"drift_pct": 12.0, "steal_pct": 0.1, "errors": {},
         "timings": {"q": 1.0}},
        {"drift_pct": 1.0, "steal_pct": 8.0, "errors": {},
         "timings": {"q": 1.0}},
        {"drift_pct": 0.5, "steal_pct": 0.2, "errors": {},
         "timings": {"q": 1.0}},
        {"drift_pct": 0.0, "steal_pct": 0.0, "errors": {},
         "timings": {"q": 1.0}},
    ]
    it = iter(script)
    slept: list[float] = []
    attempts = bench.hunt_stable(
        lambda: next(it), max_attempts=6, wait_sec=60, sleep=slept.append
    )
    assert attempts == script[:3]  # stopped at the first stable one
    assert slept == [60, 60]  # one sleep per retry, none after success
    chosen, unstable, reruns = bench.choose_best(attempts)
    assert chosen is script[2] and not unstable and reruns == 2

    # budget exhaustion: a box that never stabilizes terminates flagged
    always_bad = lambda: {  # noqa: E731
        "drift_pct": 30.0, "steal_pct": 9.9, "errors": {},
        "timings": {"q": 1.0},
    }
    attempts = bench.hunt_stable(always_bad, max_attempts=3, wait_sec=0)
    assert len(attempts) == 3
    _, unstable, _ = bench.choose_best(attempts)
    assert unstable

    # the default protocol is the same loop at max_attempts=2
    it2 = iter(script)
    attempts = bench.hunt_stable(lambda: next(it2), max_attempts=2)
    assert len(attempts) == 2


def test_anchor_delta_ratio_table():
    """r13 (VERDICT r12 missing #1): per-query anchor-to-anchor
    ratios, median, and the >flag_ratio regression list."""
    prev = {"a": 1.0, "b": 2.0, "c": 0.5, "gone": 1.0}
    cur = {"a": 1.1, "b": 2.0, "c": 0.8, "new": 3.0}
    d = bench.anchor_delta(prev, cur)
    assert d["ratios"] == {"a": 1.1, "b": 1.0, "c": 1.6}
    assert d["median_ratio"] == 1.1
    assert d["regressed"] == ["c"]
    assert d["flag_ratio"] == bench.ANCHOR_FLAG_RATIO
    # no comparable queries (pre-per-query anchor, no backfill) -> None
    assert bench.anchor_delta(None, cur) is None
    assert bench.anchor_delta({"x": 1.0}, cur) is None
    assert bench.anchor_delta(prev, None) is None


def test_anchor_query_backfill_reproduces_r12_anchor():
    """The transcribed r12 per-query timings must sum to the r12
    anchor's recorded totals exactly (16.793 / 14.511 comparable) —
    the proof they are the minted series, not approximations."""
    q = bench.ANCHOR_QUERY_BACKFILL["r12"]
    assert round(sum(q.values()), 3) == 16.793
    assert (
        round(sum(v for k, v in q.items() if k != "star_schema_summary"), 3)
        == 14.511
    )
    assert set(q) == set(bench.HEADLINE)


def test_update_anchor_records_carry_is_byte_identical():
    """r13 (VERDICT r12 wrong #3): a NON-minting run must carry the
    previous anchor forward without rewriting any field — the legacy
    mutable from_this_run flag is dropped once, everything else is
    byte-identical, and the series is untouched."""
    prev_anchor = {
        "value": 16.793,
        "queries": {"q": 1.0},
        "code_rev": "2077210",
        "minted_round": "r12",
        "minted_attempt": 3,
        "minted_utc": "2026-08-16T01:00:00+00:00",
        "from_this_run": True,  # legacy field from a pre-r13 record
    }
    series = list(bench.ANCHOR_HISTORY) + [{"round": "r12", "value": 16.793}]
    prev = {"stable_anchor": prev_anchor, "stable_anchor_series": series}
    anchor, out_series = bench.update_anchor_records(prev, None)
    expect = {k: v for k, v in prev_anchor.items() if k != "from_this_run"}
    assert anchor == expect
    # a second non-minting pass over its own output changes nothing
    anchor2, series2 = bench.update_anchor_records(
        {"stable_anchor": anchor, "stable_anchor_series": out_series}, None
    )
    assert anchor2 == anchor
    assert series2 == out_series
    # empty history: no anchor to carry
    assert bench.update_anchor_records({}, None)[0] is None


def test_update_anchor_records_mint_attaches_per_query_ratios():
    """A mint must append a per-query series entry and attach the
    ratio table vs the PREVIOUS anchor — including against the r12
    backfill when the carried entry predates queries{}."""
    prev = {
        "stable_anchor": {"value": 16.793, "from_this_run": False},
        "stable_anchor_series": list(bench.ANCHOR_HISTORY)
        + [{"round": "r12", "value": 16.793}],  # no queries{} -> backfill
    }
    q12 = bench.ANCHOR_QUERY_BACKFILL["r12"]
    mint = {
        "value": 15.0,
        "queries": {k: v * 0.9 for k, v in q12.items()},
        "code_rev": "abc1234",
        "minted_round": "r13",
        "minted_attempt": 1,
        "minted_utc": "2026-08-16T12:00:00+00:00",
    }
    anchor, out_series = bench.update_anchor_records(prev, dict(mint))
    vs = anchor["vs_prev_anchor"]
    assert vs["round"] == "r12"
    assert vs["median_ratio"] == 0.9 and vs["regressed"] == []
    assert set(vs["ratios"]) == set(q12)
    last = out_series[-1]
    assert last["round"] == "r13" and last["queries"] == mint["queries"]
    assert last["minted_utc"] == mint["minted_utc"]
    # the carried r12 entry gained its backfilled queries
    r12 = next(e for e in out_series if e.get("round") == "r12")
    assert r12["queries"] == q12
    # a genuine regression is named
    slow = dict(mint, queries=dict(q12, pricing_summary=q12["pricing_summary"] * 2))
    anchor2, _ = bench.update_anchor_records(prev, slow)
    assert anchor2["vs_prev_anchor"]["regressed"] == ["pricing_summary"]


def test_run_calibration_fixed_work_probe():
    """r13 (VERDICT r12 missing #2): the calibration runs non-Spark
    fixed work — a CPU loop and a single-thread decode of the frozen
    parquet file — and must return sane positive timings on this box
    (scan fields may be None only where the frozen file is absent)."""
    import os

    c = bench.run_calibration(iters=1_000_000, reads=2)
    assert c["calib_cpu_s"] > 0
    if os.path.exists(bench.CALIB_SCAN_FILE):
        assert c["calib_scan_s"] > 0
        assert c["calib_scan_bytes"] == os.path.getsize(bench.CALIB_SCAN_FILE)
    # a missing scan file degrades to None, never an exception
    c2 = bench.run_calibration(iters=1_000, scan_file="/nonexistent.parquet")
    assert c2["calib_scan_s"] is None and c2["calib_scan_bytes"] is None


def test_effective_drift_gate_floor_arithmetic():
    """r14 (VERDICT r13 #2): the drift gate gains an absolute floor —
    max(base%, CANARY_FLOOR_SEC as % of the panel's median best
    timing) — so a ±40 ms JIT wobble on a 0.2 s panel can no longer
    flag a steal-clean series, while a panel of >=1.2 s queries keeps
    the plain 5% gate."""
    # 0.2 s median panel: 60 ms floor = 30%
    start = {"a": [0.21, 0.25], "b": [0.20], "c": [0.15]}
    end = {"a": [0.22], "b": [0.21], "c": [0.16]}
    assert bench.effective_drift_gate(start, end) == 30.0
    # heavy panel (median 2.0 s): floor term 3% < 5% -> base gate
    heavy_s = {"a": [2.0], "b": [2.1], "c": [1.9]}
    heavy_e = {"a": [2.05], "b": [2.0], "c": [2.0]}
    assert bench.effective_drift_gate(heavy_s, heavy_e) == bench.DRIFT_GATE_PCT
    # no measured pairs: fall back to the base gate (drift None
    # already flags the series through the broken-canary path)
    assert bench.effective_drift_gate(None, None) == bench.DRIFT_GATE_PCT
    assert bench.effective_drift_gate({"a": [0.2]}, {}) == bench.DRIFT_GATE_PCT


def test_series_stable_honors_recorded_floor_gate():
    """A series carrying its measured floor-aware gate is judged
    against IT; legacy dicts without the field keep the fixed-5%
    arithmetic (every pre-r14 test and artifact shape unchanged)."""
    # -14.7% drift on a 0.2s panel (the r14 baseline run's exact
    # failure): gate 30% -> stable now
    s = {"drift_pct": -14.7, "drift_gate_pct": 30.0, "steal_pct": 0.02,
         "errors": {}}
    assert bench.series_stable(s)
    chosen, unstable, _ = bench.choose_best([s])
    assert chosen is s and not unstable
    # the same drift without the recorded gate still flags (legacy)
    legacy = {"drift_pct": -14.7, "steal_pct": 0.02, "errors": {}}
    assert not bench.series_stable(legacy)
    assert bench.choose_best([legacy])[1]
    # a drift beyond even the floor gate still flags
    wild = {"drift_pct": -42.0, "drift_gate_pct": 30.0, "steal_pct": 0.0,
            "errors": {}}
    assert not bench.series_stable(wild)
    assert bench.choose_best([wild])[1]
    # steal still flags independently of the widened drift gate
    stolen = {"drift_pct": 1.0, "drift_gate_pct": 30.0, "steal_pct": 3.0,
              "errors": {}}
    assert not bench.series_stable(stolen)
