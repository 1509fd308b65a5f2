"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

``--until-stable`` (r12, VERDICT r11 #1): instead of the default
first-run + one-rerun protocol, keep running full series (bounded by
$SPARK_GRAFT_STABLE_ATTEMPTS, default 6, spaced
$SPARK_GRAFT_STABLE_WAIT_SEC apart, default 60) until one passes every
gate — |canary drift| <= 5%, steal <= 1%, zero failed queries — and
mint that run as the stable anchor. Two rounds of close-of-round
anchor hunts were done by hand and each tripped one gate; the protocol
does the retrying now, not the builder.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))

# One definition for the default protocol's datasets (r12 advice fix:
# main()'s env-var defaults and the anchor-eligibility check previously
# each hard-coded these literals — a drift between them would silently
# stop minting anchors, or mint them under a changed protocol).
DEFAULT_SF_DIR = "/root/testdata/sf0.1"
DEFAULT_WARM_DIR = "/root/testdata/sf0.001"

DRIFT_GATE_PCT = 5.0
# Steal gate (r11, VERDICT r10 #1): % of the box's total CPU capacity
# stolen by the hypervisor during the timed series. The canary detects
# that the box moved but cannot NAME the cause; /proc/stat steal can —
# both `unstable` rounds (r9, r10) were host CPU steal (~22k jiffies
# measured during one r10 probe leg ≈ 11% of capacity), while a quiet
# run on this box measures 0.0-0.1%. 1% is an order of magnitude above
# quiet noise and an order below the observed contamination.
STEAL_GATE_PCT = 1.0


def _proc_stat_steal() -> int | None:
    """Cumulative steal jiffies summed over all CPUs: field 8 of the
    aggregate `cpu` line in /proc/stat (user nice system idle iowait
    irq softirq STEAL guest guest_nice). None where unreadable (the
    bench must run identically on non-Linux hosts)."""
    try:
        fields = Path("/proc/stat").read_text().splitlines()[0].split()
        if fields[0] != "cpu":
            return None
        return int(fields[8])
    except (OSError, IndexError, ValueError):
        return None


def steal_pct(
    delta: int | None,
    elapsed_sec: float,
    ncpus: int | None = None,
    hz: float | None = None,
) -> float | None:
    """Steal jiffies as a % of the box's total CPU capacity over the
    window: delta / (elapsed * HZ * ncpus) * 100. Pure so tests can
    pin the arithmetic; None when steal was unreadable."""
    if delta is None or elapsed_sec <= 0:
        return None
    if ncpus is None:
        ncpus = os.cpu_count() or 1
    if hz is None:
        try:
            hz = os.sysconf("SC_CLK_TCK")
        except (ValueError, OSError, AttributeError):
            hz = 100.0
    return round(delta / (elapsed_sec * hz * ncpus) * 100, 2)


# Floor-aware canary gate (r14, VERDICT r13 #2): after the r13
# optimizations the three panel queries run 0.15-0.25 s, so ±40 ms of
# JIT/page-cache wobble is ±20% relative — both of the driver's r13
# attempts (and this round's baseline, drift -14.7% at 0.02% steal)
# were flagged unstable on a steal-clean box. The gate now has an
# ABSOLUTE floor: a drift smaller than CANARY_FLOOR_SEC on the panel's
# median-scale query is within the box's per-query timing noise and
# cannot flag the series. The PANEL and the recorded drift_pct series
# are unchanged (comparability preserved); only the accept/reject
# threshold is scale-aware. 60 ms = the measured best-of-3 wobble band
# on this box's sub-second queries (BENCH_DETAIL spreads), an order
# below the ~0.31 s job-submission floor.
CANARY_FLOOR_SEC = 0.060


def effective_drift_gate(
    start: dict | None,
    end: dict | None,
    base_gate: float = DRIFT_GATE_PCT,
    floor_sec: float = CANARY_FLOOR_SEC,
) -> float:
    """max(base_gate, floor_sec as % of the panel's median best
    timing) — the r13-VERDICT-prescribed max(5%, 60 ms/med) gate.
    Falls back to base_gate when no panel query measured both sides
    (the broken-canary case already flags via drift None). Pure so
    tests can pin the arithmetic."""
    bests = []
    for name, s in (start or {}).items():
        e = (end or {}).get(name)
        if s and e and min(s) > 0:
            bests.append(min(min(s), min(e)))
    if not bests:
        return base_gate
    med = statistics.median(bests)
    return round(max(base_gate, floor_sec / med * 100.0), 1)


def canary_drift_pct(
    start: dict | None, end: dict | None
) -> float | None:
    """MEDIAN per-query drift over the canary panel (r12, VERDICT r11
    #2): each canary query's best-of-start vs best-of-end relative
    drift, reduced by the median — so one sub-100ms wobble on one
    small query (the ±50 ms = ±15% false-flag that cost r11 its
    final-rev anchor) cannot reject a steal-clean run; a REAL
    environment shift moves the whole panel and still flags. None when
    fewer than two panel queries measured both sides — a broken canary
    must flag, never pass. Pure so tests can pin the arithmetic."""
    drifts = []
    for name, s in (start or {}).items():
        e = (end or {}).get(name)
        if s and e and min(s) > 0:
            drifts.append((min(e) - min(s)) / min(s) * 100)
    if len(drifts) < 2:
        return None
    return round(statistics.median(drifts), 1)


# Fixed-work calibration probe (r13, VERDICT r12 missing #2): the
# canary panel is itself Spark, so JVM/page-cache state confounds it —
# nothing non-Spark was measured alongside the anchor series, leaving
# the r9->r12 +44% creep attributable only by argument. Every attempt
# now times (a) a pure-Python CPU loop of a FIXED iteration count and
# (b) a single-thread pyarrow decode of a FROZEN parquet file
# (page-cache-warmed by one untimed read, so it measures decode CPU,
# not disk). Same box => same work: if the anchor series moves and the
# calibration moves with it, the box changed; if the calibration is
# flat, the queries did. Constants are part of the series contract —
# changing them breaks comparability, like editing HEADLINE.
CALIB_CPU_ITERS = 10_000_000  # ~1.0s quiet on the reference box
CALIB_SCAN_FILE = "/root/testdata/sf0.1/lineitem.parquet"
CALIB_SCAN_READS = 8  # ~0.5s quiet on the reference box


def run_calibration(
    iters: int = CALIB_CPU_ITERS,
    scan_file: str = CALIB_SCAN_FILE,
    reads: int = CALIB_SCAN_READS,
) -> dict:
    """One calibration sample: {calib_cpu_s, calib_scan_s,
    calib_scan_bytes}. Scan fields are None where the frozen file is
    unavailable (the bench must run identically elsewhere)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(iters):
        x = (x * 1103515245 + i) & 0xFFFFFFFF
    cpu_s = round(time.perf_counter() - t0, 3)
    scan_s = scan_bytes = None
    try:
        import pyarrow.parquet as pq

        scan_bytes = os.path.getsize(scan_file)
        pq.read_table(scan_file, use_threads=False)  # untimed cache warm
        t0 = time.perf_counter()
        for _ in range(reads):
            pq.read_table(scan_file, use_threads=False)
        scan_s = round(time.perf_counter() - t0, 3)
    except Exception:  # noqa: BLE001 — calibration must never fail the bench
        scan_s = scan_bytes = None
    return {
        "calib_cpu_s": cpu_s,
        "calib_scan_s": scan_s,
        "calib_scan_bytes": scan_bytes,
    }


# Any anchor-to-anchor per-query rise above this ratio is named in the
# mint summary (r13, VERDICT r12 missing #1).
ANCHOR_FLAG_RATIO = 1.25


def anchor_delta(
    prev_queries: dict | None,
    cur_queries: dict | None,
    flag_ratio: float = ANCHOR_FLAG_RATIO,
) -> dict | None:
    """Per-query ratio table between two anchors' best-of timings —
    the decomposition the anchor series lacked (r13, VERDICT r12
    missing #1: totals alone could not distinguish 'box got slower'
    from 'five queries each regressed 10%'). None when no query is
    comparable (e.g. the previous anchor predates per-query anchors
    and has no backfill). Pure so tests can pin the arithmetic."""
    ratios = {}
    for q, cur in (cur_queries or {}).items():
        prev = (prev_queries or {}).get(q)
        if prev and prev > 0 and cur is not None:
            ratios[q] = round(cur / prev, 3)
    if not ratios:
        return None
    return {
        "ratios": ratios,
        "median_ratio": round(statistics.median(ratios.values()), 3),
        "flag_ratio": flag_ratio,
        "regressed": sorted(q for q, r in ratios.items() if r > flag_ratio),
    }


def _series_key(
    s: dict, steal_gate: float = STEAL_GATE_PCT
) -> tuple[bool, float]:
    """Selection key, smaller = better: (broken-or-stolen, |drift|).
    A series whose canary FAILED (drift None) or that DROPPED queries
    (errors: its total excludes the failures, so it is incomparable)
    shares the first-element flag with a steal-contaminated one (r12
    advice fix: steal used to dominate the tuple alone, so a rerun
    with NO canary reading could beat a healthy-canary first series on
    0.1% of steal — recording timings from the run whose canary
    threw)."""
    d = s.get("drift_pct")
    sp = s.get("steal_pct")
    stolen = sp is not None and sp > steal_gate
    broken = d is None or bool(s.get("errors"))
    return (stolen or broken, abs(d) if d is not None else float("inf"))


def _series_gate(s: dict, gate: float) -> float:
    """The drift gate a series is judged against: its own recorded
    floor-aware gate (r14 — computed from the panel's timing scale at
    measurement time) when present, else the caller's ``gate``
    (legacy series and the unit tests' bare dicts keep the fixed-5%
    arithmetic)."""
    g = s.get("drift_gate_pct")
    return g if g is not None else gate


def choose_best(
    attempts: list[dict],
    gate: float = DRIFT_GATE_PCT,
    steal_gate: float = STEAL_GATE_PCT,
):
    """The gate selection rule over any number of recorded series
    (r9 canary gate; steal-aware r11; n-attempt --until-stable r12):
    prefer series that are neither steal-contaminated nor
    canary-broken, then the smallest |canary drift| (earliest wins
    ties; a missing steal reading is not a flag, so non-Linux hosts
    degrade to the r9 rule). The chosen record is flagged ``unstable``
    when it drifts outside ±gate% OR its measured steal exceeds the
    steal gate — steal is an independent trigger because a
    steal-contaminated series can show a flat canary while every
    absolute timing is inflated (the exact r10 failure the canary
    could detect but not attribute). Returns
    (series, unstable, reruns)."""
    chosen = min(attempts, key=lambda s: _series_key(s, steal_gate))
    d = chosen.get("drift_pct")
    sp = chosen.get("steal_pct")
    unstable = (
        d is None
        or abs(d) > _series_gate(chosen, gate)
        or (sp is not None and sp > steal_gate)
        # Dropped queries make the total incomparable (it excludes the
        # failures) — the same disqualifier series_stable and
        # _series_key already apply; without this term an all-attempts-
        # erroring hunt recorded unstable:false on a flat canary (r13
        # advice fix; anchor minting was already guarded separately).
        or bool(chosen.get("errors"))
    )
    return chosen, unstable, len(attempts) - 1


def choose_series(
    first: dict,
    rerun: dict | None,
    gate: float = DRIFT_GATE_PCT,
    steal_gate: float = STEAL_GATE_PCT,
):
    """Two-series form of ``choose_best`` (the pinned r9-r11 API)."""
    return choose_best(
        [first] + ([rerun] if rerun is not None else []), gate, steal_gate
    )


def series_stable(
    s: dict,
    gate: float = DRIFT_GATE_PCT,
    steal_gate: float = STEAL_GATE_PCT,
) -> bool:
    """Anchor-grade series: measured canary drift inside the band,
    steal at-or-under the gate, zero failed queries."""
    d = s.get("drift_pct")
    sp = s.get("steal_pct")
    return (
        d is not None
        and abs(d) <= _series_gate(s, gate)
        and not (sp is not None and sp > steal_gate)
        and not s.get("errors")
    )


def _git_rev() -> str | None:
    """Short commit hash of the code that produced an anchor, so a
    carried-forward anchor is attributable. Best-effort: the bench
    must run identically in environments without git."""
    import subprocess

    try:
        return (
            subprocess.run(
                ["git", "-C", str(_REPO), "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
                timeout=10,
                check=True,
            ).stdout.strip()
            or None
        )
    except Exception:  # noqa: BLE001 — anchor provenance is optional
        return None


def _comparable_series() -> dict:
    """value_comparable per recorded round, recomputed from the
    BENCH_r*.json artifacts (sum of per-query timings minus the
    fixed-cost star_schema_summary). Rounds whose record predates the
    field (r4-r7) get it backfilled by the same arithmetic; records
    that failed to parse (r7's clipped line) carry null."""
    series: dict = {}
    for p in sorted(_REPO.glob("BENCH_r*.json")):
        rnd = p.stem.removeprefix("BENCH_")
        try:
            rec = json.loads(p.read_text())
            # The driver wraps the bench's summary line under "parsed"
            # ({n, rc, cpus, tail, parsed}); accept both shapes.
            if "parsed" in rec and "queries" not in rec:
                rec = rec["parsed"]
            qs = rec["queries"]
            series[rnd] = {
                "value": rec.get("value"),
                "value_comparable": round(
                    sum(
                        v
                        for k, v in qs.items()
                        if k != "star_schema_summary"
                    ),
                    3,
                ),
                "unstable": rec.get("unstable", False),
            }
        except (OSError, ValueError, KeyError, TypeError):
            series[rnd] = None
    return series


# Transcribed pre-r12 stable anchors (r12, VERDICT r11 #7) — the head
# of the machine-readable ``stable_anchor_series`` in BENCH_DETAIL.
# Values are the rounds' recorded stable_anchor objects (git history of
# BENCH_DETAIL.json; r9 predates the anchor field — its quiet-box run
# was recorded in PERFORMANCE.md prose, transcribed here with the
# fields that were measured then).
ANCHOR_HISTORY = [
    {
        "round": "r09",
        "value": 11.392,
        "value_comparable": 10.087,
        "canary_drift_pct": None,
        "steal_pct": None,
        "code_rev": None,
        "note": "quiet-box run, pre-anchor-field (PERFORMANCE.md r9)",
    },
    {
        "round": "r10",
        "value": 14.042,
        "value_comparable": 12.403,
        "canary_drift_pct": -2.7,
        "steal_pct": None,
        "code_rev": "d23d129",
    },
    {
        "round": "r11",
        "value": 15.404,
        "value_comparable": 13.57,
        "canary_drift_pct": -3.5,
        "steal_pct": 0.39,
        "code_rev": "4049475",
    },
]


# Per-query best-of-3 timings of anchors minted BEFORE the anchor
# carried a queries{} field (r13, VERDICT r12 missing #1), recovered
# from the committed mint-time BENCH_DETAIL.json (git 2882baf: the
# chosen series' samples; their best-of sum reproduces the r12
# anchor's 16.793 exactly). Lets the first per-query mint (r13)
# compute r12->r13 ratios instead of starting the decomposition a
# round late. r9-r11 anchors predate the samples sidecar — their
# per-query timings are unrecoverable, transcribed as absent.
ANCHOR_QUERY_BACKFILL = {
    "r12": {
        "pricing_summary": 0.384,
        "revenue_by_priority": 0.731,
        "visits_by_region": 0.65,
        "top_nations_by_month": 0.618,
        "distinct_dates": 0.39,
        "star_schema_summary": 2.282,
        "distinct_parts_by_flag": 0.483,
        "views_asof_purchase": 0.571,
        "events_sessionization": 0.378,
        "minhash_lsh_pairs": 0.484,
        "ann_lsh_topk": 0.686,
        "media_meta": 0.433,
        "bm25_topk": 0.665,
        "shipping_priority_q3": 0.812,
        "events_resampled_5min": 0.39,
        "embedding_projection": 0.775,
        "local_supplier_volume_q5": 1.311,
        "conversion_funnel": 0.578,
        "time_weighted_avg": 0.438,
        "returned_revenue_q10": 0.879,
        "disjunctive_revenue_q19": 0.41,
        "quantity_discount_corr": 0.314,
        "volume_shipping_q7": 0.772,
        "sole_late_supplier_q21": 0.956,
        "revenue_by_priority_bucketed": 0.403,
    }
}


def update_anchor_records(
    prev_detail: dict, mint: dict | None
) -> tuple[dict | None, list]:
    """Anchor + series assembly, extracted pure so provenance rules
    are unit-testable (r13, VERDICT r12 wrong #3):

    * A NON-minting run carries the previous anchor forward
      BYTE-IDENTICAL — no field is rewritten (the legacy mutable
      ``from_this_run`` flag, which every later run used to flip, is
      dropped once on first contact; run-provenance now lives in the
      per-run ``anchor_from_this_run`` field instead).
    * A minting run stamps the anchor with immutable provenance
      (``minted_round``/``minted_attempt``/``minted_utc``, written
      here and never touched again), attaches the per-query ratio
      table vs the PREVIOUS anchor (``vs_prev_anchor`` — r13, VERDICT
      r12 missing #1), and appends the anchor to the series.

    Returns (stable_anchor, stable_anchor_series)."""
    prev_anchor = prev_detail.get("stable_anchor")
    hist_rounds = {e["round"] for e in ANCHOR_HISTORY}
    carried = [
        e
        for e in prev_detail.get("stable_anchor_series") or []
        if e.get("round") not in hist_rounds
    ]
    carried = [
        {**e, "queries": ANCHOR_QUERY_BACKFILL[e["round"]]}
        if e.get("round") in ANCHOR_QUERY_BACKFILL and "queries" not in e
        else e
        for e in carried
    ]
    if mint is None:
        anchor = (
            {k: v for k, v in prev_anchor.items() if k != "from_this_run"}
            if prev_anchor is not None
            else None
        )
        return anchor, list(ANCHOR_HISTORY) + carried
    series_before = list(ANCHOR_HISTORY) + carried
    prev_entry = series_before[-1] if series_before else None
    anchor = dict(mint)
    if prev_entry is not None:
        delta = anchor_delta(prev_entry.get("queries"), anchor.get("queries"))
        if delta is not None:
            anchor["vs_prev_anchor"] = {
                "round": prev_entry.get("round"),
                **delta,
            }
    rnd = anchor["minted_round"]
    carried = [e for e in carried if e.get("round") != rnd] + [
        {"round": rnd, **anchor}
    ]
    return anchor, list(ANCHOR_HISTORY) + carried


def _current_round(repo: Path = _REPO) -> int:
    """The round currently RUNNING = newest recorded BENCH_r*.json + 1
    (the driver writes BENCH_r{N} only after round N closes, so during
    round N the newest on disk is N-1). Falls back to 0+1 on a bare
    checkout."""
    rounds = [0]
    for p in repo.glob("BENCH_r*.json"):
        m = re.fullmatch(r"BENCH_r0*(\d+)", p.stem)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


# Queries that exercise the main physical patterns: scan+agg, broadcast
# join chains, window rank, union+distinct, regex extraction, as-of
# join, event-time sessionization, MinHash/LSH dedup, ANN search,
# binary mapInPandas, and explode aggregation.
HEADLINE = [
    "pricing_summary",
    "revenue_by_priority",
    "visits_by_region",
    "top_nations_by_month",
    "distinct_dates",
    # r8: parse_event_props (cheapest entry, 0.23s) swapped for
    # star_schema_summary — reference parity is the project's core
    # claim and had correctness rows but no timing series (VERDICT r7
    # #6). The newcomer runs the WHOLE reference ETL (~1.9s best-of-3,
    # fixed cost — it reads the reference raw files, not sf_dir), so
    # the r8+ total series is ~+1.7s vs r4-r7 BY CONSTRUCTION; compare
    # across the break via the per-query series, as with the r4 swap.
    "star_schema_summary",
    "distinct_parts_by_flag",
    "views_asof_purchase",
    "events_sessionization",
    "minhash_lsh_pairs",
    "ann_lsh_topk",
    "media_meta",
    # r4: the two cheapest r3 entries (label_centroids 0.22s,
    # top_tokens 0.26s) swapped for the round's new operators, keeping
    # the headline count at 25 and the total comparable across rounds.
    "bm25_topk",
    "shipping_priority_q3",
    "events_resampled_5min",
    "embedding_projection",
    "local_supplier_volume_q5",
    "conversion_funnel",
    "time_weighted_avg",
    "returned_revenue_q10",
    "disjunctive_revenue_q19",
    "quantity_discount_corr",
    "volume_shipping_q7",
    "sole_late_supplier_q21",
    "revenue_by_priority_bucketed",
]


def hunt_stable(
    run_series,
    max_attempts: int,
    wait_sec: float = 0.0,
    sleep=time.sleep,
) -> list[dict]:
    """The attempt loop shared by the default protocol (max 2, no
    spacing — the r9 one-rerun rule) and ``--until-stable`` (r12,
    VERDICT r11 #1): run full series until one is anchor-grade
    (``series_stable``) or the attempt budget is spent, sleeping
    ``wait_sec`` between attempts so an --until-stable hunt can ride
    out a steal wave instead of sampling it six times back-to-back.
    Returns every attempt, stable-or-not — the caller keys the best
    with ``choose_best`` and records the rest in the attempts ledger.
    Pure in its inputs (injectable series runner and sleeper) so the
    retry/stop contract is unit-testable without timing anything."""
    attempts = [run_series()]
    while not series_stable(attempts[-1]) and len(attempts) < max_attempts:
        last = attempts[-1]
        print(
            f"bench: attempt {len(attempts)}/{max_attempts}: canary "
            f"drift {last['drift_pct']}% (gate "
            f"±{_series_gate(last, DRIFT_GATE_PCT)}%) / "
            f"steal {last['steal_pct']}% (gate {STEAL_GATE_PCT}%) / "
            f"{len(last['errors'])} errors; rerunning series"
            + (f" in {wait_sec:.0f}s" if wait_sec else ""),
            file=sys.stderr,
        )
        if wait_sec:
            sleep(wait_sec)
        attempts.append(run_series())
    return attempts


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    until_stable = "--until-stable" in argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as e
    from data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = e.queries()

    # Warm the JVM/codegen paths outside the timed region: one untimed
    # pass of every headline query at the smallest SF compiles each
    # plan's whole-stage codegen and JITs the hot loops, so the timed
    # sf0.1 runs measure the plans rather than first-query warmup
    # (measured: the first timed query otherwise varies 0.6-2.1s
    # across runs of the same build).
    # SPARK_GRAFT_WARM_DIR overrides the warm-pass dataset (r7): the
    # default sf0.001 pass compiles each plan's codegen but NOT the
    # target-SF execution profile (AQE re-plans, C2 recompilation) —
    # the canary/JIT instrumentation measured that leak at up to -38%
    # canary drift within one run. Warming at the TARGET SF removes it
    # at the cost of one extra untimed pass; it is an OPT-IN mode so
    # the default protocol (and the r4-r7 total series) stays
    # comparable. The output records which mode ran.
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", DEFAULT_WARM_DIR)
    for name in HEADLINE:
        if name not in qs:
            continue
        try:
            qs[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:  # noqa: BLE001 — warmup must never fail the bench
            pass

    # Best of 3 runs per query (was 2 through r5): run 1 pays one-off
    # costs (file-index listing, codegen compile) that a steady-state
    # deployment amortizes; the best of the remaining runs measures the
    # plan itself. Three runs because the r5 judging cycle showed a ±7%
    # run-order/page-cache wobble on this box (12.26-14.02s for the
    # same build) that a best-of-2 could mistake for a regression; the
    # per-query spread (max-min of the timed runs) is recorded so a
    # cross-round delta can be read against the noise floor instead of
    # guessed at. The bench itself caches nothing;
    # the dedup queries' scoped_persist of their signature subtree DOES
    # carry from run 1 to run 2 (same logical plan -> same cached frame,
    # bounded at one per key), so their run-2 time is the steady-state
    # cost with signatures materialized once per corpus version — the
    # deployment shape the plan comments describe. Every other query
    # scans parquet end-to-end both runs.
    #
    # The noop sink fully evaluates every row on the executors without
    # materializing results on the driver: the bench measures the
    # distributed compute, not a single-process collect of whatever the
    # query's output cardinality happens to be.
    # A query that throws must not kill the whole bench: record the error
    # and keep going (one bad query zeroed out the entire r2 bench).
    # Drift instrumentation (r7, after three rounds of unattributable
    # total rises on the shared box): record EVERY sample per query in
    # run order (not just best+spread), JVM warmup counters before and
    # after the timed region, and a fixed CANARY panel — the same
    # queries timed immediately before the first and immediately after
    # the last headline query. The canary's start->end delta measures the
    # environment inside this one run (page cache, CPU contention,
    # JIT): a cross-round total delta larger than the canary drift is
    # code; one inside it is environment.
    # Plan-build vs execution split (r14, VERDICT r13 #8): each sample
    # is still builder-call + noop write end-to-end (the series stays
    # byte-comparable), but the builder-call portion is ALSO recorded
    # per run, so a memoized-plan query (star_schema_summary's
    # signature-keyed lazy-DataFrame memo) shows its construction/
    # execution split in BENCH_DETAIL instead of silently excluding
    # plan-build from the series' explanation.
    build_samples: dict[str, list[float]] = {}

    def _timed(name: str, runs: int = 3) -> list[float]:
        samples: list[float] = []
        builds = build_samples.setdefault(name, [])
        for _ in range(runs):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            builds.append(round(t1 - t0, 3))
            samples.append(round(t2 - t0, 3))
        return samples

    def _jvm_state() -> dict[str, int]:
        mf = spark._jvm.java.lang.management.ManagementFactory
        return {
            "uptime_ms": int(mf.getRuntimeMXBean().getUptime()),
            "jit_ms": int(mf.getCompilationMXBean().getTotalCompilationTime()),
        }

    def _timed_safe(name: str) -> list[float] | None:
        # A canary failure must degrade to a null record, not kill the
        # bench (the per-query loop learned this in r2; the canaries
        # get the same protection so a transient failure at the END
        # can never discard 25 queries of collected timings).
        try:
            return _timed(name)
        except Exception as exc:  # noqa: BLE001 — keep the bench alive
            print(f"bench: canary FAILED: {exc}", file=sys.stderr)
            return None

    # Canary PANEL of NON-headline queries (r8 made the canary
    # non-headline so its untimed runs can't warm HEADLINE[0]; r12
    # widened it to three and reduced per-query drifts by the MEDIAN —
    # VERDICT r11 #2: the single 0.35s top_tokens canary had ±50 ms =
    # ±15% relative wobble, which rejected a steal-clean 0.07% run at
    # close of round. One small query wobbling can no longer flag the
    # series; a real environment shift moves the panel's median. All
    # three are real registered queries sharing no plan with any
    # headline entry (explode+agg over documents; map-subscript
    # projection over events; per-label vector centroids).
    canary_panel = ["top_tokens", "parse_event_props", "label_centroids"]
    for name in canary_panel:
        # The panel gets the same untimed warm pass as the headline
        # set: r11's -53.9% drift was the canary itself warming up
        # MID-SERIES (it was never in the warm loop), which is warmup
        # leakage measured as environment drift.
        try:
            qs[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:  # noqa: BLE001 — warmup must never fail the bench
            pass
    runs_per_query = 3

    def _timed_panel() -> dict[str, list[float] | None]:
        return {name: _timed_safe(name) for name in canary_panel}

    def _run_series() -> dict:
        """One full timed series: canary panel, every headline query
        (best-of-3), canary panel again — plus the environment counters
        that attribute its total."""
        load_avg_start = os.getloadavg()[0]
        build_samples.clear()  # per-series plan-build ledger (r14)
        # Fixed-work calibration FIRST (r13): measured before any Spark
        # work of this attempt so page-cache churn from the headline
        # scans can't feed back into it within the attempt.
        calib = run_calibration()
        steal_start = _proc_stat_steal()
        wall_start = time.time()
        jvm_start = _jvm_state()
        canary_start = _timed_panel()
        timings: dict[str, float] = {}
        spreads: dict[str, float] = {}
        all_samples: dict[str, list[float]] = {}
        run_order: list[str] = []
        errors: dict[str, str] = {}
        for name in HEADLINE:
            if name not in qs:
                continue
            run_order.append(name)
            try:
                samples = _timed(name, runs_per_query)
                all_samples[name] = samples
                timings[name] = round(min(samples), 3)
                spreads[name] = round(max(samples) - min(samples), 3)
            except Exception as exc:  # noqa: BLE001 — keep the bench alive
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
        canary_end = _timed_panel()
        steal_end = _proc_stat_steal()
        elapsed = round(time.time() - wall_start, 3)
        steal_delta = (
            steal_end - steal_start
            if steal_start is not None and steal_end is not None
            else None
        )
        return {
            # Steal counters (r11, VERDICT r10 #1): what the HOST took
            # from this series, so an unstable flag is diagnostic —
            # "the hypervisor stole N% of capacity" — not just honest.
            "steal_pct": steal_pct(steal_delta, elapsed),
            "steal": {
                "start_jiffies": steal_start,
                "end_jiffies": steal_end,
                "delta_jiffies": steal_delta,
                "elapsed_sec": elapsed,
            },
            "calib": calib,
            "timings": timings,
            "spreads": spreads,
            "samples": all_samples,
            # Per-run builder-call seconds (r14, VERDICT r13 #8): each
            # sample above = build + exec; this is the build term, so
            # memoized-plan queries' series are explainable from the
            # artifact (star_schema_summary: run 1 builds ~1 s of plan,
            # runs 2-3 reuse the memo).
            "build_samples": {k: list(v) for k, v in build_samples.items()},
            "run_order": run_order,
            "errors": errors,
            "canary_start": canary_start,
            "canary_end": canary_end,
            "drift_pct": canary_drift_pct(canary_start, canary_end),
            # Floor-aware gate this series is judged against (r14,
            # VERDICT r13 #2): max(5%, CANARY_FLOOR_SEC / panel median).
            "drift_gate_pct": effective_drift_gate(canary_start, canary_end),
            "jvm": {"start": jvm_start, "end": _jvm_state()},
            "load_avg": {
                "start": load_avg_start,
                "end": os.getloadavg()[0],
            },
        }

    # Canary gate (r9, VERDICT #3): a |canary drift| > 5% inside one
    # run means the BOX moved while the series ran (page cache fill,
    # CPU contention, background load) — the r7/r8 cycles both needed
    # hand re-runs to tell environment from code (r8's driver record
    # was flattered by a -21.8% drift). Codified: rerun the whole
    # series on a gated first pass and record whichever run keys best;
    # if every attempt fails a gate, the record carries
    # `unstable: true` so no cross-round comparison can mistake it for
    # a stable anchor. The DEFAULT protocol caps at one rerun — the
    # bench must terminate promptly on a permanently-loaded box,
    # flagged rather than looping; ``--until-stable`` (r12, VERDICT
    # r11 #1 — the anchor hunt was the one artifact still minted by
    # hand-retry luck) raises the cap and spaces the attempts so the
    # PROTOCOL rides out a steal wave instead of the builder.
    if until_stable:
        max_attempts = int(os.environ.get("SPARK_GRAFT_STABLE_ATTEMPTS", "6"))
        wait_sec = float(os.environ.get("SPARK_GRAFT_STABLE_WAIT_SEC", "60"))
    else:
        max_attempts, wait_sec = 2, 0.0
    attempts = hunt_stable(_run_series, max_attempts, wait_sec)
    series, unstable, reruns = choose_best(attempts)

    timings = series["timings"]
    errors = series["errors"]
    drift_pct = series["drift_pct"]
    load_avg_start = series["load_avg"]["start"]
    load_avg_end = series["load_avg"]["end"]
    # Output contract (r8; fixes the r7 parse regression): the r7
    # instrumentation made the single output line so large that the
    # driver's tail capture clipped its HEAD, losing the "value" field
    # (BENCH_r07.json parsed: null). The bulky attribution detail
    # (every sample, run order, canary series, JVM counters) now goes
    # to a SIDECAR file, and stdout carries only the compact summary —
    # printed LAST so "parse the final JSON line" always sees it.
    detail = {
        "spread": series["spreads"],
        "samples": series["samples"],
        "build_samples": series.get("build_samples", {}),
        "run_order": series["run_order"],
        "canary": {
            "panel": canary_panel,
            "start": series["canary_start"],
            "end": series["canary_end"],
            # median of per-query best-of start->end drifts; ±x% here
            # bounds what the box itself moved during the run
            "drift_pct": drift_pct,
            # the floor-aware gate it was judged against (r14)
            "drift_gate_pct": series.get("drift_gate_pct"),
        },
        # JIT time still climbing across the timed region means warmup
        # leaked into the timings despite the untimed warm pass.
        "jvm": series["jvm"],
        # 1-min load average at start/end of the timed region (r8;
        # VERDICT #4): the r7 cycle showed the same build benching
        # 12.9s on a quiet box vs 14.7-15.5s under load-avg ~2 — this
        # column plus the canary band attributes a cross-round total
        # delta to environment in one read.
        "load_avg": {"start": load_avg_start, "end": load_avg_end},
        "warm_dir": warm_dir,
        # Canary-gate provenance (r9; steal-aware r11): how many
        # reruns the gates triggered (0 or 1) and whether the RECORDED
        # series is still outside the drift band / steal gate.
        "drift_gate": {
            "gate_pct": DRIFT_GATE_PCT,
            # r14 floor-aware gate actually applied to the recorded
            # series: max(gate_pct, CANARY_FLOOR_SEC / panel median).
            "effective_gate_pct": series.get("drift_gate_pct"),
            "canary_floor_sec": CANARY_FLOOR_SEC,
            "steal_gate_pct": STEAL_GATE_PCT,
            "reruns": reruns,
            "unstable": unstable,
            "until_stable": until_stable,
            "max_attempts": max_attempts,
        },
        # Per-attempt gate ledger (r12): what every discarded series
        # measured, so an --until-stable hunt's rejections are
        # themselves evidence (which gate, how hard) instead of lost.
        "attempts": [
            {
                "drift_pct": a["drift_pct"],
                "drift_gate_pct": a.get("drift_gate_pct"),
                "steal_pct": a["steal_pct"],
                # Fixed-work calibration per attempt (r13, VERDICT r12
                # missing #2): read the anchor series against these —
                # creep that tracks calibration is the box.
                "calib_cpu_s": a.get("calib", {}).get("calib_cpu_s"),
                "calib_scan_s": a.get("calib", {}).get("calib_scan_s"),
                "total": round(sum(a["timings"].values()), 3),
                "failed": sorted(a["errors"]),
                "chosen": a is series,
            }
            for a in attempts
        ],
        # Raw steal counters for the recorded series (r11, VERDICT
        # r10 #1): /proc/stat aggregate steal before/after the timed
        # region, the delta, and the delta as % of total CPU capacity
        # over the window.
        "steal": series["steal"],
        "steal_pct": series["steal_pct"],
    }
    total = round(sum(timings.values()), 3)
    # Comparable-basis total (r9, VERDICT #8): the r4-r7 headline
    # set minus the r8 newcomer star_schema_summary (a fixed-cost
    # reference-ETL parity run that reads the reference's raw
    # files, not sf_dir), so the pre-r8 total series stays
    # one-read comparable across the r8 set swap.
    comparable = round(
        sum(v for k, v in timings.items() if k != "star_schema_summary"), 3
    )
    # SPARK_GRAFT_DETAIL_PATH (r11): tests and ad-hoc runs point the
    # sidecar elsewhere so they can never clobber the repo's recorded
    # detail/anchor; the driver's real runs use the default.
    detail_path = Path(
        os.environ.get("SPARK_GRAFT_DETAIL_PATH", _REPO / "BENCH_DETAIL.json")
    )
    # Stable-canary anchor (r10, VERDICT r9 #3): the machine-readable
    # cross-round comparison point. When THIS run is canary-stable
    # (|drift| <= gate, no failed queries) it becomes the anchor;
    # otherwise the previous detail file's anchor carries forward, so
    # an `unstable: true` driver record no longer leaves the artifact
    # series without a stable total (r9's stable run existed only as
    # PERFORMANCE.md prose).
    # Anchor runs must use the DEFAULT protocol (r11): a run at a
    # non-default SF or with the opt-in target-SF warm pass measures
    # a different thing — if one of those came out canary-stable it
    # would replace the cross-round anchor with an incomparable total
    # (e.g. the suite's sf0.001 contract test landing a ~2s "anchor").
    # realpath-normalized (r12 advice fix) so an equivalent spelling
    # (trailing slash, symlink) cannot defeat the comparison.
    default_protocol = os.path.realpath(sf_dir) == os.path.realpath(
        DEFAULT_SF_DIR
    ) and os.path.realpath(warm_dir) == os.path.realpath(DEFAULT_WARM_DIR)
    prev_detail = {}
    try:
        prev_detail = json.loads(detail_path.read_text())
    except (OSError, ValueError):
        pass
    minted = not unstable and not errors and default_protocol
    # Run-provenance is a PER-RUN field now (r13, VERDICT r12 wrong
    # #3): the legacy in-anchor from_this_run flag was rewritten by
    # every later run — the driver's own post-close default bench run
    # flipped a freshly-minted anchor's flag to false in the working
    # tree. The anchor itself carries only immutable mint stamps.
    detail["anchor_from_this_run"] = minted
    if minted:
        mint = {
            "value": total,
            "value_comparable": comparable,
            # Per-query best-of-3 (r13, VERDICT r12 missing #1): the
            # anchor series is decomposable at query grain from the
            # artifact alone.
            "queries": dict(timings),
            "canary_drift_pct": drift_pct,
            "drift_gate_pct": series.get("drift_gate_pct"),
            "steal_pct": series["steal_pct"],
            "steal_jiffies_delta": series["steal"]["delta_jiffies"],
            "load_avg": [load_avg_start, load_avg_end],
            **series.get("calib", {}),
            "code_rev": _git_rev(),
            "minted_round": f"r{_current_round():02d}",
            "minted_attempt": attempts.index(series) + 1,
            "minted_utc": datetime.datetime.now(
                datetime.timezone.utc
            ).isoformat(timespec="seconds"),
        }
    else:
        mint = None
    # Stable-anchor SERIES (r12, VERDICT r11 #7; per-query + immutable
    # provenance r13): cross-round performance as one machine-readable
    # list — the transcribed pre-r12 anchors (ANCHOR_HISTORY) plus one
    # entry per later round, minted the round a fresh anchor lands and
    # carried forward byte-identical otherwise.
    anchor, anchor_series = update_anchor_records(prev_detail, mint)
    detail["stable_anchor"] = anchor
    detail["stable_anchor_series"] = anchor_series
    if mint is not None:
        vs = anchor.get("vs_prev_anchor")
        if vs is not None:
            flagged = (
                ", ".join(vs["regressed"]) if vs["regressed"] else "none"
            )
            print(
                f"bench: anchor minted {anchor['minted_round']} vs "
                f"{vs['round']}: median per-query ratio "
                f"{vs['median_ratio']}; regressed (> "
                f"{vs['flag_ratio']}x): {flagged}",
                file=sys.stderr,
            )
    # Comparable-basis series backfill (r10, VERDICT r9 #8): recompute
    # value_comparable for every recorded round from the BENCH_r*.json
    # artifacts themselves (sum of per-query timings minus the
    # fixed-cost star_schema_summary), so the one-field series covers
    # r4-r7 records written before the field existed.
    detail["comparable_series"] = _comparable_series()
    try:
        detail_path.write_text(json.dumps(detail, indent=1))
    except OSError as exc:  # detail is best-effort; the summary is not
        print(f"bench: could not write {detail_path}: {exc}", file=sys.stderr)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "value_comparable": comparable,
        "unit": "sec",
        "queries": timings,
        "runs_per_query": runs_per_query,
        "canary_drift_pct": drift_pct,
        "canary_gate_pct": series.get("drift_gate_pct"),
        "canary_reruns": reruns,
        "steal_pct": series["steal_pct"],
        "steal_jiffies_delta": series["steal"]["delta_jiffies"],
        "load_avg": [load_avg_start, load_avg_end],
        "detail": detail_path.name,
        "sf": sf,
    }
    if unstable:
        # Both series (or the only one) drifted beyond the gate: the
        # box was moving the whole time. The totals are recorded but
        # flagged — cross-round comparisons should anchor elsewhere.
        out["unstable"] = True
    if errors:
        # A failed query is EXCLUDED from the total, which would make
        # `value` look better than a clean run — mark the total partial
        # so cross-run comparisons can't mistake it for a full suite.
        out["partial"] = True
        out["failed_count"] = len(errors)
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
