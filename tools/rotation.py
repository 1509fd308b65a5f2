"""Driver-sample rotation, generated from the artifacts (VERDICT r6
prescription #2).

The driver samples the FIRST 50 entries of ``__spark_entry__.queries()``
each round, so the dict order IS the verification budget. Through r6
that order was a hand-maintained list in ``__spark_entry__.py`` — it
needed an advice fix once (comment counts drifting from the list) and
by r6 the backlog arithmetic (210 queries, 50 samples/round) made hand
curation untenable. This module derives the order from the recorded
evidence instead:

* ``last_verified_rounds`` reads every ``CORRECTNESS_r0*.json`` in the
  repo root and returns, per query, the LATEST round the driver
  sampled it (a query absent from every file has never been sampled).
* ``rotation_order`` puts a declared ``priority`` head first (queries
  that are NEW this round or whose code CHANGED — their existing rows,
  if any, are evidence about code that no longer exists — plus any
  judge-prescribed promotions), then everything else ordered by
  (last-verified round ascending, name): never-sampled queries lead
  (round 0), then the stalest rows, alphabetical within a round so the
  order is deterministic and auditable.

``__spark_entry__._DRIVER_SAMPLE_FIRST`` is computed by calling these
at import time, so the rotation can never drift from the artifacts;
tests/test_bench_registry.py pins the invariants (priority first, then
monotone non-decreasing staleness, full-registry permutation).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterable, Mapping
from pathlib import Path

_ROUND_RE = re.compile(r"CORRECTNESS_r0*(\d+)\.json$")


def last_verified_rounds(repo: str | Path) -> dict[str, int]:
    """Per-query latest driver-sampled round, unioned over every
    ``CORRECTNESS_r0*.json`` in ``repo``. Queries never sampled are
    absent (callers treat missing as round 0 = stalest). A malformed
    artifact is skipped rather than fatal — losing one round's rows
    degrades the ordering, not the build."""
    rounds: dict[str, int] = {}
    # Glob loosely (r*), parse strictly via the regex: a literal '0'
    # in the glob would silently drop CORRECTNESS_r10.json and every
    # later round from the staleness map.
    for f in sorted(Path(repo).glob("CORRECTNESS_r*.json")):
        m = _ROUND_RE.search(f.name)
        if not m:
            continue
        try:
            rows = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, Mapping):
            continue
        n = int(m.group(1))
        for q in rows:
            rounds[q] = max(rounds.get(q, 0), n)
    return rounds


def rotation_order(
    names: Iterable[str],
    last: Mapping[str, int],
    priority: Iterable[str] = (),
) -> list[str]:
    """Deterministic driver-sample order over ``names``: the declared
    ``priority`` entries first (deduplicated, original order, unknown
    names ignored so the list can be written before a query lands),
    then the rest by (last-verified round ascending, name) — i.e.
    never-sampled first, then stalest-first."""
    names = list(names)
    known = set(names)
    head: list[str] = []
    seen: set[str] = set()
    for n in priority:
        if n in known and n not in seen:
            head.append(n)
            seen.add(n)
    tail = sorted(
        (n for n in names if n not in seen),
        key=lambda n: (last.get(n, 0), n),
    )
    return head + tail


def main() -> None:
    """CLI: print the current rotation (round, name) for inspection —
    ``python tools/rotation.py [priority names...]``."""
    import sys

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    from data_engineering_capstone_project_spark.plans import QUERIES

    last = last_verified_rounds(repo)
    order = rotation_order(QUERIES, last, sys.argv[1:])
    for i, name in enumerate(order):
        marker = " <-- sample boundary" if i == 50 else ""
        print(f"{i:3d}  r{last.get(name, 0)}  {name}{marker}")


if __name__ == "__main__":
    main()
