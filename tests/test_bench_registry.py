"""Bench/probe registry integrity: every headline bench query and
every scale-probe query must be a registered queries() entry (the
bench skips unknown names SILENTLY — a typo or a renamed query would
shrink the bench total and read as a speedup across rounds)."""

from __future__ import annotations

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
