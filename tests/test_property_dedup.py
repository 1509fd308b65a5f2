"""Property test: the prefix-filter Jaccard join (PPJoin-family) must
equal a brute-force all-pairs reference on arbitrary small corpora —
the prefix lemma, the integer prefix-length arithmetic, the size
filter, and the interning bijection all have edge cases (singleton
sets, all-identical docs, threshold-boundary pairs) a fixture-based
test can miss."""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import math
from fractions import Fraction

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.dedup import (
    prefix_filter_jaccard_pairs,
)

_SETTINGS = dict(max_examples=15, deadline=None)

# Small token alphabet forces collisions, shared rare/frequent tokens,
# and plenty of threshold-boundary pairs.
token = st.integers(min_value=0, max_value=9).map(lambda i: f"t{i}")
doc = st.lists(token, min_size=1, max_size=8)


def _brute_force(docs: list[set], t: Fraction) -> dict:
    """Exact threshold compare (Fraction o/u >= t), floored jac as the
    reported value — mirrors the operator's integer cross-multiplied
    verification, NOT a float-vs-floored-decimal compare (which would
    wrongly drop boundary pairs for thresholds like 1/3)."""
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            o = len(docs[i] & docs[j])
            u = len(docs[i] | docs[j])
            if u and Fraction(o, u) >= t:
                want[(i, j)] = math.floor(o / u * 10000) / 10000.0
    return want


@settings(**_SETTINGS)
@given(corpus=st.lists(doc, min_size=1, max_size=10))
def test_prefix_filter_equals_brute_force_at_half(spark, corpus):
    sets = [set(d) for d in corpus]
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(sets)],
        "doc_id long, ws array<string>",
    )
    got = {
        (r.id_a, r.id_b): r.jac
        for r in prefix_filter_jaccard_pairs(
            df, id_col="doc_id", set_col=F.col("ws"), t_num=1, t_den=2
        ).collect()
    }
    assert got == _brute_force(sets, Fraction(1, 2))


@settings(**_SETTINGS)
@given(corpus=st.lists(doc, min_size=2, max_size=8))
def test_prefix_filter_equals_brute_force_at_four_fifths(spark, corpus):
    """A second threshold exercises the general rational ceil
    arithmetic (t=4/5: much shorter prefixes, tighter size filter)."""
    sets = [set(d) for d in corpus]
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(sets)],
        "doc_id long, ws array<string>",
    )
    got = {
        (r.id_a, r.id_b): r.jac
        for r in prefix_filter_jaccard_pairs(
            df, id_col="doc_id", set_col=F.col("ws"), t_num=4, t_den=5
        ).collect()
    }
    assert got == _brute_force(sets, Fraction(4, 5))


@settings(**_SETTINGS)
@given(corpus=st.lists(doc, min_size=2, max_size=8))
def test_prefix_filter_equals_brute_force_at_one_third(spark, corpus):
    """t=1/3 is NOT representable in 4 decimal digits: a pair whose
    exact Jaccard is exactly 1/3 must be kept. This is the boundary a
    floored-decimal-vs-float-threshold compare silently drops (found
    in review; the operator now verifies with integer
    cross-multiplication)."""
    sets = [set(d) for d in corpus]
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(sets)],
        "doc_id long, ws array<string>",
    )
    got = {
        (r.id_a, r.id_b): r.jac
        for r in prefix_filter_jaccard_pairs(
            df, id_col="doc_id", set_col=F.col("ws"), t_num=1, t_den=3
        ).collect()
    }
    assert got == _brute_force(sets, Fraction(1, 3))


def test_prefix_filter_keeps_exact_boundary_pair(spark):
    """Deterministic pin of the review finding: A={a,b}, B={b,c} has
    exact Jaccard 1/3; at t=1/3 the pair MUST be in the output even
    though floor(1/3 * 1e4)/1e4 = 0.3333 < 1/3."""
    df = spark.createDataFrame(
        [(0, ["a", "b"]), (1, ["b", "c"])], "doc_id long, ws array<string>"
    )
    got = prefix_filter_jaccard_pairs(
        df, id_col="doc_id", set_col=F.col("ws"), t_num=1, t_den=3
    ).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(0, 1)]
