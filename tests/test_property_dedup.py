"""Property test: the prefix-filter Jaccard join (PPJoin-family) must
equal a brute-force all-pairs reference on arbitrary small corpora —
the prefix lemma, the integer prefix-length arithmetic, the size
filter, and the interning bijection all have edge cases (singleton
sets, all-identical docs, threshold-boundary pairs) a fixture-based
test can miss."""

from __future__ import annotations

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
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            o = len(docs[i] & docs[j])
            u = len(docs[i] | docs[j])
            jac = math.floor(o / u * 10000) / 10000.0
            if jac >= t:
                want[(i, j)] = jac
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
