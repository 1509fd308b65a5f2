"""Property test for the DSIR assembly (dsir_select): the distributed
grid/marginal/lift/top-k pipeline is pinned equal to a sequential
Python reference — same md5 bucketing, same add-1-smoothed integer
lift, same weighted-mean floor division — over hypothesis-generated
corpora (shared buckets, target-only buckets, empty raw pools, tied
weights) that the fixed documents table never produces."""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import hashlib
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.plans.text_analysis import (
    dsir_select,
)

_WORDS = st.sampled_from(
    ["alpha", "beta", "Gamma", "delta", "x1", "x2", "zz", "q"]
)
_DOCS = st.lists(
    st.tuples(
        st.booleans(),  # is_target
        st.lists(_WORDS, min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=25,
)


def _ref(rows, top_k):
    """Sequential DSIR: bucket counts, integer lift, weighted mean."""
    grids = []  # (doc_id, is_target, {bkt: c})
    for doc_id, (is_t, words) in enumerate(rows):
        toks = [t for t in re.split(r"\s+", " ".join(words).lower().strip()) if t]
        counts: dict[str, int] = {}
        for t in toks:
            b = hashlib.md5(t.encode()).hexdigest()[:2]
            counts[b] = counts.get(b, 0) + 1
        grids.append((doc_id, is_t, counts))
    ct: dict[str, int] = {}
    cr: dict[str, int] = {}
    for _, is_t, counts in grids:
        for b, c in counts.items():
            (ct if is_t else cr)[b] = (ct if is_t else cr).get(b, 0) + c
    tt, rt = sum(ct.values()), sum(cr.values())
    buckets = set(ct) | set(cr)
    lift = {
        b: ((ct.get(b, 0) + 1) * (rt + 256) * 1000)
        // ((cr.get(b, 0) + 1) * (tt + 256))
        for b in buckets
    }
    scored = []
    for doc_id, is_t, counts in grids:
        if is_t or not counts:
            continue
        n = sum(counts.values())
        w_fp = sum(c * lift[b] for b, c in counts.items()) // n
        scored.append((doc_id, n, w_fp))
    scored.sort(key=lambda r: (-r[2], r[0]))
    return {
        doc_id: (n, w_fp / 1000.0, rank + 1)
        for rank, (doc_id, n, w_fp) in enumerate(scored[:top_k])
    }


@settings(max_examples=10, deadline=None)
@given(rows=_DOCS, top_k=st.integers(1, 8))
def test_dsir_select_matches_sequential_reference(spark, rows, top_k):
    docs = spark.createDataFrame(
        [(i, " ".join(words), is_t) for i, (is_t, words) in enumerate(rows)],
        "doc_id long, text string, t boolean",
    )
    got = {
        r.doc_id: (r.n_tokens, r.avg_lift, r.rank)
        for r in dsir_select(docs, F.col("t"), top_k=top_k).collect()
    }
    assert got == _ref(rows, top_k)
