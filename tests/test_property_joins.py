"""Property-based tests (Hypothesis): the custom distributed operators
must agree with direct single-machine reference implementations on
arbitrary small inputs — especially edge cases a hand-picked fixture
misses (ties, empty sides, singleton groups, boundary buckets)."""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.dedup import (
    jaccard_pairs_size_blocked,
)
from data_engineering_capstone_project_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
)

_SETTINGS = dict(max_examples=12, deadline=None)

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=50)


@settings(**_SETTINGS)
@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=12),
    right=st.lists(st.tuples(keys, times), min_size=0, max_size=12),
)
def test_asof_join_matches_reference(spark, left, right):
    # de-dup right per (key, time) as the operator contract requires
    right = sorted({(k, t): (k, t, k * 100 + t) for k, t in right}.values())
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid int, k int, lt int"
    )
    rdf = spark.createDataFrame(right, "k int, rt int, rv int") if right else (
        spark.createDataFrame([], "k int, rt int, rv int")
    )
    got = {
        r.lid: (r.rt, r.rv)
        for r in asof_join(
            ldf, rdf, on="k", left_time="lt", right_time="rt",
            value_cols=["rt", "rv"],
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, rv) for (rk, rt, rv) in right if rk == k and rt <= t]
        want = max(cands) if cands else (None, None)
        assert got[i] == want, (i, k, t, got[i], want)


@settings(**_SETTINGS)
@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=10),
    right=st.lists(st.tuples(keys, times), min_size=0, max_size=10),
    lower=st.integers(min_value=-5, max_value=5),
    width=st.integers(min_value=1, max_value=20),
)
def test_range_join_matches_reference(spark, left, right, lower, width):
    upper = lower + width
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid int, k int, lt int"
    )
    rdf = spark.createDataFrame(
        [(j, k, t) for j, (k, t) in enumerate(right)], "rid int, k int, rt int"
    ) if right else spark.createDataFrame([], "rid int, k int, rt int")
    got = sorted(
        (r.lid, r.rid)
        for r in range_join_bucketed(
            ldf, rdf, on="k", left_time="lt", right_time="rt",
            lower=lower, upper=upper,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in enumerate(right)
        if lk == rk and lt + lower < rt <= lt + upper
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12),
        min_size=2,
        max_size=10,
    )
)
def test_size_blocked_jaccard_is_exact(spark, docs):
    """The size-bucket blocking must lose NO pair with jac >= 0.5 —
    exactness is the operator's claim, so fuzz it."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = sorted(
        (r.id_a, r.id_b)
        for r in jaccard_pairs_size_blocked(
            df,
            id_col="id",
            set_col=F.array_distinct(F.split(F.col("text"), " ")),
            block_col=F.lit("all"),
            threshold=0.5,
        ).collect()
    )
    sets = [set(toks) for toks in docs]
    want = sorted(
        (i, j)
        for i in range(len(sets))
        for j in range(i + 1, len(sets))
        if (len(sets[i] & sets[j]) / len(sets[i] | sets[j]) * 10000) // 1 / 10000 >= 0.5
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    fact=st.lists(st.tuples(keys, st.integers(0, 99)), min_size=1, max_size=30),
    dim=st.lists(keys, min_size=0, max_size=4, unique=True),
    salts=st.integers(min_value=1, max_value=5),
)
def test_salted_join_equals_plain_join_fuzzed(spark, fact, dim, salts):
    from data_engineering_capstone_project_spark.operators.skew import salted_join

    fdf = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(fact)], "rid int, k int, v int"
    )
    ddf = spark.createDataFrame(
        [(k, f"d{k}") for k in dim], "k int, name string"
    ) if dim else spark.createDataFrame([], "k int, name string")
    for how in ("inner", "left"):
        got = sorted(
            tuple(r)
            for r in salted_join(
                fdf, ddf, on="k", salt_by=["rid"], salts=salts, how=how
            ).select("rid", "k", "v", "name").collect()
        )
        want = sorted(
            tuple(r)
            for r in fdf.join(ddf, "k", how)
            .select("rid", "k", "v", "name").collect()
        )
        assert got == want, how


# --- banded Hamming blocking -------------------------------------------------

sig64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(**_SETTINGS)
@given(
    sigs=st.lists(sig64, min_size=2, max_size=14),
    flips=st.lists(
        st.tuples(st.integers(0, 13), st.sets(st.integers(0, 63), max_size=3)),
        max_size=6,
    ),
)
def test_simhash_banded_pairs_is_exact(spark, sigs, flips):
    """Banded blocking must find EXACTLY the pairs with Hamming <= 3 —
    the pigeonhole claim, fuzzed with adversarial near-collisions
    (clones of existing sigs with <=3 bits flipped, so qualifying pairs
    actually occur)."""
    from data_engineering_capstone_project_spark.operators.dedup import (
        simhash_banded_pairs,
    )

    all_sigs = list(sigs)
    for src, bits in flips:
        if src < len(sigs):
            # Flip in unsigned-64 space, then wrap to signed: Python's
            # unbounded-int XOR on a NEGATIVE value escapes int64 (e.g.
            # -1 ^ 2**63 = -2**63 - 1) and createDataFrame rejects it.
            u = sigs[src] & (2**64 - 1)
            for b in bits:
                u ^= 1 << b
            all_sigs.append(u - 2**64 if u >= 2**63 else u)
    rows = [(i, s) for i, s in enumerate(all_sigs)]
    df = spark.createDataFrame(rows, "doc long, sig long")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_banded_pairs(df, max_hamming=3).collect()
    )
    want = sorted(
        (i, j, bin((all_sigs[i] ^ all_sigs[j]) & (2**64 - 1)).count("1"))
        for i in range(len(all_sigs))
        for j in range(i + 1, len(all_sigs))
        if bin((all_sigs[i] ^ all_sigs[j]) & (2**64 - 1)).count("1") <= 3
    )
    assert got == want


# --- connected components ----------------------------------------------------


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_match_union_find(spark, edges):
    """Min-label propagation must agree with a reference union-find on
    arbitrary small graphs (chains, cliques, self-loops, disjoint
    clumps)."""
    from data_engineering_capstone_project_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r.node, r.component) for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {(n, comp_min[find(n)]) for n in parent}
    assert got == want
