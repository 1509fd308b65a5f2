"""Property tests for the r5 sketch/search primitives — exercising
the PRODUCTION helpers (operators.sketches.kmv_sketch/kmv_estimate,
plans.text_analysis.positional_phrase_hits), not inline copies, so a
regression in the real operator fails here. References are direct
Python reimplementations over arbitrary small inputs (ties, repeated
tokens, overlapping phrase occurrences, fewer-than-k groups)."""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.sketches import (
    KMV_A,
    KMV_K,
    KMV_M,
    kmv_estimate,
    kmv_sketch,
)
from data_engineering_capstone_project_spark.plans.text_analysis import (
    positional_phrase_hits,
)

_SETTINGS = dict(max_examples=12, deadline=None)


@settings(**_SETTINGS)
@given(
    users=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(st.none(), st.integers(0, 500)),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_kmv_sketch_matches_python_reference(spark, users):
    """Per-group KMV over arbitrary (group, user) multisets — covers
    the n < k exact branch, hash ties (same user repeated),
    single-user groups, and NULL ids (dropped before hashing: a NULL
    hash sorts NULLS FIRST in Spark but NULLS LAST in DuckDB, so an
    unfiltered sketch would be engine-dependent; a group with only
    NULL ids must vanish from the sketch entirely)."""
    df = spark.createDataFrame(users, "g string, user_id long")
    sk = kmv_sketch(df, "g", "user_id")
    got = {
        r.g: r.est
        for r in sk.select("g", kmv_estimate().alias("est")).collect()
    }

    expected = {}
    for g in {g for g, _ in users}:
        hs = sorted(
            {(u * KMV_A) % KMV_M for gg, u in users if gg == g and u is not None}
        )
        if not hs:
            continue
        kept = hs[:KMV_K]
        expected[g] = (
            len(kept)
            if len(kept) < KMV_K
            else ((KMV_K - 1) * KMV_M) // kept[-1]
        )
    assert got == expected


@settings(**_SETTINGS)
@given(
    users=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 4),  # arbitrary slice assignment
            st.integers(0, 500),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_kmv_merge_equals_direct_sketch(spark, users):
    """The mergeability law, property-tested through the PRODUCTION
    helpers: per-slice partial sketches pooled by kmv_merge must be
    BIT-IDENTICAL (kth and n, not just the estimate) to the direct
    one-pass sketch over the union, under ANY slicing — including a
    user appearing in several slices (duplicate hashes across
    partials) and slices holding fewer than k users."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        kmv_merge,
        kmv_partials,
    )

    df = spark.createDataFrame(users, "g string, slc int, user_id long")
    merged = {
        (r.g, r.kth, r.n)
        for r in kmv_merge(kmv_partials(df, "g", "slc", "user_id"), "g").collect()
    }
    direct = {
        (r.g, r.kth, r.n) for r in kmv_sketch(df, "g", "user_id").collect()
    }
    assert merged == direct


@settings(**_SETTINGS)
@given(
    users=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 300),
        ),
        min_size=1,
        max_size=150,
    )
)
def test_kmv_pair_intersection_matches_python_reference(spark, users):
    """KMV set algebra through the PRODUCTION helpers: for every
    group pair, kmv_pair_intersection's (n_u, overlap, union_est,
    inter_est) must match a sequential Python re-derivation of the
    same estimator, under any multiset — including disjoint groups
    (overlap 0), identical groups, and groups below k (where the
    estimate must be EXACT: n_u < k means both sets are complete)."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        kmv_min_set,
        kmv_pair_intersection,
    )

    df = spark.createDataFrame(users, "g string, user_id long")
    got = {
        (r.type_a, r.type_b): (r.n_u, r.overlap, r.union_est, r.inter_est)
        for r in kmv_pair_intersection(
            kmv_min_set(df, "g", "user_id"), "g"
        ).collect()
    }

    sets = {}
    for g in {g for g, _ in users}:
        hs = sorted({(u * KMV_A) % KMV_M for gg, u in users if gg == g})
        sets[g] = hs[:KMV_K]
    expected = {}
    exact_inter = {}
    for ga in sets:
        for gb in sets:
            if ga >= gb:
                continue
            pooled = sorted(set(sets[ga]) | set(sets[gb]))
            kmin = pooled[:KMV_K]
            n_u = len(kmin)
            overlap = sum(
                1 for h in kmin if h in set(sets[ga]) and h in set(sets[gb])
            )
            union_est = (
                n_u if n_u < KMV_K else ((KMV_K - 1) * KMV_M) // kmin[-1]
            )
            expected[(ga, gb)] = (
                n_u,
                overlap,
                union_est,
                (overlap * union_est) // n_u,
            )
            a_ids = {u for g, u in users if g == ga}
            b_ids = {u for g, u in users if g == gb}
            exact_inter[(ga, gb)] = len(a_ids & b_ids)
    assert got == expected
    # The exactness guarantee: a pair whose union fits in the sketch
    # reports the true intersection (hash collisions aside; the id
    # domain here is far too small to collide under the Knuth hash).
    for pair, (n_u, _, _, inter_est) in got.items():
        if n_u < KMV_K:
            assert inter_est == exact_inter[pair]


@settings(**_SETTINGS)
@given(
    keys=st.sets(
        st.integers(-1_000_000, 1_000_000), min_size=1, max_size=200
    ),
    n_shards=st.sampled_from([1, 2, 7, 64]),
)
def test_dense_ids_are_dense_and_key_ordered(spark, keys, n_shards):
    """The two-phase dense-id assembly must produce EXACTLY
    [0, N) in key order for ANY unique key set — gaps, negative
    keys, single-key sets, fewer keys than shards — and any shard
    count: shard boundaries are a parallelism choice that must never
    leak into the ids."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        dense_ids,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: r.global_id for r in dense_ids(df, "k", n_shards).collect()
    }
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=10),
        min_size=1,
        max_size=8,
    ),
    w1=st.sampled_from(["x", "y"]),
    w2=st.sampled_from(["x", "z"]),
)
def test_positional_phrase_hits_matches_python_reference(
    spark, docs, w1, w2
):
    """The production adjacency-intersection operator (with the phrase
    FIXED instead of corpus-derived) must equal a direct scan —
    including overlapping occurrences ('x x x' contains 'x x' twice)
    and w1 == w2."""
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, toks array<string>")
    pos = df.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    phrase = spark.createDataFrame([(w1, w2)], "w1 string, w2 string")
    got = {
        r.doc_id: r.occurrences
        for r in positional_phrase_hits(pos, phrase).collect()
    }

    expected = {}
    for i, toks in rows:
        n = sum(
            1
            for j in range(len(toks) - 1)
            if toks[j] == w1 and toks[j + 1] == w2
        )
        if n:
            expected[i] = n
    assert got == expected


@settings(**_SETTINGS)
@given(
    keys=st.lists(
        st.one_of(st.none(), st.integers(0, 5000)),
        min_size=1,
        max_size=150,
    )
)
def test_cms_cells_match_python_reference(spark, keys):
    """The CMS grid over an arbitrary key multiset must equal a direct
    Python computation of every (row, bucket) count — covering hash
    collisions (small key range forces them), repeated keys, and NULL
    keys (dropped, same contract as kmv_sketch; an all-NULL input
    yields an empty grid)."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        CMS_HASHES,
        CMS_P,
        CMS_W,
        cms_cells,
    )

    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    got = {
        (r.r, r.b): r.cnt for r in cms_cells(df, "user_id").collect()
    }

    expected: dict[tuple[int, int], int] = {}
    for k in keys:
        if k is None:
            continue
        for r, (a, b) in enumerate(CMS_HASHES):
            cell = (r, ((k * a + b) % CMS_P) % CMS_W)
            expected[cell] = expected.get(cell, 0) + 1
    assert got == expected


@settings(**_SETTINGS)
@given(
    keys=st.lists(st.integers(0, 300), min_size=1, max_size=120),
    split=st.integers(0, 119),
)
def test_cms_additivity_and_overestimate(spark, keys, split):
    """The two properties the registered queries rely on: (1) cells
    built on two arbitrary slices SUM to the cells of the union —
    additivity, the reason the sketch drops into apply_additive_batch
    unchanged; (2) cms_lookup can only OVERESTIMATE the exact count of
    any key (min over rows of count-plus-collision-mass)."""
    from data_engineering_capstone_project_spark.operators.sketches import (
        cms_cells,
        cms_lookup,
    )

    left, right = keys[:split], keys[split:]
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    direct = {
        (r.r, r.b): r.cnt for r in cms_cells(df, "user_id").collect()
    }
    summed: dict[tuple[int, int], int] = {}
    for part in (left, right):
        if not part:
            continue
        pdf = spark.createDataFrame([(k,) for k in part], "user_id long")
        for r in cms_cells(pdf, "user_id").collect():
            summed[(r.r, r.b)] = summed.get((r.r, r.b), 0) + r.cnt
    assert summed == direct

    exact: dict[int, int] = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    probe = spark.createDataFrame([(k,) for k in exact], "user_id long")
    cells = cms_cells(df, "user_id")
    est = {
        r.user_id: r.cms_estimate
        for r in cms_lookup(cells, probe, "user_id").collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k]


def _bpe_reference(words, rounds=3):
    """Direct Python BPE: argmax adjacent pair (count desc, lexico
    tiebreak) over corpus-weighted word frequencies, greedy leftmost
    non-overlapping merge — the Sennrich reference semantics. Returns
    (merge table, final per-word symbol sequences) so both the trainer
    AND the apply/encode operator check against one reference."""
    from collections import Counter

    freq = Counter(words)
    syms = {w: list(w) for w in freq}
    merges = []
    for rnd in range(1, rounds + 1):
        pc = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += freq[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        merges.append((rnd, l, r, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    )
)
def test_bpe_merge_rounds_match_python_reference(spark, words):
    """The window-arithmetic BPE trainer must equal the direct
    sequential reference on ARBITRARY corpora — the tiny 'abc'
    alphabet forces the hard cases: overlapping runs ('aaaa' merging
    (a,a) must yield [aa, aa], never [a, aa, a]), merged symbols
    re-pairing in later rounds ('aa'+'a'), ties broken
    lexicographically, and single-char words contributing nothing."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        bpe_merge_rounds,
    )

    vocab_rows = {}
    for w in words:
        vocab_rows[w] = vocab_rows.get(w, 0) + 1
    vocab = spark.createDataFrame(
        [(w, c) for w, c in vocab_rows.items()], "word string, wf long"
    )
    got = [
        (r.round, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merge_rounds(vocab, 3)
        .orderBy("round")
        .collect()
    ]
    expected, _ = _bpe_reference(words, 3)
    assert got == expected


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    )
)
def test_bpe_apply_merges_matches_python_reference(spark, words):
    """The APPLY half (r8): encoding a vocabulary with a learned merge
    list must reproduce the sequential reference's final per-word
    symbol sequences — same hard cases as the trainer test (overlap
    parity, merged symbols re-pairing, single-char words), now checked
    on the output sequences rather than the merge table."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        bpe_apply_merges,
    )

    vocab_rows: dict[str, int] = {}
    for w in words:
        vocab_rows[w] = vocab_rows.get(w, 0) + 1
    vocab = spark.createDataFrame(
        [(w, c) for w, c in vocab_rows.items()], "word string, wf long"
    )
    merges, ref_syms = _bpe_reference(words, 3)
    rows = bpe_apply_merges(vocab, [(l, r) for _, l, r, _ in merges]).collect()
    got: dict[str, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r.word, r.pos)):
        got.setdefault(r.word, []).append(r.sym)
    assert got == ref_syms


def test_bpe_apply_checkpoint_batching_is_transparent(spark):
    """checkpoint_every (the lineage bound for production-sized merge
    tables) must not change results: applying 4 merges with a
    checkpoint every 2 equals the sequential reference exactly."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        bpe_apply_merges,
    )

    words = ["abab", "ababab", "aab", "bb", "abba", "baba"] * 3
    merges, ref_syms = _bpe_reference(words, 4)
    vocab_rows: dict[str, int] = {}
    for w in words:
        vocab_rows[w] = vocab_rows.get(w, 0) + 1
    vocab = spark.createDataFrame(
        [(w, c) for w, c in vocab_rows.items()], "word string, wf long"
    )
    rows = bpe_apply_merges(
        vocab, [(l, r) for _, l, r, _ in merges], checkpoint_every=2
    ).collect()
    got: dict[str, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r.word, r.pos)):
        got.setdefault(r.word, []).append(r.sym)
    assert got == ref_syms


def test_bpe_apply_production_merge_count_is_stack_safe(spark):
    """r9 probe finding (VERDICT #4): Catalyst's plan walk is
    recursive, so the apply loop's batch depth is bounded by the
    DRIVER STACK — the old per-merge broadcast-join shape with its
    checkpoint_every=64 default overflowed (StackOverflowError) from
    ~32 unbatched merges. Pin the fix end-to-end: 64 merges (2x the
    old crash point, crossing four checkpoint_every=16 batch
    boundaries) must complete at the DEFAULT batching AND match a
    direct sequential apply reference."""
    import itertools

    from data_engineering_capstone_project_spark.plans.text_analysis import (
        bpe_apply_merges,
    )

    merges = list(itertools.product("etaoinsr", repeat=2))[:64]

    def apply_ref(words, merges):
        syms = {w: list(w) for w in set(words)}
        for l, r in merges:
            for w, s in syms.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        return syms

    words = ["notaries", "senorita", "aeration", "eastern", "toast",
             "resonate", "antsier", "naan", "eee", "ratio"]
    ref = apply_ref(words, merges)
    vocab = spark.createDataFrame([(w, 1) for w in words], "word string, wf long")
    rows = bpe_apply_merges(vocab, merges).collect()  # default batching
    got: dict[str, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r.word, r.pos)):
        got.setdefault(r.word, []).append(r.sym)
    assert got == ref


def test_bpe_empty_merge_round_passes_symbols_through(spark):
    """r9 advice fix: an EMPTY merge round (no adjacent pair anywhere)
    must pass the training loop's symbol frame through unchanged, the
    way the oracle's LEFT JOIN ON TRUE does — the old inner-join apply
    wiped it. The merge-table output coincided either way (no pairs in
    round N implies none later), so this pins the loop STATE via
    return_symbols: all-single-char words keep their one-symbol rows."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        bpe_merge_rounds,
    )

    vocab = spark.createDataFrame(
        [("a", 2), ("b", 3), ("c", 1)], "word string, wf long"
    )
    table, syms = bpe_merge_rounds(vocab, 3, return_symbols=True)
    assert table.count() == 0  # no pairs -> no merges, both engines
    got = {(r.word, r.pos, r.sym) for r in syms.collect()}
    assert got == {("a", 1, "a"), ("b", 1, "b"), ("c", 1, "c")}


def test_bpe_merge_round_going_dry_mid_training_stops_cleanly(spark):
    """Round 1 merges the only pair; round 2 finds the corpus fully
    merged (every word one symbol) and must stop with the post-merge
    symbols intact rather than wiping them."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        bpe_merge_rounds,
    )

    vocab = spark.createDataFrame([("ab", 4)], "word string, wf long")
    table, syms = bpe_merge_rounds(vocab, 3, return_symbols=True)
    rows = [
        (r.round, r.left_sym, r.right_sym, r.pair_count)
        for r in table.orderBy("round").collect()
    ]
    assert rows == [(1, "a", "b", 4)]
    assert [(r.word, r.pos, r.sym) for r in syms.collect()] == [("ab", 1, "ab")]
