"""Window/Arrow BPE-apply twin contract (r10, VERDICT #1).

``bpe_apply_merges(mode="arrow")`` is the production apply path — one
Arrow ``mapInPandas`` pass over the distinct vocab, ~flat in merge
count — and must be VALUE-EXACT against the declarative
window-arithmetic path (mode="window") on every input, because
``bpe_encode_arrow`` ships it behind the same DuckDB oracle as
``bpe_encode``. These tests pin the equivalence where it is most
likely to break:

* the real-corpus vocabulary with the real learned merges,
* a synthetic merge grid big enough to exercise the rank-floor loop,
* the duplicate-product pathology — the ONE case where a naive
  min-rank-first encoder (subword-nmt style, no monotone floor)
  diverges from training-order application,
* the degenerate words (empty, single-char, no-merge-applies).
"""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import itertools

from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators import dedup as D
from data_engineering_capstone_project_spark.plans.text_analysis import (
    bpe_apply_merges,
    bpe_merge_rounds,
)
from tests.conftest import SF_SMALL


def _tokens(df) -> dict:
    """Collected (word -> [(pos, sym), ...] ordered by pos) map."""
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.word, []).append((r.pos, r.sym))
    return {w: sorted(v) for w, v in out.items()}


def _twin(spark, vocab_rows, merges):
    vocab = spark.createDataFrame(vocab_rows, "word string, wf long")
    win = _tokens(bpe_apply_merges(vocab, merges, mode="window"))
    arr = _tokens(bpe_apply_merges(vocab, merges, mode="arrow"))
    assert arr == win, (arr, win)
    return win


def test_twin_on_real_corpus_learned_merges(spark):
    """The registered shape: learn 3 merges from the sf0.001 corpus,
    apply them both ways over the full corpus vocabulary, compare the
    complete (word, wf, pos, sym) frames value-exactly."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    vocab = (
        docs.select(F.explode(D.tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
    )
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_merge_rounds(vocab, rounds=3).orderBy("round").collect()
    ]
    assert len(merges) == 3
    win = bpe_apply_merges(vocab, merges, mode="window")
    arr = bpe_apply_merges(vocab, merges, mode="arrow")
    # Same names and types; nullability legitimately differs
    # (mapInPandas output fields are declared nullable).
    assert [(f.name, f.dataType) for f in win.schema] == [
        (f.name, f.dataType) for f in arr.schema
    ]
    key = [F.col("word"), F.col("pos")]
    wrows = [tuple(r) for r in win.orderBy(*key).collect()]
    arows = [tuple(r) for r in arr.orderBy(*key).collect()]
    assert wrows == arows
    assert len(wrows) > 0


def test_twin_on_synthetic_merge_grid(spark):
    """40 frequent-letter merges (the scale-probe grid's head) over
    words chosen to chain merges into multi-char products — enough
    rank-floor traffic to catch an off-by-one in the bisect loop."""
    letters = "etaoinsrhl"
    merges = list(itertools.product(letters, repeat=2))[:40]
    words = [
        ("etaoin", 3),
        ("tttee", 2),
        ("aeaeae", 5),
        ("shrdlu", 1),
        ("oooo", 4),
        ("ratio", 2),
        ("notaries", 1),
        ("senorita", 1),
        ("eastern", 2),
        ("resonate", 1),
    ]
    _twin(spark, words, merges)


def test_twin_at_production_merge_count(spark):
    """64 synthetic merges over the real sf0.001 corpus vocabulary —
    enough to engage the window path's checkpoint_every=16 lineage
    batching (4 localCheckpoint boundaries), so the twin certifies
    the arrow kernel against the EXACT production window configuration
    (batched lineage, literal-inlined merges), not just short chains.
    Same frequent-letter grid the scale probe times."""
    letters = "etaoinsrhldcumfp"
    merges = list(itertools.product(letters, repeat=2))[:64]
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    vocab = (
        docs.select(F.explode(D.tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
    )
    win = _tokens(bpe_apply_merges(vocab, merges, mode="window"))
    arr = _tokens(bpe_apply_merges(vocab, merges, mode="arrow"))
    assert arr == win
    # sanity: the grid really fires on this corpus (multi-char symbols
    # exist), so the twin is not vacuous
    assert any(len(s) > 1 for toks in arr.values() for _, s in toks)


def test_twin_duplicate_product_pathology(spark):
    """THE divergence trap (see _bpe_apply_arrow docstring): merge 3
    re-produces "abc" after merge 1's (z, abc) turn has passed. A
    min-rank-first encoder WITHOUT the monotone floor would merge
    (z, abc) anyway -> ["zabc"]; training order (= the window path)
    leaves it -> ["z", "abc"]. Pins that the Arrow loop implements
    training order, not subword-nmt's unfloored variant."""
    merges = [
        ("ab", "c"),  # rank 0: can't fire until "ab" exists
        ("z", "abc"),  # rank 1: can't fire until "abc" exists
        ("a", "b"),  # rank 2: makes "ab"
        ("ab", "c"),  # rank 3: duplicate pair -> second "abc" chance
    ]
    got = _twin(spark, [("zabc", 1)], merges)
    assert got == {"zabc": [(1, "z"), (2, "abc")]}


def test_twin_degenerate_words(spark):
    """Empty string drops (both paths), single-char words pass through
    as their one symbol, merge-free words stay fully exploded, and
    greedy overlap parity holds ("aaaa" -> [aa, aa])."""
    merges = [("a", "a"), ("b", "c")]
    got = _twin(
        spark,
        [("", 1), ("x", 2), ("aaaa", 1), ("aaa", 1), ("bcbc", 1), ("qq", 1)],
        merges,
    )
    assert "" not in got
    assert got["x"] == [(1, "x")]
    assert got["aaaa"] == [(1, "aa"), (3, "aa")]
    assert got["aaa"] == [(1, "aa"), (3, "a")]
    assert got["bcbc"] == [(1, "bc"), (3, "bc")]
    assert got["qq"] == [(1, "q"), (2, "q")]


def _reference_training_order(word: str, merges: list) -> list:
    """Brute training-order apply: every merge in learned order, one
    greedy leftmost-non-overlapping pass each — the definitional
    semantics both engine paths must reproduce (O(M*len); fine for a
    property suite, the thing the Arrow kernel exists to avoid at
    30k merges)."""
    syms = list(word)
    for left, right in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_arrow_kernel_property_vs_training_order_reference():
    """Hypothesis sweep of the pure-Python Arrow kernel against the
    brute training-order reference — random words over a tiny alphabet
    (maximizing merge traffic, overlap runs, and duplicate-product
    collisions) and random merge lists whose elements may be
    multi-char products, so the monotone-floor machinery is exercised
    far beyond the handcrafted cases. No Spark: the Spark plumbing is
    covered by the frame-level twins above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_engineering_capstone_project_spark.plans.text_analysis import (
        _bpe_encode_word,
        _bpe_ranks,
    )

    sym = st.text(alphabet="ab", min_size=1, max_size=3)
    merges_st = st.lists(st.tuples(sym, sym), min_size=0, max_size=12)
    word_st = st.text(alphabet="abc", min_size=1, max_size=14)

    @settings(max_examples=400, deadline=None)
    @given(word=word_st, merges=merges_st)
    def check(word, merges):
        got_syms, got_poss = _bpe_encode_word(word, _bpe_ranks(merges))
        assert got_syms == _reference_training_order(word, merges)
        # positions are each symbol's first char, 1-based, and the
        # symbols re-concatenate to the word
        assert "".join(got_syms) == word
        expect_pos, acc = [], 1
        for s in got_syms:
            expect_pos.append(acc)
            acc += len(s)
        assert got_poss == expect_pos

    check()


def test_arrow_rejects_unknown_mode(spark):
    import pytest

    vocab = spark.createDataFrame([("ab", 1)], "word string, wf long")
    with pytest.raises(ValueError, match="mode"):
        bpe_apply_merges(vocab, [("a", "b")], mode="turbo")


def test_broadcast_switchover_value_exact_and_engaged(spark):
    """r12 (VERDICT r11 #6): the >1 MB merge-table broadcast switchover
    is code, not prose. Force it (threshold 0) on the real corpus
    vocabulary with the synthetic production grid and pin the output
    row-exact against the default closure path; verify the forced path
    really created a Broadcast and the default path really did not."""
    from unittest.mock import patch

    from data_engineering_capstone_project_spark.plans.text_analysis import (
        _BPE_BC_MEMO,
        _bpe_apply_arrow,
    )

    letters = "etaoinsrhl"
    merges = list(itertools.product(letters, repeat=2))[:40]
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    vocab = (
        docs.select(F.explode(D.tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
    )
    sc = spark.sparkContext
    _BPE_BC_MEMO.clear()
    with patch.object(
        type(sc), "broadcast", side_effect=type(sc).broadcast, autospec=True
    ) as spy:
        closure = _tokens(_bpe_apply_arrow(vocab, merges))
        assert spy.call_count == 0, "closure path must not broadcast"
        forced = _tokens(
            _bpe_apply_arrow(vocab, merges, broadcast_threshold_bytes=0)
        )
        assert spy.call_count == 1, "forced path must ship via broadcast"
        # Broadcast memo (r13 advice fix): a REPEAT forced apply of the
        # same merge table must reuse the session's existing Broadcast
        # (the lazy plans can never unpersist it, so without the memo
        # every call leaked a fresh one); a DIFFERENT table must mint
        # its own. Value-exactness holds through the memo.
        again = _tokens(
            _bpe_apply_arrow(vocab, merges, broadcast_threshold_bytes=0)
        )
        assert spy.call_count == 1, "repeat apply must reuse the memo"
        other = _tokens(
            _bpe_apply_arrow(vocab, merges[:7], broadcast_threshold_bytes=0)
        )
        assert spy.call_count == 2, "distinct table must broadcast anew"
    assert forced == closure and again == closure and len(forced) > 0
    assert len(other) > 0
