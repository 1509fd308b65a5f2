"""bpe_decode_roundtrip (r10): the detokenizer's NEGATIVE sensitivity.

The registered query's oracle gate (tests/test_queries_oracle.py, the
adversarial corpus, the empty/all-NULL contract) proves decode agrees
with an independent SQL re-derivation on healthy inputs — but the
query's whole reason to exist is to FLAG a broken vocab export, so
this file proves the flag actually flips. Each case corrupts the
(sym, tid) table in one way a real export can break (the failure
modes the query docstring claims to catch) and asserts the decode
stage visibly diverges, using the same plan fragments the query runs:

* swapped ids — two symbols trade tids (a vocab.json written from an
  unordered dict, a merges/vocab version skew): the rebuilt word
  changes, roundtrip equality fails;
* duplicated tid — two symbols share an id (broken k offset, the
  bijection failure): the inverse join FANS OUT, so token_count
  inflates even where the rebuilt string could look plausible.

Kept engine-only (no oracle): the corruption is synthetic, the point
is the detector's sensitivity, not cross-engine parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.plans.text_analysis import (
    _bpe_token_ids,
    bpe_apply_merges,
    bpe_merge_rounds,
)


def _word_ids(spark, words):
    """The query's encode stage over a tiny literal vocabulary:
    3 trained merges, applied, ids assigned -> (word, pos, tid)."""
    vocab = spark.createDataFrame(
        [(w, 1) for w in words], "word string, wf long"
    )
    learned = [
        (r.left_sym, r.right_sym)
        for r in bpe_merge_rounds(vocab, rounds=3).orderBy("round").collect()
    ]
    wp = bpe_apply_merges(vocab, learned)
    sym_ids = _bpe_token_ids(spark, vocab, learned)
    return (
        wp.join(F.broadcast(sym_ids), "sym").select("word", "pos", "tid"),
        sym_ids,
    )


def _decode(word_ids, inv):
    """The query's decode stage: tid -> sym via ``inv``, rebuild each
    word -> (word, dword, wtoks)."""
    return (
        word_ids.join(F.broadcast(inv), "tid")
        .groupBy("word")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "dsym"))),
                    lambda s: s["dsym"],
                ),
                "",
            ).alias("dword"),
            F.count("*").alias("wtoks"),
        )
    )


WORDS = ["banana", "bandana", "ananas", "nab"]


def test_healthy_vocab_roundtrips(spark):
    word_ids, sym_ids = _word_ids(spark, WORDS)
    inv = sym_ids.select("tid", F.col("sym").alias("dsym"))
    rows = _decode(word_ids, inv).collect()
    assert sorted(r.word for r in rows) == sorted(WORDS)
    assert all(r.dword == r.word for r in rows), rows


def test_swapped_ids_flip_the_flag(spark):
    """Swap the tids of the two lexicographically-first base symbols
    (distinct single chars, so the rebuilt strings MUST change)."""
    word_ids, sym_ids = _word_ids(spark, WORDS)
    a, b = sym_ids.orderBy("tid").limit(2).collect()
    swapped = sym_ids.select(
        F.when(F.col("tid") == a.tid, F.lit(b.tid))
        .when(F.col("tid") == b.tid, F.lit(a.tid))
        .otherwise(F.col("tid"))
        .alias("tid"),
        F.col("sym").alias("dsym"),
    )
    rows = _decode(word_ids, swapped).collect()
    broken = [r for r in rows if r.dword != r.word]
    assert broken, f"swapped-id corruption went undetected: {rows}"


def test_duplicated_tid_fans_out(spark):
    """Remap one base symbol's tid onto another's: the inverse join
    fans out for every word containing the colliding id, so wtoks
    exceeds the healthy token count — the bijection probe fires even
    when string equality alone might survive."""
    word_ids, sym_ids = _word_ids(spark, WORDS)
    a, b = sym_ids.orderBy("tid").limit(2).collect()
    healthy = {
        r.word: r.wtoks
        for r in _decode(
            word_ids, sym_ids.select("tid", F.col("sym").alias("dsym"))
        ).collect()
    }
    dup = sym_ids.select(
        F.when(F.col("tid") == a.tid, F.lit(b.tid))
        .otherwise(F.col("tid"))
        .alias("tid"),
        F.col("sym").alias("dsym"),
    )
    rows = _decode(word_ids, dup).collect()
    inflated = [r for r in rows if r.wtoks > healthy[r.word]]
    assert inflated, f"duplicated-tid corruption went undetected: {rows}"
