"""Unit tests for the dedup operator guards that the oracle queries
(which run with exactness-preserving defaults) don't exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators import dedup as D


def _signatures(spark):
    """30 'spam' docs sharing every shingle (one degenerate LSH bucket)
    plus 2 genuine near-dups and 1 unique doc."""
    spam = [(i, "free offer click now winner prize " * 3) for i in range(30)]
    pair = [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog today"),
    ]
    uniq = [(200, "completely unrelated text about spark physical plans here")]
    docs = spark.createDataFrame(spam + pair + uniq, "doc_id long, text string")
    toked = docs.select("doc_id", D.tokenize(F.col("text")).alias("toks"))
    return D.minhash_signatures(
        toked, id_col="doc_id", shingle_col=D.word_shingles(F.col("toks"), 3),
        num_hashes=8,
    )


def test_max_bucket_drops_degenerate_bucket_only(spark):
    sigs = _signatures(spark).persist()
    try:
        uncapped = {
            (r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sigs).collect()
        }
        capped = {
            (r.id_a, r.id_b)
            for r in D.lsh_candidate_pairs(sigs, max_bucket=10).collect()
        }
        # The spam clique (30*29/2 pairs) must be gone, the genuine
        # near-dup pair must survive, and nothing new may appear.
        assert (100, 101) in uncapped and (100, 101) in capped
        assert any(a < 30 and b < 30 for a, b in uncapped)
        assert not any(a < 30 and b < 30 for a, b in capped)
        assert capped <= uncapped
    finally:
        sigs.unpersist()


def test_prefix_filter_jaccard_is_exact_superset_of_blocked(spark):
    """prefix_filter_jaccard is EXACT with no blocking key, so it must
    (a) contain every pair the (lang, size-bucket)-blocked exact twin
    finds, and (b) agree with it exactly on same-lang pairs (the only
    pairs the blocked form can see)."""
    from data_engineering_capstone_project_spark.plans.registry import table
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        near_dup_jaccard,
        prefix_filter_jaccard,
    )
    from tests.conftest import SF_SMALL

    pf = {tuple(r) for r in prefix_filter_jaccard(spark, SF_SMALL).collect()}
    nd = {tuple(r) for r in near_dup_jaccard(spark, SF_SMALL).collect()}
    assert nd <= pf
    lang = {
        r["doc_id"]: r["lang"]
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    same_lang_pf = {p for p in pf if lang[p[0]] == lang[p[1]]}
    assert same_lang_pf == nd
