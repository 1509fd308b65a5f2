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
