"""r14 BPE optimization pins (VERDICT r13 #3): the trained-merges
memo and the generalized plan memo must be construction-side only —
same values as direct training, keyed on the corpus signature, never
consulted by the training queries themselves — and the PQ encode
kernel's new subspace-sum overflow guard must raise where numpy int64
would silently wrap (r14 advice fix)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, SF_SMALL


def test_cached_learned_merges_matches_direct_training(spark):
    from data_engineering_capstone_project_spark.plans import (
        text_analysis as T,
    )
    from data_engineering_capstone_project_spark.plans.registry import table

    for variant in ("full", "base"):
        docs = table(spark, SF_SMALL, "documents")
        if variant == "base":
            from pyspark.sql import functions as F

            docs = docs.filter(F.col("doc_id") % 10 != 0)
        direct = [
            (r.left_sym, r.right_sym)
            for r in T.bpe_merge_rounds(T._bpe_vocab(docs), rounds=3)
            .orderBy("round")
            .collect()
        ]
        memod = T._cached_learned_merges(spark, SF_SMALL, variant)
        assert memod == direct, variant
        # second call serves the memo (same object, no rebuild)
        assert T._cached_learned_merges(spark, SF_SMALL, variant) is memod


def test_cached_learned_merges_is_per_corpus_and_variant(spark):
    from data_engineering_capstone_project_spark.plans import (
        text_analysis as T,
    )

    full_small = T._cached_learned_merges(spark, SF_SMALL, "full")
    full_oracle = T._cached_learned_merges(spark, SF_ORACLE, "full")
    base_small = T._cached_learned_merges(spark, SF_SMALL, "base")
    # distinct sf_dirs and variants never alias in the cache
    assert full_small is not full_oracle
    assert full_small is not base_small
    with pytest.raises(ValueError):
        T._cached_learned_merges(spark, SF_SMALL, "nonsense")


def test_plan_memo_is_per_app_sfdir_and_args(spark):
    from data_engineering_capstone_project_spark.plans import (
        text_analysis as T,
    )

    a = T.bpe_encode(spark, SF_SMALL)
    b = T.bpe_encode(spark, SF_SMALL)
    assert a is b, "same app + sf_dir + args must serve the memoized plan"
    c = T.bpe_encode(spark, SF_ORACLE)
    assert c is not a, "a different sf_dir must rebuild"
    d = T.bpe_encode(spark, SF_SMALL, mode="arrow")
    assert d is not a, "different builder args must rebuild"
    # the memoized object is a LAZY plan: every action still computes
    # from parquet (the oracle suite checks values; here just re-run it)
    assert a.count() == b.count() > 0


def test_plan_memo_disabled_for_unknown_signature(spark):
    from data_engineering_capstone_project_spark.plans.registry import (
        plan_memo,
    )

    calls = []

    @plan_memo("documents")
    def fake(spark, sf_dir):
        calls.append(sf_dir)
        return spark.range(1)

    fake(spark, "/nonexistent-dir-r14")
    fake(spark, "/nonexistent-dir-r14")
    assert len(calls) == 2, "no signature -> no memoization"


def test_training_queries_never_consult_the_memo(spark):
    """bpe_learn_merges' declared result IS the training computation:
    its builder must construct the full lazy chain on every call (no
    plan memo, no learned-merges memo)."""
    from data_engineering_capstone_project_spark.plans.registry import (
        QUERIES,
    )

    a = QUERIES["bpe_learn_merges"](spark, SF_SMALL)
    b = QUERIES["bpe_learn_merges"](spark, SF_SMALL)
    assert a is not b
    assert [tuple(r) for r in a.orderBy("round").collect()] == [
        tuple(r) for r in b.orderBy("round").collect()
    ]


def test_pq_subspace_sum_overflow_raises():
    """r14 advice fix: a vector whose per-term fixed-point values pass
    the per-element guard but whose 8-term subspace sum exceeds int64
    must raise (numpy would wrap silently where ANSI raised)."""
    import pyarrow as pa

    from data_engineering_capstone_project_spark.plans.similarity_search import (
        _pq_encode_kernel,
    )

    subspaces, subdim = 8, 8
    dims = subspaces * subdim
    cent = [[0.0] * dims]
    # |diff| = 1.2e6 -> term ~1.44e19 > 2^63: per-element guard fires
    # |diff| = 4e5   -> term 1.6e18 < 2^63 but 8 * 1.6e18 > 2^63-1:
    #                   only the subspace-sum guard can catch it
    enc = _pq_encode_kernel([0], cent, subspaces, subdim)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1]), pa.array([[4.0e5] * dims], type=pa.list_(pa.float32()))],
        ["vec_id", "embedding"],
    )
    with pytest.raises(OverflowError, match="subspace sum"):
        list(enc(iter([batch])))
    # in-range vectors still encode
    ok = pa.RecordBatch.from_arrays(
        [pa.array([1]), pa.array([[0.5] * dims], type=pa.list_(pa.float32()))],
        ["vec_id", "embedding"],
    )
    out = list(enc(iter([ok])))
    assert out and out[0].num_rows == subspaces
