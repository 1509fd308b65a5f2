"""Invariant tests for the training-export operators
(plans/text_analysis.py): sequence packing and quality-weighted
sampling. The oracle suite pins exact values; these pin the properties
a training pipeline actually relies on — total coverage, budget
behavior, determinism — on the shared testdata AND on synthetic edge
corpora (empty docs, one giant doc, all-identical ids are impossible
by schema, but boundary token counts are not)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.plans import QUERIES
from tests.conftest import SF_SMALL

BUDGET = 8192


@pytest.fixture(scope="module")
def packed(spark):
    return QUERIES["sequence_packing"](spark, SF_SMALL).cache()


def test_packing_covers_every_document_once(spark, packed):
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs


def test_packing_packs_are_contiguous_and_budgeted(packed):
    """Within a (shard, pack): token prefix-sums below the pack's last
    doc stay under budget (the streaming-greedy contract: a pack can
    overflow only via its final document), and pack ids per shard are
    a contiguous 0..max range."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = packed.withColumn("cum_before", F.sum("tokens").over(w) - F.col("tokens"))
    # the defining invariant: pack_id == floor(cum_before / BUDGET)
    bad = with_cum.filter(
        F.col("pack_id") != F.floor(F.col("cum_before") / F.lit(float(BUDGET)))
    ).count()
    assert bad == 0
    # contiguity: per shard, max(pack_id)+1 == count(distinct pack_id)
    per_shard = packed.groupBy("shard").agg(
        F.max("pack_id").alias("mx"),
        F.countDistinct("pack_id").alias("nd"),
    )
    holes = per_shard.filter(F.col("mx") + 1 != F.col("nd")).count()
    assert holes == 0


def test_packing_deterministic_across_runs(spark, packed):
    again = QUERIES["sequence_packing"](spark, SF_SMALL)
    assert packed.exceptAll(again).count() == 0
    assert again.exceptAll(packed).count() == 0


def test_packing_consumes_real_bpe_token_counts(spark):
    """r8 tokenizer-chain closure: pack_sequences accepts REAL token
    counts from the trained BPE encoder in place of the regexp
    approximation, and the streaming-greedy invariant (pack_id ==
    floor(cum_before / budget)) holds against THOSE counts."""
    from pyspark.sql.window import Window

    from data_engineering_capstone_project_spark.plans.text_analysis import (
        pack_sequences,
    )

    counts = QUERIES["bpe_encode"](spark, SF_SMALL).select(
        "doc_id", F.col("token_count").alias("tokens")
    )
    packed = pack_sequences(counts, n_shards=8, budget=256).cache()
    try:
        assert packed.count() == counts.count()
        w = (
            Window.partitionBy("shard")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        bad = (
            packed.withColumn(
                "cum_before", F.sum("tokens").over(w) - F.col("tokens")
            )
            .filter(
                F.col("pack_id")
                != F.floor(F.col("cum_before") / F.lit(256.0))
            )
            .count()
        )
        assert bad == 0
        # the real counts differ from the regexp approximation, so this
        # is not vacuously the same packing (whitespace tokens vs BPE
        # symbols after 3 merges)
        approx = QUERIES["sequence_packing"](spark, SF_SMALL).select(
            "doc_id", "tokens"
        )
        diff = (
            counts.alias("r")
            .join(approx.alias("a"), "doc_id")
            .filter(F.col("r.tokens") != F.col("a.tokens"))
            .count()
        )
        assert diff > 0
    finally:
        packed.unpersist()


def test_pack_sequences_degenerate_counts_contract(spark):
    """Adversarial token-count inputs (r9): zero-token documents pack
    into the running position WITHOUT advancing it (they cost no
    budget); a document larger than the whole budget overflows its
    pack by itself without shifting neighbors by more than its size;
    and a NULL count yields a NULL pack_id for THAT document only —
    the window sum skips NULLs, so every later document's placement is
    unaffected (the unplaceable row is visible, not silently dropped
    and not poisoning the shard)."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        pack_sequences,
    )

    rows = [
        (0, 0),       # zero-token doc at the front
        (8, 100),
        (16, 0),      # zero-token doc mid-stream
        (24, 300),    # larger than the 256 budget on its own
        (32, None),   # NULL count
        (40, 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    got = {
        r.doc_id: r.pack_id
        for r in pack_sequences(df, n_shards=8, budget=256).collect()
    }
    # shard = doc_id % 8 == 0 for every row: one shard, doc_id order.
    # cum_before: 0:0, 8:0, 16:100, 24:100, 32:NULL (its own count is
    # NULL), 40:400 (the NULL was skipped, not sticky)
    assert got == {0: 0, 8: 0, 16: 0, 24: 0, 32: None, 40: 1}


def test_pack_sequences_invariants_property(spark):
    """Property pin over arbitrary corpora (r9): for ANY (doc_id,
    tokens) set, packing must keep every row and assign EXACTLY
    pack_id == floor(cum_before / budget) within each shard's doc_id
    order — a sequential Python recomputation is the oracle, so the
    streaming-greedy contract (prior pack content under budget,
    overflow at most one document) is pinned by construction. Several
    budgets and shard counts swept, one Spark round-trip per case."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_engineering_capstone_project_spark.plans.text_analysis import (
        pack_sequences,
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=4000),
                st.integers(min_value=0, max_value=600),
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        ),
        n_shards=st.sampled_from([1, 4, 8]),
        budget=st.sampled_from([64, 256]),
    )
    def run(rows, n_shards, budget):
        df = spark.createDataFrame(rows, "doc_id long, tokens long")
        out = pack_sequences(df, n_shards, budget=budget).collect()
        got = {r.doc_id: (r.shard, r.tokens, r.pack_id) for r in out}
        # nothing dropped, nothing duplicated
        assert len(out) == len(rows) and len(got) == len(rows)
        per_shard: dict = {}
        for doc_id, tokens in sorted(rows):
            per_shard.setdefault(doc_id % n_shards, []).append(
                (doc_id, tokens)
            )
        for shard, docs in per_shard.items():
            cum = 0
            for doc_id, tokens in docs:
                s, t, p = got[doc_id]
                assert s == shard and t == tokens
                assert p == cum // budget  # the exact greedy rule
                cum += tokens

    run()


def test_quality_sample_is_subset_and_deterministic(spark):
    sample = QUERIES["quality_weighted_sample"](spark, SF_SMALL).cache()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n_docs = docs.count()
    n_kept = sample.count()
    assert 0 < n_kept < n_docs
    # subset of the corpus by id
    stray = sample.join(docs, "doc_id", "left_anti").count()
    assert stray == 0
    # deterministic: second run keeps the identical set
    again = QUERIES["quality_weighted_sample"](spark, SF_SMALL)
    assert sample.exceptAll(again).count() == 0


def test_quality_sample_rate_tracks_mean_quality(spark):
    """The Weyl-sequence comparison keeps each doc with probability ~=
    its quality, so the aggregate keep rate must be close to the mean
    quality score (within 5 points on the shared corpus — the residues
    are equidistributed, not random)."""
    sample = QUERIES["quality_weighted_sample"](spark, SF_SMALL)
    from data_engineering_capstone_project_spark.functions import text as T

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    mean_q = docs.agg(F.avg(T.quality_score(F.col("text")))).first()[0]
    rate = sample.count() / docs.count()
    assert abs(rate - mean_q) < 0.05, (rate, mean_q)


class TestEpochShuffle:
    """epoch_shuffle must be a bijection onto contiguous shard
    positions, stable within an epoch, and a genuine re-deal across
    epochs."""

    def test_every_doc_has_one_slot_and_positions_are_contiguous(self, spark):
        out = QUERIES["epoch_shuffle"](spark, SF_SMALL).cache()
        n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
        assert out.count() == n_docs
        assert out.select("doc_id").distinct().count() == n_docs
        # per shard: positions are exactly 1..count(shard)
        bad = (
            out.groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("pos").alias("lo"),
                F.max("pos").alias("hi"),
                F.countDistinct("pos").alias("npos"),
            )
            .filter(
                (F.col("lo") != 1)
                | (F.col("hi") != F.col("n"))
                | (F.col("npos") != F.col("n"))
            )
            .count()
        )
        assert bad == 0
        out.unpersist()

    def test_same_epoch_is_stable_and_order_is_not_doc_id_order(self, spark):
        from pyspark.sql.window import Window

        a = QUERIES["epoch_shuffle"](spark, SF_SMALL)
        b = QUERIES["epoch_shuffle"](spark, SF_SMALL)
        assert a.exceptAll(b).count() == 0
        # the shuffle must actually permute: walking a shard in pos
        # order must hit doc_id inversions (ascending doc_id would mean
        # no re-ordering happened)
        w = Window.partitionBy("shard").orderBy("pos")
        inversions = (
            a.withColumn("prev", F.lag("doc_id").over(w))
            .filter(F.col("prev") > F.col("doc_id"))
            .count()
        )
        assert inversions > 0
