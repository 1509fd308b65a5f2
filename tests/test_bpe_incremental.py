"""bpe_encode_incremental (r10): the frozen-vocab OOV/UNK contract.

The registered query's oracle gates (sf0.001/sf0.01 + the adversarial
corpus, where the new split's digits/punctuation are genuinely outside
the base alphabet) prove cross-engine agreement; this file pins the
CONTRACT on a corpus built to exercise it — because at the synthetic
SFs every character appears in both splits and unk_count is zero, a
regression that silently dropped OOV symbols (the inner-join bug this
query exists to prevent) would not change those gates' row values.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_capstone_project_spark.plans import QUERIES

# doc_id % 10 == 0 -> NEW split (encoded against the frozen vocab);
# everything else -> BASE split (trains merges + alphabet). The base
# has no digits and no 'z'; doc 10 is pure OOV; doc 0 mixes known
# words with unseen characters inside and between known ones.
DOCS = [
    (0, "the cat zaps 9 mats", "en", "s"),   # NEW: z/9 OOV, rest known
    (1, "the cat sat on the mat", "en", "s"),
    (2, "cats sat on mats", "en", "s"),
    (3, "the mat sat", "en", "s"),
    (10, "zz 99", "en", "s"),                # NEW: every char OOV
    (11, "the cat and the mat", "en", "s"),
]


@pytest.fixture(scope="module")
def oov_sf(spark, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_oov")
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
            "text": pa.array([d[1] for d in DOCS], pa.string()),
            "lang": pa.array([d[2] for d in DOCS], pa.string()),
            "source": pa.array([d[3] for d in DOCS], pa.string()),
        }
    )
    # keep only columns the real schema has, in its order, so table()
    # reads the fixture exactly like the shipped corpus
    cols = [c for c in real.columns if c in tbl.column_names]
    pq.write_table(tbl.select(cols), str(dst / "documents.parquet"))
    return str(dst)


def test_oov_symbols_become_unk_not_dropped(spark, oov_sf):
    rows = {
        r.doc_id: r
        for r in QUERIES["bpe_encode_incremental"](spark, oov_sf).collect()
    }
    assert set(rows) == {0, 10}, rows
    # doc 10 "zz 99": four OOV chars -> four UNK tokens, nothing
    # dropped, no merge ever fires across an OOV symbol
    assert rows[10].token_count == 4, rows[10]
    assert rows[10].unk_count == 4, rows[10]
    # doc 0: the unseen chars (z, 9 — however the trained merges
    # tile the known words) are each one UNK; known symbols got real
    # non-negative ids
    assert rows[0].unk_count >= 2, rows[0]
    assert rows[0].token_count > rows[0].unk_count, rows[0]
    # id_sum separates UNKs (-1 each) from real ids: removing the
    # UNK floor would change it, pinning the -1 convention
    assert rows[10].id_sum == -4, rows[10]


def test_new_split_never_influences_training(spark, oov_sf):
    """The frozen-vocab discipline itself: encoding must be identical
    whether or not the NEW documents exist, because they may not
    contribute to merges or ids. Drop doc 10 (the all-OOV doc) from
    the corpus and re-encode — doc 0's encoding is unchanged."""
    import glob
    import os

    full = {
        r.doc_id: (r.token_count, r.unk_count, r.id_sum)
        for r in QUERIES["bpe_encode_incremental"](spark, oov_sf).collect()
    }
    pruned_dir = oov_sf + "_pruned"
    os.makedirs(pruned_dir, exist_ok=True)
    df = spark.read.parquet(f"{oov_sf}/documents.parquet")
    df.filter("doc_id <> 10").coalesce(1).write.mode("overwrite").parquet(
        f"{pruned_dir}/documents.parquet"
    )
    pruned = {
        r.doc_id: (r.token_count, r.unk_count, r.id_sum)
        for r in QUERIES["bpe_encode_incremental"](spark, pruned_dir).collect()
    }
    assert pruned == {0: full[0]}, (full, pruned)


def test_streamed_oov_monitor_counts_unks(spark, oov_sf):
    """The 9th serving table on the OOV fixture: the maintained
    per-source statistics must carry the UNK counts through the
    additive merges (a lost unk column would still pass a
    token-total-only check)."""
    from data_engineering_capstone_project_spark.plans import QUERIES

    rows = {
        r.source: r
        for r in QUERIES["oov_drift_streamed_parity"](spark, oov_sf).collect()
    }
    # both NEW docs share source "s": 2 encodable docs, 7 UNKs
    # (z, p, 9 in doc 0 — the base alphabet has no z/p/digits;
    # z, z, 9, 9 in doc 10)
    assert rows["s"].docs == 2, rows
    assert rows["s"].unks == 7, rows
    assert rows["s"].tokens > rows["s"].unks, rows


def test_engine_streamed_oov_monitor_matches(spark, oov_sf):
    """The engine-path twin on the same OOV fixture: real readStream
    micro-batches + full-job replay must land the identical per-source
    statistics (7 UNKs) as the hand-loop fold."""
    from data_engineering_capstone_project_spark.plans import QUERIES

    rows = {
        r.source: r
        for r in QUERIES["oov_drift_engine_streamed_parity"](
            spark, oov_sf
        ).collect()
    }
    assert rows["s"].docs == 2, rows
    assert rows["s"].unks == 7, rows
    assert rows["s"].tokens > rows["s"].unks, rows


def test_maintain_oov_drift_applied_log_protocol(spark, oov_sf):
    """maintain_oov_drift returns the per-batch applied log (r11
    advice fix): a first drain applies every engine batch, a full-job
    replay against a fresh checkpoint reports applied=False for all
    of them. This is the boolean the engine parity now RAISES on —
    previously it was discarded and a guard regression surfaced only
    as a doubled-count oracle hash mismatch."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        _bpe_frozen_artifacts,
    )
    from data_engineering_capstone_project_spark.streaming.serving import (
        maintain_oov_drift,
    )

    _, new, learned, sym_ids = _bpe_frozen_artifacts(spark, oov_sf)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        stage = f"{tmp}/stage"
        serving = f"{tmp}/serving"
        new.repartition(2).write.mode("overwrite").parquet(stage)
        schema = spark.read.parquet(stage).schema

        def _stream():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage)
            )

        first = maintain_oov_drift(
            _stream(), serving, f"{tmp}/chk1", sym_ids, learned
        )
        assert first and all(applied for _, applied in first), first
        replay = maintain_oov_drift(
            _stream(), serving, f"{tmp}/chk2", sym_ids, learned
        )
        assert [bid for bid, _ in replay] == [bid for bid, _ in first], replay
        assert all(applied is False for _, applied in replay), replay


def test_engine_parity_raises_when_guard_lies(spark, oov_sf, monkeypatch):
    """Negative case for the r11 protocol: if the batch-id guard ever
    reported applied=True during the replay (a guard regression), the
    engine parity must raise with the batch ids named — not deliver a
    silently doubled table to the oracle."""
    from data_engineering_capstone_project_spark.streaming import serving as S

    real = S.apply_additive_batch

    def lying(*args, **kwargs):
        real(*args, **kwargs)
        return True  # claim every batch applied, replays included

    monkeypatch.setattr(S, "apply_additive_batch", lying)
    with pytest.raises(RuntimeError, match="failed to skip replayed"):
        QUERIES["oov_drift_engine_streamed_parity"](spark, oov_sf).collect()


def test_published_artifacts_reproduce_in_query_training(spark, oov_sf):
    """bpe_encode_published (r11): encoding against LOADED warehouse
    artifacts must be row-exact equal to bpe_encode_incremental's
    in-memory-artifact encode on the OOV fixture — where UNK counts
    are nonzero, so a round-trip corruption of the id table (tid
    drift, dropped alphabet row) or of merge order cannot hide."""
    mem = sorted(
        QUERIES["bpe_encode_incremental"](spark, oov_sf).collect(),
        key=lambda r: r.doc_id,
    )
    pub = sorted(
        QUERIES["bpe_encode_published"](spark, oov_sf).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.asDict() for r in pub] == [r.asDict() for r in mem]
    assert any(r.unk_count > 0 for r in pub)


def test_tokenizer_artifact_roundtrip(spark, oov_sf, tmp_path):
    """publish_tokenizer_artifacts -> load_tokenizer_artifacts is the
    identity on both halves: the ROUND-ORDERED merge list and the
    full (sym, tid) table."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        _bpe_frozen_artifacts,
        bpe_merge_rounds,
        load_tokenizer_artifacts,
        publish_tokenizer_artifacts,
    )
    from pyspark.sql import functions as F

    from data_engineering_capstone_project_spark.operators import dedup as D
    from data_engineering_capstone_project_spark.plans.registry import table

    base, _, learned, sym_ids = _bpe_frozen_artifacts(spark, oov_sf)
    vocab = (
        base.select(F.explode(D.tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
    )
    merges = bpe_merge_rounds(vocab, rounds=3)
    publish_tokenizer_artifacts(merges, sym_ids, str(tmp_path))
    learned2, sym_ids2 = load_tokenizer_artifacts(spark, str(tmp_path))
    assert learned2 == learned
    want = sorted((r.sym, r.tid) for r in sym_ids.collect())
    got = sorted((r.sym, r.tid) for r in sym_ids2.collect())
    assert got == want and len(got) > 0


def test_oov_monitor_with_loaded_artifacts_matches(spark, oov_sf, tmp_path):
    """The streaming half of the publish-and-load story (r11, VERDICT
    r10 #7): maintain_oov_drift bound to artifacts LOADED from the
    published warehouse tables must land the identical per-source
    table as the in-memory-artifact drain — the production deployment
    (monitor loads merges.txt/vocab.json equivalents at job start,
    never retrains)."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        _bpe_frozen_artifacts,
        bpe_merge_rounds,
        load_tokenizer_artifacts,
        publish_tokenizer_artifacts,
    )
    from data_engineering_capstone_project_spark.streaming.serving import (
        maintain_oov_drift,
    )
    from pyspark.sql import functions as F

    from data_engineering_capstone_project_spark.operators import dedup as D

    base, new, learned, sym_ids = _bpe_frozen_artifacts(spark, oov_sf)
    vocab = (
        base.select(F.explode(D.tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
    )
    publish_tokenizer_artifacts(
        bpe_merge_rounds(vocab, rounds=3), sym_ids, str(tmp_path / "art")
    )
    loaded_learned, loaded_sym_ids = load_tokenizer_artifacts(
        spark, str(tmp_path / "art")
    )

    stage = str(tmp_path / "stage")
    new.repartition(2).write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(stage).schema

    def _drain(serving, chk, lrn, ids):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        log = maintain_oov_drift(stream, serving, chk, ids, lrn)
        assert all(applied for _, applied in log), log
        return sorted(
            (r.source, r.docs, r.tokens, r.unks)
            for r in spark.read.parquet(serving).collect()
        )

    mem = _drain(str(tmp_path / "s_mem"), str(tmp_path / "c_mem"), learned, sym_ids)
    pub = _drain(
        str(tmp_path / "s_pub"), str(tmp_path / "c_pub"),
        loaded_learned, loaded_sym_ids,
    )
    assert pub == mem and any(r[3] > 0 for r in pub)


def test_scratch_dirs_fresh_per_invocation():
    """r12 advice fix: _parity_scratch_dir keys per INVOCATION, so a
    second same-process call can never rmtree the path an earlier
    call's still-held lazy frame reads."""
    from data_engineering_capstone_project_spark.plans.events_windows import (
        _parity_scratch_dir,
    )

    a = _parity_scratch_dir("decps_test_stem")
    b = _parity_scratch_dir("decps_test_stem")
    assert a != b


def test_published_frame_survives_second_invocation(spark, oov_sf):
    """The latent bug the fix closes: hold bpe_encode_published's
    returned frame UNEVALUATED, invoke the query again in the same
    process (which re-publishes its artifacts), then evaluate the
    held frame — under the old pid-keyed scratch dir the second
    invocation's rmtree+rewrite raced the first frame's lazy read of
    {warehouse}/bpe_vocab; with per-invocation dirs both frames read
    their own immutable publish."""
    held = QUERIES["bpe_encode_published"](spark, oov_sf)  # not evaluated
    second = sorted(
        map(tuple, QUERIES["bpe_encode_published"](spark, oov_sf).collect())
    )
    first = sorted(map(tuple, held.collect()))  # evaluated AFTER round 2
    assert first == second and len(first) > 0
