"""Empty-input contract over the WHOLE registry (r7 audit): a 100 TB
deployment routinely meets empty inputs — a new tenant, a gap day, a
quiet stream's first hours — and every registered query must either
return its (possibly empty) result or raise ONE clear, documented
ValueError, never an opaque engine error.

What the audit found and this file pins against regression:

* the serving tables' applied-batch-id watermark lived only as a
  column on the data rows, so an all-empty prefix of micro-batches
  lost the replay guard (fixed: durable sidecar published with the
  data — see streaming/serving.py ``applied_watermark``);
* empty centroid/codebook tables surfaced as Catalyst
  INVALID_EXTRACT_BASE_FIELD_TYPE analysis errors (fixed: loud
  ValueError at the quantizer — training on nothing is undefined,
  exactly as FAISS treats it);
* the DQ suite crashed on ANSI divide-by-zero instead of reporting
  (fixed: empty table reports every check failed — the safe CI-gate
  direction);
* merge-upsert could not read a just-initialized empty table back
  (fixed in the operator: schema-less dir merges as the updates).
"""

from __future__ import annotations

import glob
import os

import pytest

from data_engineering_capstone_project_spark.plans import QUERIES

SF_SMALL = "/root/testdata/sf0.001"

# Queries whose contract on an empty corpus is a LOUD ValueError: they
# train a coarse quantizer / PQ codebook, which is undefined over zero
# vectors. Everything else must produce a result frame.
QUANTIZER_TRAINING = {
    "ann_ivf_topk",
    # r10: builds the PQ codes table (trains the same codebooks)
    # before exercising the drop->adopt lifecycle
    "codes_table_adoption_parity",
    "ann_ivfpq_probe_sweep",
    "ann_ivfpq_topk",
    "ann_ivfpq_topk_indexed",
    "ann_pq_rerank_topk",
    "ann_pq_topk",
    "ann_pq_topk_after_delete",
    "ann_pq_topk_indexed",
    "cluster_balanced_sample",
    "kmeans_refine",
    "nearest_centroid_assign",
    "pq_encode_incremental",
}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """Empty twins of every test table, schemas taken from sf0.001."""
    dst = tmp_path_factory.mktemp("sf_empty")
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        spark.read.parquet(p).limit(0).write.mode("overwrite").parquet(
            str(dst / os.path.basename(p))
        )
    return str(dst)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_on_empty_tables(spark, empty_sf, name):
    if name in QUANTIZER_TRAINING:
        with pytest.raises(ValueError, match="empty"):
            QUERIES[name](spark, empty_sf).count()
    else:
        assert QUERIES[name](spark, empty_sf).count() >= 0


# On ALL-NULL inputs the quantizer contract is joined by the media
# decoders DROPPING null payloads (quarantine-at-ingest; a null in a
# binary column previously crashed the Python worker mid-batch).
# r8: lsh_bucket_histogram left this set — the whole similarity family
# now QUARANTINES non-indexable vectors (NULL/zero-norm) instead of
# raising, so an all-NULL embeddings table yields an empty histogram;
# sign_lsh_bucket still raises loudly on short NON-null vectors
# (corruption), pinned in tests/test_adversarial_corpus.py.
NULL_INPUT_RAISERS = set(QUANTIZER_TRAINING)


@pytest.fixture(scope="module")
def allnull_sf(spark, tmp_path_factory):
    """Twins of every table where EVERY column is NULL (50 rows each,
    schemas from sf0.001) — the bad-upstream-extract case."""
    from pyspark.sql import functions as F

    dst = tmp_path_factory.mktemp("sf_allnull")
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        df = spark.read.parquet(p)
        df.limit(50).select(
            [F.lit(None).cast(f.dataType).alias(f.name) for f in df.schema.fields]
        ).write.mode("overwrite").parquet(str(dst / os.path.basename(p)))
    return str(dst)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_on_all_null_tables(spark, allnull_sf, name):
    from pyspark.errors import SparkRuntimeException

    if name in NULL_INPUT_RAISERS:
        with pytest.raises((ValueError, SparkRuntimeException)):
            QUERIES[name](spark, allnull_sf).count()
    else:
        assert QUERIES[name](spark, allnull_sf).count() >= 0
