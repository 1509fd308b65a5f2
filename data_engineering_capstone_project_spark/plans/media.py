"""Multimodal (binary media column) query surface.

Each query drives the full binary path — JVM-side payload synthesis
(operators.multimodal.make_fake_media) -> Arrow batch -> mapInPandas
decode — and is still oracle-checked: the fake codec derives every
field arithmetically from md5(seed), which DuckDB can recompute without
touching the binary. So the oracle validates the whole encode/decode
round-trip, not just row counts.

The real-decode backend (PIL/ffmpeg) slots into the same operators
(``backend="real"`` seam in operators/multimodal.py); these plans pin
the Spark-side plumbing: schema, batching, column pruning, and the
row fan-out shape for frame sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators import multimodal as M
from data_engineering_capstone_project_spark.plans.registry import query, table

# DuckDB twins of make_fake_media's header arithmetic.
_H = "md5(CAST(vec_id AS VARCHAR))"
_W = f"(('0x' || substr({_H}, 1, 4))::INT % 1024 + 32)"
_HT = f"(('0x' || substr({_H}, 5, 4))::INT % 1024 + 32)"
_NF = f"(('0x' || substr({_H}, 9, 4))::INT % 30 + 1)"


def _fake_media(spark: SparkSession, sf_dir: str, kind: int) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias("media_id"),
        M.make_fake_media(F.col("vec_id"), kind).alias("content"),
    )


@query(
    "media_meta",
    oracle=f"""
    SELECT vec_id AS media_id,
           CAST(0 AS INTEGER) AS kind,
           CAST({_W} AS INTEGER) AS width,
           CAST({_HT} AS INTEGER) AS height,
           CAST({_NF} AS INTEGER) AS n_frames,
           CAST(73 AS INTEGER) AS n_bytes
    FROM embeddings
    """,
)
def media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary header -> typed metadata, row for row (9-byte header +
    64-byte body = 73). The strongest check of the Arrow round-trip:
    every decoded field must equal DuckDB's arithmetic reconstruction."""
    media = _fake_media(spark, sf_dir, M.KIND_IMAGE)
    return M.extract_media_meta(media)


@query(
    "video_frame_plan",
    oracle=f"""
    WITH m AS (SELECT vec_id AS media_id, {_NF} AS nf FROM embeddings)
    SELECT media_id,
           CAST(f AS INTEGER) AS frame_no,
           CAST(64 // nf AS INTEGER) AS frame_len
    FROM m, unnest(generate_series(0, nf - 1, 2)) AS t(f)
    """,
)
def video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (1 row per sampled frame, every_n=2).
    Validates the row-multiplying mapInPandas shape: output cardinality
    and per-frame slice sizes must match the closed-form oracle."""
    media = _fake_media(spark, sf_dir, M.KIND_VIDEO)
    frames = M.sample_video_frames(media, every_n=2)
    return frames.select(
        "media_id", "frame_no", F.length("frame").cast("int").alias("frame_len")
    )


@query(
    "audio_levels",
    oracle=f"""
    WITH m AS (SELECT vec_id AS media_id,
                      substr(repeat(md5(CAST(vec_id AS VARCHAR)), 3), 1, 64) AS body
               FROM embeddings),
         b AS (SELECT media_id, ascii(substr(body, i, 1)) AS v
               FROM m, unnest(generate_series(1, 64)) AS t(i))
    SELECT media_id,
           CAST(64 AS INTEGER) AS n_bytes,
           sum(v) / 64.0 AS mean_level,
           CAST(max(v) AS DOUBLE) AS peak_level
    FROM b
    GROUP BY media_id
    """,
)
def audio_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized per-clip features over the byte payload. mean/peak of
    64 small ints are exact in float64 (no rounding needed), so the
    numpy path must agree bit-for-bit with DuckDB's integer sum."""
    media = _fake_media(spark, sf_dir, M.KIND_AUDIO)
    return M.audio_features(media)


@query(
    "image_resize_plan",
    oracle=f"""
    WITH m AS (SELECT vec_id AS media_id, {_W} AS w, {_HT} AS h FROM embeddings)
    SELECT media_id,
           CAST(greatest(1, floor(w * least(1.0, 256.0 / greatest(w, h)))) AS INTEGER) AS width,
           CAST(greatest(1, floor(h * least(1.0, 256.0 / greatest(w, h)))) AS INTEGER) AS height
    FROM m
    """,
)
def image_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize to max side 256 through the binary
    header round-trip; the oracle recomputes the scaled dimensions in
    closed form (int() truncation == floor for positive scales, and the
    double products are bit-identical across engines)."""
    media = _fake_media(spark, sf_dir, M.KIND_IMAGE)
    return M.resize_images(media, max_side=256).select(
        "media_id", "width", "height"
    )


@query(
    "image_phash_dedup",
    oracle="""
    SELECT phash, min(media_id) AS keep_id, count(*) AS dups
    FROM (
        SELECT vec_id AS media_id,
               substr(md5(substr(repeat(md5(CAST(vec_id % 300 AS VARCHAR)), 3),
                                 1, 64)), 1, 16) AS phash
        FROM embeddings
    )
    GROUP BY phash
    """,
)
def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup through the BINARY path: synthesize payloads where
    distinct media ids share pixel bodies (seed = vec_id % 300 — the
    re-uploaded-image case), decode via the Arrow mapInPandas pHash
    operator, then the standard keep-min-id dedup groupBy on the hash.
    The oracle reconstructs the pHash arithmetically from the fake
    codec's definition, so the binary encode -> Arrow -> Python decode
    -> hash chain is value-checked end to end. Scale posture: identical
    to dedup_exact — a linear scan (Arrow-batched Python for the
    decode) and one hash-shuffle on the fingerprint."""
    emb = table(spark, sf_dir, "embeddings")
    media = emb.select(
        F.col("vec_id").alias("media_id"),
        M.make_fake_media(F.col("vec_id") % 300, M.KIND_IMAGE).alias("content"),
    )
    return (
        M.image_phash(media)
        .groupBy("phash")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count("*").alias("dups"),
        )
    )
