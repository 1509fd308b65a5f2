"""Multimodal plumbing tests: binary payload synthesis, header decode,
metadata extraction, resize, frame fan-out, audio features -- all via
the real mapInPandas path (the decode internals are the documented fake
backend; the real backend raises at the decode seam)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    base = spark.range(20).select(F.col("id").alias("media_id"))
    return base.withColumn(
        "content", M.make_fake_media(F.col("media_id"), M.KIND_IMAGE, payload_bytes=64)
    )


def test_payloads_are_binary_and_deterministic(media):
    rows = media.collect()
    assert all(isinstance(r.content, (bytes, bytearray)) for r in rows)
    again = {r.media_id: bytes(r.content) for r in media.collect()}
    assert {r.media_id: bytes(r.content) for r in rows} == again


def test_extract_media_meta(media):
    meta = M.extract_media_meta(media).collect()
    assert len(meta) == 20
    for r in meta:
        assert r.kind == M.KIND_IMAGE
        assert 32 <= r.width < 1056 and 32 <= r.height < 1056
        assert 1 <= r.n_frames <= 30
        assert r.n_bytes == M._HEADER_SIZE + 64


def test_resize_preserves_aspect_and_caps_side(media):
    orig = {r.media_id: (r.width, r.height) for r in M.extract_media_meta(media).collect()}
    resized = M.resize_images(media, max_side=64)
    meta = {r.media_id: (r.width, r.height) for r in resized.collect()}
    for mid, (w, h) in meta.items():
        ow, oh = orig[mid]
        assert max(w, h) <= 64
        scale = min(1.0, 64 / max(ow, oh))
        assert (w, h) == (max(1, int(ow * scale)), max(1, int(oh * scale)))
    # resized payloads still parse
    re_meta = M.extract_media_meta(resized.select("media_id", "content"))
    assert re_meta.count() == 20


def test_sample_video_frames_fan_out(media):
    frames = M.sample_video_frames(media, every_n=2)
    meta = {r.media_id: r.n_frames for r in M.extract_media_meta(media).collect()}
    counts = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    for mid, nf in meta.items():
        assert counts[mid] == (nf + 1) // 2  # frames 0,2,4,... < nf


def test_audio_features(spark):
    clips = spark.range(5).select(F.col("id").alias("media_id")).withColumn(
        "content", M.make_fake_media(F.col("media_id"), M.KIND_AUDIO, payload_bytes=128)
    )
    feats = M.audio_features(clips).collect()
    assert len(feats) == 5
    for r in feats:
        assert r.n_bytes == 128
        assert 0 <= r.mean_level <= r.peak_level <= 255


def test_real_backend_raises_at_decode_seam(media):
    with pytest.raises(Exception, match="NotImplementedError|real decode"):
        M.extract_media_meta(media, backend="real").collect()
