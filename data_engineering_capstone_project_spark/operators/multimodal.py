"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payload + typed metadata, processed with
Arrow-batched ``mapInPandas`` operators.

The decode step is STUBBED: this container has no image/audio libraries
(no PIL/cv2/librosa), so each operator takes ``backend="fake"`` (a
deterministic header-based codec, default, used by tests) or
``backend="real"`` which raises NotImplementedError at the exact seam
where PIL/ffmpeg decode plugs in. Everything Spark-side -- schemas,
batch iteration, column pruning, row fan-out for frame sampling -- is
real and tested.

Scale notes: mapInPandas streams Arrow record batches, so peak memory
is one batch of payloads per core, not a partition; keep
``spark.sql.execution.arrow.maxRecordsInBatch`` sized so
batch_rows x payload_size fits the executor (e.g. 1000 x 10 MB images
is 10 GB -- LOWER it for media tables). Payload columns are only
materialized if selected -- metadata-only queries prune the binary
column at the parquet scan.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fake media header: magic(2s) kind(B) width(H) height(H) n_frames(H).
# (plain constants, not struct.Struct: cloudpickle cannot serialize the
# compiled Struct object captured by mapInPandas closures)
_HEADER_FMT = ">2sBHHH"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)
_MAGIC = b"FM"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 0, 1, 2


def make_fake_media(seed: Column, kind: int, payload_bytes: int = 64) -> Column:
    """Deterministic binary payload for tests/dev: a parseable header +
    md5-derived bytes. Width/height/frames derive from the seed."""
    h = F.md5(seed.cast("string"))
    w = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 1024) + 32
    ht = (F.conv(F.substring(h, 5, 4), 16, 10).cast("int") % 1024) + 32
    nf = (F.conv(F.substring(h, 9, 4), 16, 10).cast("int") % 30) + 1
    header = F.concat(
        F.lit(_MAGIC),
        F.lit(bytes([kind])),
        _be16(w),
        _be16(ht),
        _be16(nf),
    )
    body = F.encode(F.repeat(h, payload_bytes // 32 + 1), "utf-8")
    return F.concat(header, F.substring(body, 1, payload_bytes))


def _be16(col: Column) -> Column:
    """int -> 2 big-endian bytes (as binary)."""
    return F.unhex(F.lpad(F.hex(col.cast("int")), 4, "0"))


def _parse_header(payload: bytes) -> tuple[int, int, int, int]:
    """-> (kind, width, height, n_frames); raises on non-fake payloads."""
    magic, kind, w, h, nf = struct.unpack_from(_HEADER_FMT, payload)
    if magic != _MAGIC:
        raise ValueError("not a fake-media payload")
    return kind, w, h, nf


def _require_real_backend(op: str):
    # Re-checked rounds 5, 6 and 7 (latest 2026-08-15, r7): PIL, cv2,
    # soundfile, av, imageio, librosa, torchvision, skimage and ffmpeg
    # are all absent from the container, so the real backend stays a
    # documented seam rather than an importable path. (google.protobuf
    # is likewise still missing, keeping the transformWithState parity
    # skip-gated — tests/test_streaming.py.)
    raise NotImplementedError(
        f"{op}: real decode requires PIL/cv2/librosa, not present in this "
        "environment. The Spark plumbing (schema, batching, fan-out) is "
        "identical for the real backend -- plug the library call into the "
        "marked seam."
    )


def _non_null_payloads(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Shared decode-entry filter: NULL payloads are DROPPED before the
    Arrow batch reaches the codec (quarantine-at-ingest semantics — a
    row without bytes has nothing to decode, and a real backend would
    route it to a dead-letter sink the same way). Without this, a null
    in the binary column crashes the Python worker mid-batch (r7
    all-NULL input audit)."""
    return df.select(id_col, content_col).filter(
        F.col(content_col).isNotNull()
    )


META_SCHEMA = "media_id bigint, kind int, width int, height int, n_frames int, n_bytes int"


def extract_media_meta(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content",
    backend: str = "fake",
) -> DataFrame:
    """Decode headers -> typed metadata. One output row per non-null
    input row (null payloads are dropped — ``_non_null_payloads``)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend != "fake":
                _require_real_backend("extract_media_meta")  # decode seam
            parsed = [_parse_header(p) for p in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "kind": [p[0] for p in parsed],
                    "width": [p[1] for p in parsed],
                    "height": [p[2] for p in parsed],
                    "n_frames": [p[3] for p in parsed],
                    "n_bytes": [len(p) for p in pdf[content_col]],
                }
            )

    return _non_null_payloads(df, id_col, content_col).mapInPandas(
        gen, META_SCHEMA
    )


RESIZE_SCHEMA = "media_id bigint, width int, height int, content binary"


def resize_images(
    df: DataFrame, max_side: int, id_col: str = "media_id",
    content_col: str = "content", backend: str = "fake",
) -> DataFrame:
    """Downscale so max(width, height) <= max_side, preserving aspect.
    Fake backend rewrites the header only (payload untouched); the real
    backend would re-encode pixels at the marked seam."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, out_c = [], [], []
            for payload in pdf[content_col]:
                kind, w, h, nf = _parse_header(payload)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                if backend != "fake":
                    _require_real_backend("resize_images")  # re-encode seam
                body = payload[_HEADER_SIZE:]
                out_w.append(nw)
                out_h.append(nh)
                out_c.append(struct.pack(_HEADER_FMT, _MAGIC, kind, nw, nh, nf) + body)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "width": out_w,
                    "height": out_h,
                    "content": out_c,
                }
            )

    return _non_null_payloads(df, id_col, content_col).mapInPandas(
        gen, RESIZE_SCHEMA
    )


FRAME_SCHEMA = "media_id bigint, frame_no int, frame binary"


def sample_video_frames(
    df: DataFrame, every_n: int = 2, id_col: str = "media_id",
    content_col: str = "content", backend: str = "fake",
) -> DataFrame:
    """Fan out one row per sampled frame (frame_no 0, every_n, 2*every_n,
    ... < n_frames). Fake frames are fixed-width slices of the payload;
    a real backend decodes at the marked seam. Output can be much larger
    than input -- repartition downstream if frames feed another shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for media_id, payload in zip(pdf[id_col], pdf[content_col]):
                kind, w, h, nf = _parse_header(payload)
                if backend != "fake":
                    _require_real_backend("sample_video_frames")  # decode seam
                body = payload[_HEADER_SIZE:]
                step = max(1, len(body) // max(nf, 1))
                for frame_no in range(0, nf, every_n):
                    ids.append(media_id)
                    nos.append(frame_no)
                    frames.append(body[frame_no * step:(frame_no + 1) * step])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return _non_null_payloads(df, id_col, content_col).mapInPandas(
        gen, FRAME_SCHEMA
    )


AUDIO_SCHEMA = "media_id bigint, n_bytes int, mean_level double, peak_level double"


def audio_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content",
    backend: str = "fake",
) -> DataFrame:
    """Cheap per-clip features (vectorized numpy over the Arrow batch).
    Fake backend treats payload bytes as 8-bit samples; real backend
    would decode PCM at the marked seam."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend != "fake":
                _require_real_backend("audio_features")  # decode seam
            arrs = [
                np.frombuffer(p[_HEADER_SIZE:], dtype=np.uint8).astype(np.float64)
                for p in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "n_bytes": [a.size for a in arrs],
                    "mean_level": [float(a.mean()) if a.size else 0.0 for a in arrs],
                    "peak_level": [float(a.max()) if a.size else 0.0 for a in arrs],
                }
            )

    return _non_null_payloads(df, id_col, content_col).mapInPandas(
        gen, AUDIO_SCHEMA
    )


PHASH_SCHEMA = "media_id bigint, phash string"


def image_phash(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content",
    backend: str = "fake",
) -> DataFrame:
    """Perceptual hash per image — the content-level fingerprint that
    makes binary columns deduplicable (byte-identical files are caught
    by md5 of the blob; pHash also catches re-encodes/resizes when a
    real backend computes it from decoded pixels). Fake backend: a
    64-bit hex digest of the payload BODY (not the header), so two
    payloads with the same pixels-stand-in body collide exactly — the
    property the dedup step needs — and an external engine can verify
    the full decode round-trip arithmetically. Real backend: DCT-based
    pHash over the decoded image at the marked seam."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend != "fake":
                _require_real_backend("image_phash")  # decode seam
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "phash": [
                        hashlib.md5(bytes(p)[_HEADER_SIZE:]).hexdigest()[:16]
                        for p in pdf[content_col]
                    ],
                }
            )

    return _non_null_payloads(df, id_col, content_col).mapInPandas(
        gen, PHASH_SCHEMA
    )
