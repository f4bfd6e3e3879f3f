"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB media: image/audio/video travel as `binary` columns
with a typed metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas kernels over
mapInPandas so each task touches one partition's payload bytes once.

The decode step itself is STUBBED (the sandbox ships no image/audio
libs — see decode_image/decode_audio): the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested, with a
deterministic fake feature extractor standing in for the codec call.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media binary, media_type string, "
                "n_bytes long, digest string")
FEATURE_SCHEMA = ("doc_id long, n_bytes long, digest string, "
                  "width int, height int, feat array<float>")


def decode_image(payload: bytes):
    """Real image decode (PIL/libvips) — NOT AVAILABLE in this sandbox."""
    raise NotImplementedError(
        "image codecs not installed; use fake_features() which exercises "
        "the identical Spark plumbing with a deterministic stand-in")


def decode_audio(payload: bytes):
    raise NotImplementedError("audio codecs not installed (see module doc)")


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for decode+feature-extract: derives a fake
    (width, height) and an 8-dim feature from the payload digest."""
    d = hashlib.md5(payload).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    feat = (np.frombuffer(d[8:16], dtype=np.uint8).astype(np.float32)
            / 255.0)
    return width, height, feat


def media_table(docs: DataFrame, payload_col: str = "text") -> DataFrame:
    """Wrap a column as an opaque media payload with typed metadata —
    the ingest shape for multimodal data (metadata computable without
    decoding)."""
    payload = F.encode(F.col(payload_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("media"),
        F.lit("text/plain").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"))


FRAME_SCHEMA = ("doc_id long, frame_idx int, n_frame_bytes long, "
                "frame_digest string")


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing: split each binary payload into n_frames
    contiguous byte ranges and emit one row per frame. The byte-range
    arithmetic, Arrow batching and output schema are exactly what a
    real video frame sampler needs — only the decode inside each range
    is the documented stub (no codecs in this sandbox)."""

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "n_frame_bytes": [],
                    "frame_digest": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                ln = len(b)
                for i in range(n_frames):
                    fr = b[(ln * i) // n_frames:(ln * (i + 1)) // n_frames]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["n_frame_bytes"].append(len(fr))
                    rows["frame_digest"].append(
                        hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media").mapInPandas(run, FRAME_SCHEMA)


def resize_images(media: DataFrame, width: int = 64,
                  height: int = 64) -> DataFrame:
    """Resize plumbing: binary in, (dims + resized payload digest) out.
    A real resize would decode/resample inside the kernel
    (decode_image is the explicit stub); the deterministic stand-in
    derives the output bytes as payload || 'WxH' so the pipeline shape
    is fully testable and oracle-checkable."""

    def run(batches):
        tag = f"{width}x{height}".encode()
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "resized_digest": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                rows["doc_id"].append(doc_id)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["resized_digest"].append(
                    hashlib.md5(bytes(payload) + tag).hexdigest())
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media").mapInPandas(
        run, "doc_id long, width int, height int, resized_digest string")


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    plumbing (Arrow binary batches in, array<float> out); the decode
    call is the deterministic stub."""

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "n_bytes": [], "digest": [],
                    "width": [], "height": [], "feat": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                w, h, feat = _fake_decode(b)
                rows["doc_id"].append(doc_id)
                rows["n_bytes"].append(len(b))
                rows["digest"].append(hashlib.md5(b).hexdigest())
                rows["width"].append(w)
                rows["height"].append(h)
                rows["feat"].append(feat.tolist())
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media").mapInPandas(run, FEATURE_SCHEMA)
