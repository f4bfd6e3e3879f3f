"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB media: image/audio/video travel as `binary` columns
with a typed metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas kernels over
mapInPandas so each task touches one partition's payload bytes once.

Decode status (the sandbox ships no external image/audio libs, so the
codec surface is split honestly):
  * REAL, codec-free decoders for the two ubiquitous uncompressed
    formats: BMP (24-bit BI_RGB, pure numpy+struct — decode_image) and
    WAV (PCM-16, stdlib wave — decode_audio), with matching encoders
    so synthesis, resize round-trips, and tests need no fixtures from
    outside the repo. resize_images and extract_features run the REAL
    decode -> resample/feature -> re-encode path for these types.
  * Everything compressed (PNG/JPEG/MP3/H.264 ...) raises
    NotImplementedError with a clear message; the deterministic
    digest-based stand-in (media_type "text/plain" or unknown) keeps
    the Spark plumbing and the DuckDB oracles exercising the identical
    batch shape.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media binary, media_type string, "
                "n_bytes long, digest string")
FEATURE_SCHEMA = ("doc_id long, n_bytes long, digest string, "
                  "width int, height int, feat array<float>")


# ------------------------------------------------------------------ codecs

def encode_bmp(rgb: np.ndarray) -> bytes:
    """uint8 HxWx3 RGB -> 24-bit BI_RGB .bmp bytes (bottom-up rows,
    4-byte row padding — the wire format, verified by round-trip)."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_bmp expects uint8 HxWx3 RGB")
    h, w, _ = rgb.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * h
    bgr = rgb[::-1, :, ::-1]                      # bottom-up, RGB->BGR
    zeros = b"\x00" * pad
    body = b"".join(bgr[r].tobytes() + zeros for r in range(h))
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    return header + info + body


def decode_image(payload: bytes) -> np.ndarray:
    """Codec-free image decode: 24-bit uncompressed BMP (BI_RGB,
    bottom-up or top-down) -> uint8 HxWx3 RGB. Compressed formats need
    codecs the sandbox doesn't ship and raise NotImplementedError."""
    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        raise NotImplementedError(
            "only uncompressed 24-bit BMP is decodable codec-free; "
            "PNG/JPEG/... need image libs not installed in this sandbox")
    (data_off,) = struct.unpack_from("<I", b, 10)
    w, h = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (comp,) = struct.unpack_from("<I", b, 30)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={comp}: only 24-bit BI_RGB "
            f"is supported codec-free")
    top_down = h < 0
    h = abs(h)
    row = w * 3
    stride = row + (4 - row % 4) % 4
    arr = (np.frombuffer(b, np.uint8, stride * h, data_off)
           .reshape(h, stride)[:, :row].reshape(h, w, 3))
    if not top_down:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()                 # BGR -> RGB


def encode_wav(samples: np.ndarray, rate: int = 16000,
               channels: int = 1) -> bytes:
    """int16 samples (flat, interleaved if channels>1) -> PCM-16 .wav."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples).astype("<i2").tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Codec-free audio decode: PCM-16 WAV (stdlib wave) ->
    (sample_rate, int16 array shaped (n_frames, n_channels))."""
    try:
        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            if w.getsampwidth() != 2 or w.getcomptype() != "NONE":
                raise NotImplementedError(
                    "only PCM-16 WAV is decodable codec-free")
            data = np.frombuffer(w.readframes(w.getnframes()),
                                 dtype="<i2")
            return w.getframerate(), data.reshape(-1, w.getnchannels())
    except wave.Error as e:
        raise NotImplementedError(
            f"not a PCM WAV payload ({e}); compressed audio needs "
            f"codecs not installed in this sandbox") from e


def resize_rgb(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (pure index math, deterministic)."""
    h, w, _ = arr.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def _image_features(rgb: np.ndarray) -> np.ndarray:
    """12-dim: mean R,G,B per 2x2 spatial quadrant, /255."""
    h, w, _ = rgb.shape
    hs, ws = max(1, h // 2), max(1, w // 2)
    out = []
    for qy in (slice(0, hs), slice(hs, h)):
        for qx in (slice(0, ws), slice(ws, w)):
            q = rgb[qy, qx]
            m = (q.reshape(-1, 3).mean(axis=0) if q.size
                 else np.zeros(3))
            out.extend(m / 255.0)
    return np.asarray(out, dtype=np.float32)


def _audio_features(frames: np.ndarray) -> np.ndarray:
    """4-dim: rms, zero-cross rate, mean, abs-peak — all /int16 max."""
    x = frames.astype(np.float64).mean(axis=1) / 32768.0
    if not len(x):
        return np.zeros(4, dtype=np.float32)
    zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
        if len(x) > 1 else 0.0
    return np.asarray([np.sqrt(np.mean(x * x)), zc, np.mean(x),
                       np.max(np.abs(x))], dtype=np.float32)


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for the codec-bound formats: derives a
    fake (width, height) and an 8-dim feature from the payload digest
    (the DuckDB-oracled path — byte-stable forever)."""
    d = hashlib.md5(payload).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    feat = (np.frombuffer(d[8:16], dtype=np.uint8).astype(np.float32)
            / 255.0)
    return width, height, feat


# ------------------------------------------------------------- operators

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
    is codec-bound (video codecs are not in this sandbox)."""

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


def _media_types(pdf: pd.DataFrame) -> pd.Series:
    if "media_type" in pdf.columns:
        return pdf["media_type"]
    return pd.Series(["application/octet-stream"] * len(pdf))


def resize_images(media: DataFrame, width: int = 64,
                  height: int = 64) -> DataFrame:
    """Resize: binary in, (dims + resized payload digest) out.

    image/bmp payloads take the REAL path — decode (24-bit BMP),
    nearest-neighbor resample, re-encode, digest the new bytes. Other
    types keep the deterministic digest stand-in (payload || 'WxH'),
    which is what the DuckDB oracle pins."""

    cols = [c for c in ("doc_id", "media", "media_type")
            if c in media.columns]

    def run(batches):
        tag = f"{width}x{height}".encode()
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "resized_digest": []}
            for doc_id, payload, mt in zip(pdf["doc_id"], pdf["media"],
                                           _media_types(pdf)):
                b = bytes(payload)
                if mt == "image/bmp":
                    out = encode_bmp(resize_rgb(decode_image(b),
                                                width, height))
                else:
                    out = b + tag
                rows["doc_id"].append(doc_id)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["resized_digest"].append(
                    hashlib.md5(out).hexdigest())
            yield pd.DataFrame(rows)

    return media.select(*cols).mapInPandas(
        run, "doc_id long, width int, height int, resized_digest string")


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    image/bmp -> real decode, true (width, height), 12-dim quadrant
    RGB means. audio/wav -> real decode, (n_frames, n_channels) in the
    (width, height) slots, 4-dim (rms, zcr, mean, peak). Anything else
    -> the deterministic digest stand-in (the oracled path)."""

    cols = [c for c in ("doc_id", "media", "media_type")
            if c in media.columns]

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "n_bytes": [], "digest": [],
                    "width": [], "height": [], "feat": []}
            for doc_id, payload, mt in zip(pdf["doc_id"], pdf["media"],
                                           _media_types(pdf)):
                b = bytes(payload)
                if mt == "image/bmp":
                    rgb = decode_image(b)
                    h, w = rgb.shape[:2]
                    feat = _image_features(rgb)
                elif mt == "audio/wav":
                    _, frames = decode_audio(b)
                    w, h = frames.shape          # n_frames, n_channels
                    feat = _audio_features(frames)
                else:
                    w, h, feat = _fake_decode(b)
                rows["doc_id"].append(doc_id)
                rows["n_bytes"].append(len(b))
                rows["digest"].append(hashlib.md5(b).hexdigest())
                rows["width"].append(w)
                rows["height"].append(h)
                rows["feat"].append(feat.tolist())
            yield pd.DataFrame(rows)

    return media.select(*cols).mapInPandas(run, FEATURE_SCHEMA)
