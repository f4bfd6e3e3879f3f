"""Real codec-free media decode (BMP 24-bit / WAV PCM-16) behind the
multimodal plumbing — upgrades VERDICT r4 "missing #4" from an
all-stub decode to real decoders for the two uncompressed formats,
with the digest stand-in (and its DuckDB oracles) untouched for
codec-bound types."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from irkit_spark.pipeline.multimodal import (_fake_decode,
                                             _image_features,
                                             decode_audio, decode_image,
                                             encode_bmp, encode_wav,
                                             extract_features,
                                             resize_images, resize_rgb)


def _rng_rgb(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_all_paddings():
    # widths 1..5 cover every 4-byte row-padding residue
    for w in range(1, 6):
        for h in (1, 3, 8):
            rgb = _rng_rgb(h, w, seed=w * 10 + h)
            assert np.array_equal(decode_image(encode_bmp(rgb)), rgb)


def test_bmp_topdown_decode():
    rgb = _rng_rgb(3, 2, seed=7)
    b = bytearray(encode_bmp(rgb))
    # flip height sign -> top-down; rows must then be reordered
    (hpos,) = struct.unpack_from("<i", b, 22)
    struct.pack_into("<i", b, 22, -hpos)
    row = 2 * 3
    stride = row + (4 - row % 4) % 4
    body = bytes(b[54:])
    rows = [body[i * stride:(i + 1) * stride] for i in range(3)]
    b[54:] = b"".join(reversed(rows))
    assert np.array_equal(decode_image(bytes(b)), rgb)


def test_non_bmp_and_compressed_raise():
    with pytest.raises(NotImplementedError, match="PNG/JPEG"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    # valid header but 8-bit: unsupported depth
    rgb = _rng_rgb(2, 2)
    b = bytearray(encode_bmp(rgb))
    struct.pack_into("<H", b, 28, 8)
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_image(bytes(b))


def test_wav_roundtrip_mono_stereo():
    t = np.arange(400)
    mono = (np.sin(t / 7.0) * 12000).astype(np.int16)
    rate, frames = decode_audio(encode_wav(mono, rate=8000))
    assert rate == 8000 and frames.shape == (400, 1)
    assert np.array_equal(frames[:, 0], mono)
    stereo = np.stack([mono, (mono // 2)], axis=1).reshape(-1)
    rate, frames = decode_audio(encode_wav(stereo, rate=16000,
                                           channels=2))
    assert rate == 16000 and frames.shape == (400, 2)
    assert np.array_equal(frames[:, 1], mono // 2)


def test_non_wav_raises():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04 not a wav")


def test_resize_rgb_nearest_neighbor_exact():
    rgb = _rng_rgb(10, 6, seed=3)
    out = resize_rgb(rgb, 3, 5)
    ys = (np.arange(5) * 10) // 5
    xs = (np.arange(3) * 6) // 3
    assert np.array_equal(out, rgb[ys][:, xs])
    assert np.array_equal(resize_rgb(rgb, 6, 10), rgb)   # identity


def test_image_features_solid_color():
    rgb = np.full((8, 8, 3), (51, 102, 204), dtype=np.uint8)
    f = _image_features(rgb)
    assert f.shape == (12,)
    want = np.tile(np.array([51, 102, 204]) / 255.0, 4)
    assert np.allclose(f, want)


def _mixed_media_df(spark):
    rows = []
    for i in range(6):
        rgb = _rng_rgb(4 + i, 3 + i, seed=i)
        rows.append((i, bytearray(encode_bmp(rgb)), "image/bmp"))
    for i in range(6, 10):
        s = (np.sin(np.arange(256) / (3.0 + i)) * 9000).astype(np.int16)
        rows.append((i, bytearray(encode_wav(s, rate=8000)), "audio/wav"))
    rows.append((10, bytearray(b"plain words"), "text/plain"))
    df = spark.createDataFrame(
        rows, "doc_id long, media binary, media_type string")
    return df, rows


def test_extract_features_real_paths(spark):
    df, rows = _mixed_media_df(spark)
    got = {r["doc_id"]: r for r in extract_features(df).collect()}
    assert len(got) == 11
    for i in range(6):
        rgb = decode_image(bytes(rows[i][1]))
        assert (got[i]["width"], got[i]["height"]) == \
            (rgb.shape[1], rgb.shape[0])
        assert np.allclose(got[i]["feat"], _image_features(rgb),
                           atol=1e-6)
    for i in range(6, 10):
        assert (got[i]["width"], got[i]["height"]) == (256, 1)
        assert len(got[i]["feat"]) == 4
        assert got[i]["feat"][0] > 0            # rms of a sine > 0
    # codec-bound type keeps the deterministic oracled stand-in
    w, h, feat = _fake_decode(b"plain words")
    assert (got[10]["width"], got[10]["height"]) == (w, h)
    assert np.allclose(got[10]["feat"], feat)


def test_resize_images_real_bmp_path(spark):
    df, rows = _mixed_media_df(spark)
    got = {r["doc_id"]: r["resized_digest"]
           for r in resize_images(df, 5, 4).collect()}
    for i in range(6):
        want = hashlib.md5(encode_bmp(resize_rgb(
            decode_image(bytes(rows[i][1])), 5, 4))).hexdigest()
        assert got[i] == want
    # non-image types keep the digest stand-in the oracle pins
    assert got[10] == hashlib.md5(b"plain words" + b"5x4").hexdigest()
