"""Codec roundtrips (SURVEY.md §5.1 ≙ irkit test_varbyte; FIXTURES.md F4)."""

from __future__ import annotations

import numpy as np
import pytest

from irkit_spark.functions.codecs import (
    CODECS, decode_block, delta_decode, delta_encode, encode_blocks,
    svb_decode, svb_encode, varbyte_decode, varbyte_encode)

BOUNDARIES = [0, 127, 128, 16383, 16384, (1 << 32) - 1]
BOUNDARIES64 = BOUNDARIES + [1 << 32, (1 << 63) - 1, (1 << 64) - 1]


def arrays_32():
    rng = np.random.default_rng(42)
    yield np.empty(0, dtype=np.uint64)
    yield np.array([0], dtype=np.uint64)
    yield np.array(BOUNDARIES, dtype=np.uint64)
    for n in [1, 127, 128, 129, 1280]:
        yield rng.integers(0, 1 << 32, size=n).astype(np.uint64)
    yield np.zeros(100, dtype=np.uint64)


@pytest.mark.parametrize("codec", list(CODECS))
def test_roundtrip(codec):
    enc, dec = CODECS[codec]
    for arr in arrays_32():
        out = dec(enc(arr), arr.size)
        assert np.array_equal(out, arr), (codec, arr[:5], out[:5])


def test_varbyte_64bit():
    arr = np.array(BOUNDARIES64, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr), arr.size), arr)
    rng = np.random.default_rng(7)
    big = rng.integers(0, 1 << 62, size=500).astype(np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(big), 500), big)


def test_svb_rejects_64bit():
    with pytest.raises(OverflowError):
        svb_encode(np.array([1 << 32], dtype=np.uint64))


def test_svb_wire_format():
    # 4 values of sizes 1/2/3/4 bytes -> 1 control byte 0b11100100
    v = np.array([5, 300, 70000, 2 ** 25], dtype=np.uint64)
    raw = svb_encode(v)
    assert raw[0] == 0b11100100
    assert len(raw) == 1 + 1 + 2 + 3 + 4
    assert np.array_equal(svb_decode(raw, 4), v)


def test_varbyte_wire_format():
    # LEB128: 300 = 0b1_0101100 -> [0xAC, 0x02]
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"


def test_delta_gap():
    d = np.array([10, 11, 50, 51, 1000], dtype=np.uint64)
    g = delta_encode(d, 10)
    assert g[0] == 0
    assert np.array_equal(delta_decode(g, 10), d)


@pytest.mark.parametrize("codec", list(CODECS))
@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000])
def test_blocks_roundtrip(codec, n):
    rng = np.random.default_rng(n)
    docs = np.sort(rng.choice(10 ** 7, size=n, replace=False)) \
        .astype(np.uint64)
    tfs = rng.integers(1, 100, size=n).astype(np.uint64)
    norms = rng.random(n)
    blocks = encode_blocks(docs, tfs, norms, 128, codec)
    assert sum(b["n"] for b in blocks) == n
    dd, tt, pos = [], [], 0
    for b in blocks:
        d, t = decode_block(b, codec)
        assert b["first_doc"] == d[0] and b["last_doc"] == d[-1]
        assert b["max_score"] == pytest.approx(
            float(np.max(norms[pos:pos + b["n"]])), rel=1e-6)
        dd.append(d)
        tt.append(t)
        pos += b["n"]
    assert np.array_equal(np.concatenate(dd), docs)
    assert np.array_equal(np.concatenate(tt), tfs)


def test_blocks_docids_strictly_increasing():
    # FIXTURES.md F5 golden invariant
    rng = np.random.default_rng(3)
    docs = np.sort(rng.choice(10 ** 6, size=500, replace=False)) \
        .astype(np.uint64)
    blocks = encode_blocks(docs, np.ones(500, dtype=np.uint64),
                           np.ones(500), 128, "varbyte")
    prev = -1
    for b in blocks:
        d, _ = decode_block(b, "varbyte")
        assert (np.diff(d.astype(np.int64)) > 0).all()
        assert int(d[0]) > prev
        prev = int(d[-1])


def test_binpack_wire_format():
    from irkit_spark.functions.codecs import binpack_decode, binpack_encode

    # [5, 3, 7] -> width 3, bits LSB-first: 101 110 111 -> packed
    # little-endian bit order: bits 0..8 = 1,0,1,1,1,0,1,1,1
    raw = binpack_encode(np.array([5, 3, 7], dtype=np.uint64))
    assert raw[0] == 3 and len(raw) == 1 + 2      # 9 bits -> 2 bytes
    assert raw[1] == 0b11011101 and raw[2] == 0b00000001
    assert np.array_equal(binpack_decode(raw, 3),
                          np.array([5, 3, 7], dtype=np.uint64))
    # all-zeros stream packs at width 1
    z = binpack_encode(np.zeros(16, dtype=np.uint64))
    assert z[0] == 1 and len(z) == 1 + 2
    # dense gap stream: 128 gaps of 1 -> 1 + 16 bytes (vs 128 LEB128)
    ones = binpack_encode(np.ones(128, dtype=np.uint64))
    assert len(ones) == 1 + 16


def test_binpack_64bit_and_guards():
    from irkit_spark.functions.codecs import binpack_decode, binpack_encode

    arr = np.array(BOUNDARIES64, dtype=np.uint64)
    assert np.array_equal(binpack_decode(binpack_encode(arr), arr.size),
                          arr)
    big = np.array([np.uint64(2 ** 63 + 12345)], dtype=np.uint64)
    assert np.array_equal(binpack_decode(binpack_encode(big), 1), big)
    with pytest.raises(ValueError, match="bad width"):
        binpack_decode(b"\x00\x00", 1)
    assert binpack_encode(np.empty(0, dtype=np.uint64)) == b""
    assert binpack_decode(b"", 0).size == 0
