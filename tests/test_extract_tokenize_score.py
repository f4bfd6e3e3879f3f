"""Extraction golden files, frozen tokenizer, scoring kernel
(SURVEY.md §5.2/5.3 ≙ irkit test_warc/test_score)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from irkit_spark.config import BM25_B, BM25_K1
from irkit_spark.functions.extract import extract_batch, extract_text
from irkit_spark.functions.scoring import bm25, idf
from irkit_spark.functions.tokenize import tokenize, tokenize_count_iter

# Frozen golden pairs — these may NEVER change (byte-identical
# extraction invariant, BASELINE.json:15).
GOLDEN = [
    (b"<html><head><title>Hi</title><script>var x=1<2;</script>"
     b"<style>a{}</style></head><body><!-- c --><p>Hello &amp; "
     b"world</p></body></html>", "Hi Hello & world"),
    (b"\xff\xfebroken", ""),                        # parse failure
    (b"<html><body></body></html>", ""),            # empty body
    (b"plain text no tags", "plain text no tags"),
    (b"<p>a&nbsp;b&#65;c</p>", "a bAc"),   # entities; nbsp collapses (\s)
    (b"<script>never closed", ""),                  # unterminated script
    (b"<p>one</p>\n\n\t <p>two</p>", "one two"),    # whitespace collapse
    (None, ""),
]


def test_extract_golden():
    for html, want in GOLDEN:
        assert extract_text(html) == want


def test_extract_batch_matches_scalar():
    s = pd.Series([h for h, _ in GOLDEN], dtype="object")
    out = extract_batch(s)
    assert list(out) == [w for _, w in GOLDEN]


def test_tokenizer_frozen():
    assert tokenize("Hello, World42 foo-bar") == \
        ["hello", "world42", "foo", "bar"]
    assert tokenize("") == []
    assert tokenize("  \t\n ") == []
    assert tokenize("ÄÖÜ") == []          # non-ascii -> no [a-z0-9] runs
    assert tokenize("a1b2") == ["a1b2"]


def test_tokenize_count_iter():
    pdf = pd.DataFrame({"doc_id": [0, 1, 2],
                        "text": ["a b a", "", "B b c"]})
    out = pd.concat(list(tokenize_count_iter(iter([pdf]))),
                    ignore_index=True)
    got = {(r.doc_id, r.term): (r.tf, r.dl) for r in out.itertuples()}
    assert got == {(0, "a"): (2, 3), (0, "b"): (1, 3),
                   (2, "b"): (2, 3), (2, "c"): (1, 3)}


def test_bm25_matches_scalar_reference():
    rng = np.random.default_rng(1)
    n_docs, avgdl = 1000.0, 50.0
    tf = rng.integers(1, 20, 100)
    df = rng.integers(1, 900, 100)
    dl = rng.integers(1, 200, 100)
    vec = bm25(tf, df, dl, n_docs, avgdl)
    for i in range(100):
        # scalar reimplementation, same op order
        want = math.log1p((n_docs - df[i] + 0.5) / (df[i] + 0.5)) * (
            tf[i] / (tf[i] + BM25_K1 * (1.0 - BM25_B
                                        + BM25_B * dl[i] / avgdl)))
        # numpy vectorized vs CPython scalar can differ by 1 ulp
        assert vec[i] == pytest.approx(want, rel=1e-14)


def test_idf_positive_and_monotone():
    n = 10_000.0
    dfs = np.array([1, 10, 100, 1000, 9999])
    v = idf(dfs, n)
    assert (v > 0).all()
    assert (np.diff(v) < 0).all()
