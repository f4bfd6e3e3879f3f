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
    # regex-vs-DOM fidelity edges (VERDICT r4 item 6) — frozen, not
    # "right": documents exactly where the regex machine diverges from
    # a DOM walk (see functions/extract.py module docstring)
    (b'<a href="x<y">link</a>', "link"),            # '<' in attr: fine
    (b'<a title="a>b">link</a>', 'b">link'),        # '>' in attr: leaks
    (b"<noscript>enable js</noscript><p>body</p>",
     "enable js body"),                             # noscript kept
    (b"<template><p>tpl</p></template>after", "tpl after"),
    (b"5 < 6 and 7 > 4", "5 4"),                    # bare <..> stripped
    (b"unclosed < angle text", "unclosed < angle text"),  # no '>': kept
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


def test_canonicalize_iter_matches_scalar():
    """The fused canonicalize kernel must be byte-identical to the
    scalar form (extract_text -> lower -> findall -> join) on every
    input class: plain ASCII, entities, unterminated blocks, non-ASCII
    text, python-only case foldings (Kelvin sign), unicode whitespace
    inside closing tags, invalid UTF-8, None."""
    import pandas as pd

    from irkit_spark.functions.extract import extract_text
    from irkit_spark.functions.tokenize import _TOKEN, canonicalize_iter

    def canonicalize_series(series, from_html):
        out = []
        pdf = pd.DataFrame({"doc_id": range(len(series)), "text": series})
        for r in canonicalize_iter(iter([pdf]), "doc_id", "text",
                                   from_html=from_html):
            out.extend(r["text"].tolist())
        return out
    cases = [
        b"<html><body>Hello World 123</body></html>",
        b"<p>a&amp;b &lt;script&gt; c&#65;d &nbsp;e</p>",
        b"<script>var x = 1 < 2;</script>text<style>p{}</style>",
        b"<SCRIPT a=b>drop</ScRiPt >keep<!-- gone -->tail",
        b"<script>unterminated to eof",
        b"<!-- unterminated comment",
        "café <b>naïve</b> straße".encode(),
        "kelvin K sign &#8490; entity".encode(),
        "</script > funny close <script>x</script >y".encode(),
        "<scripté>unicode word-char after script tag</script>".encode(),
        b"\xff\xfe invalid utf8",
        None,
        b"",
        b"  only   spaces \t\n ",
        b"MiXeD CaSe 42 Tokens-and_more",
        "tab\x1cseparated\x1ffile".encode(),
    ]
    want = [" ".join(_TOKEN.findall(extract_text(b).lower()))
            for b in cases]
    got = canonicalize_series(pd.Series(cases, dtype="object"), True)
    assert got == want
    # text-mode (from_html=False) parity incl. non-string rows
    tcases = ["Plain Text 1", "kKelvin", None, "", "a&amp;b"]
    want_t = [" ".join(_TOKEN.findall(t.lower()))
              if isinstance(t, str) else "" for t in tcases]
    got_t = canonicalize_series(pd.Series(tcases, dtype="object"), False)
    assert got_t == want_t
