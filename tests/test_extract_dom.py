"""Opt-in "dom" extractor (VERDICT r4 "What's missing" #2): DOM-faithful
markup handling behind build_index(extractor="dom"), with the frozen
default untouched (golden byte-identity invariant lives in
test_extract_tokenize_score.py and may never change)."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from irkit_spark.functions.extract import (EXTRACTORS, extract_batch,
                                           extract_text, extract_text_dom)

# (html, frozen_output, dom_output) — the cases where the two forms
# AGREE have frozen==dom; the documented regex-vs-DOM edges differ.
CASES = [
    # agreement on ordinary markup
    (b"<html><head><title>Hi</title><script>var x=1<2;</script>"
     b"<style>a{}</style></head><body><!-- c --><p>Hello &amp; "
     b"world</p></body></html>", "Hi Hello & world", "Hi Hello & world"),
    (b"plain text no tags", "plain text no tags", "plain text no tags"),
    (b"<p>a&nbsp;b&#65;c</p>", "a bAc", "a bAc"),
    (b"<script>never closed", "", ""),
    (b"<style>p{} never closed", "", ""),
    (b"<!-- unterminated comment", "", ""),
    (b"\xff\xfebroken", "", ""),                      # invalid utf-8
    (None, "", ""),
    (b"", "", ""),
    (b'<a href="x<y">link</a>', "link", "link"),      # '<' in attr
    # regex-vs-DOM divergences (frozen column mirrors the frozen golden
    # suite; dom column is the DOM-faithful fix)
    (b'<a title="a>b">link</a>', 'b">link', "link"),  # '>' in attr
    (b"<noscript>enable js</noscript><p>body</p>",
     "enable js body", "body"),
    (b"<template><p>tpl</p></template>after", "tpl after", "after"),
    (b"<iframe>fallback text</iframe>rest", "fallback text rest", "rest"),
    (b"5 < 6 and 7 > 4", "5 4", "5 < 6 and 7 > 4"),   # bare '<' literal
    (b"unclosed < angle text", "unclosed < angle text",
     "unclosed < angle text"),
    # structured non-element markup dropped as units under dom
    (b"<!DOCTYPE html><p>x</p>", "x", "x"),
    (b'<?xml version="1.0"?>data', "data", "data"),
    (b"<![CDATA[ raw <b> not text ]]>after", "not text ]]>after",
     "after"),
    # raw-text element whose open tag hides '>' in an attribute (the
    # frozen script regex also spans to </script>, so both agree here)
    (b'<script type="a>b">code();</script>tail', "tail", "tail"),
    # case-insensitive raw-text close
    (b"<NOSCRIPT>x</NoScRiPt>y", "x y", "y"),
    # unterminated raw-text element drops to EOF
    (b"<noscript>to the end", "to the end", ""),
    # unknown element that merely PREFIXES a raw-text name is an
    # ordinary tag (lookahead requires \s / > after the name)
    (b"<scripty>kept</scripty>", "kept", "kept"),
]


def test_dom_golden():
    for html, _, want in CASES:
        assert extract_text_dom(html) == want, html


def test_frozen_column_matches_frozen_extractor():
    # the frozen column of CASES is itself pinned against the frozen
    # form, so the divergence table above stays honest
    for html, want, _ in CASES:
        assert extract_text(html) == want, html


def test_extract_batch_dom_matches_scalar():
    s = pd.Series([h for h, _, _ in CASES], dtype="object")
    assert list(extract_batch(s, "dom")) == [w for _, _, w in CASES]


def test_registry_and_unknown_name():
    assert set(EXTRACTORS) == {"frozen", "dom"}
    with pytest.raises(KeyError):
        extract_batch(pd.Series([b"x"], dtype="object"), "nope")


def test_dom_equals_frozen_on_fixture_corpus():
    """The synthetic pages template exercises none of the divergent
    edges, so a dom build over the fixtures tokenizes identically to a
    frozen build — which is why every existing oracle stays valid."""
    from irkit_spark.sources.pages import pages_pandas
    pdf = pages_pandas(300)
    for h in pdf["html"]:
        assert extract_text(h) == extract_text_dom(h)


def test_dom_linear_on_adversarial():
    """No catastrophic backtracking: every alternation branch consumes
    deterministically. 100k hostile chars must extract in well under a
    second (quadratic blowup would take minutes)."""
    hostiles = [
        b"<" * 100_000,                          # bare '<' runs
        b"<a " * 50_000,                          # unterminated tags
        b'<a x="' + b'"a" ' * 25_000,             # quote churn
        b"<script>" + b"x<y " * 25_000,           # unterminated raw text
        b"<!--" + b"-" * 100_000,                 # unterminated comment
    ]
    t0 = time.monotonic()
    for h in hostiles:
        extract_text_dom(h)
    assert time.monotonic() - t0 < 5.0


def test_dom_matches_stdlib_htmlparser_on_generated_html():
    """Property: on well-formed generated HTML, the dom extractor's
    TOKENIZED output (the semantics indexing actually consumes) equals
    a reference extractor built on stdlib html.parser.HTMLParser — an
    event-driven real HTML tokenizer with proper attribute handling.
    Exclusions by construction: unterminated quotes, bogus `<!` blobs,
    and markup inside attribute VALUES beyond '>' (both sides handle
    those, but whitespace joining differs legitimately)."""
    from html.parser import HTMLParser

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from irkit_spark.functions.tokenize import tokenize

    RAW = {"script", "style", "noscript", "template", "iframe"}

    class Ref(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts, self.skip = [], 0

        def handle_starttag(self, tag, attrs):
            if tag in RAW:
                self.skip += 1

        def handle_endtag(self, tag):
            if tag in RAW and self.skip:
                self.skip -= 1

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

    def ref_tokens(html: str) -> list[str]:
        p = Ref()
        p.feed(html)
        p.close()
        return tokenize(" ".join(p.parts))

    text = st.lists(st.sampled_from(
        ["hello", "world42", "5 < 6", "7 > 4", "a&amp;b", "x&#65;y",
         "café", "mixed CASE", "", "  "]), max_size=3).map(" ".join)
    attr = st.sampled_from(
        ["", ' class="a>b"', " id='q>r'", ' data-x="1<2"', " disabled"])
    name = st.sampled_from(["p", "div", "span", "b", "em", "li", "h1"])
    rawname = st.sampled_from(sorted(RAW))
    rawbody = st.sampled_from(
        ["var x = 1 < 2;", "p { color: red }", "fallback words", ""])

    def element(children):
        return st.tuples(name, attr, children).map(
            lambda t: f"<{t[0]}{t[1]}>{t[2]}</{t[0]}>")

    leaf = st.one_of(
        text,
        st.tuples(rawname, rawbody).map(
            lambda t: f"<{t[0]}>{t[1]}</{t[0]}>"),
        st.sampled_from(["<!-- a comment -->", "<!DOCTYPE html>"]),
    )
    node = st.recursive(leaf, lambda kids: st.one_of(
        element(st.lists(kids, max_size=3).map(" ".join)), kids),
        max_leaves=8)
    doc = st.lists(node, max_size=4).map(" ".join)

    @settings(max_examples=200, deadline=None)
    @given(doc)
    def check(html):
        assert tokenize(extract_text_dom(html.encode())) == \
            ref_tokens(html), html

    check()


def test_build_with_dom_extractor_end_to_end(spark, tmp_path):
    """build_index(extractor='dom') records the knob in stats, indexes
    the dom-extracted text, and queries work; a doc whose dom text
    differs from frozen ranks accordingly."""
    import pyspark.sql.functions as F

    from irkit_spark.operators.build import build_index
    from irkit_spark.operators.query import Index, search
    from irkit_spark.sources.catalog import read_artifact
    from irkit_spark.sources.pages import pages_df

    pages = pages_df(spark, 120)
    # plant one page where the two extractors disagree: frozen keeps
    # the noscript content, dom drops it
    planted = spark.createDataFrame(
        [("http://planted/0", None,
          bytearray(b"<noscript>zzzunique zzzunique</noscript>"
                    b"<p>visible words</p>"), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    pages = pages.select("url", "warc_ts", "html", "text", "lang") \
                 .unionByName(planted)

    out = str(tmp_path / "idx_dom")
    build_index(spark, pages, out, docs_per_shard=64,
                text_from_html=True, extractor="dom")
    st = read_artifact(spark, out, "stats").collect()[0]
    assert st["extractor"] == "dom"
    idx = Index(spark, out)
    # the dom-built lexicon must not contain the noscript-only term
    terms = read_artifact(spark, out, "terms")
    assert terms.filter(F.col("term") == "zzzunique").count() == 0
    assert terms.filter(F.col("term") == "visible").count() == 1
    rows = search(idx, "visible words", k=5).collect()
    assert len(rows) >= 1

    # frozen build over the same pages DOES index the noscript term
    out_f = str(tmp_path / "idx_frozen")
    build_index(spark, pages, out_f, docs_per_shard=64,
                text_from_html=True)
    st_f = read_artifact(spark, out_f, "stats").collect()[0]
    assert st_f["extractor"] == "frozen"
    terms_f = read_artifact(spark, out_f, "terms")
    assert terms_f.filter(F.col("term") == "zzzunique").count() == 1

    # merge refuses to mix extractors (same-url text would diverge)
    from irkit_spark.operators.merge import merge_indexes
    with pytest.raises(ValueError, match="different layouts"):
        merge_indexes(spark, [out, out_f], str(tmp_path / "m"))


def test_build_unknown_extractor_fails_fast(spark, tmp_path):
    from irkit_spark.operators.build import build_index
    from irkit_spark.sources.pages import pages_df
    with pytest.raises(ValueError, match="unknown extractor"):
        build_index(spark, pages_df(spark, 10),
                    str(tmp_path / "x"), extractor="gumbo")
