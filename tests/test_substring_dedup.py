"""Exact-substring duplicate-span removal (pipeline/substring.py) —
the Lee et al. 2022 ExactSubstr analog. Brute-force parity plus the
edge semantics the docstring freezes."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE
from irkit_spark.pipeline.substring import (
    dedup_substrings, duplicate_anchors, gram_occurrences)

_TOK = re.compile(TOKEN_RE)


def _brute(rows, n):
    """Reference implementation: literal n-gram tuples, corpus-order
    first occurrence, coverage by any later occurrence."""
    toks = {d: _TOK.findall(t.lower()) for d, t in rows}
    seen = {}
    covered = {d: set() for d, _ in rows}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(len(ts) - n + 1):
            g = tuple(ts[p:p + n])
            if g in seen:
                covered[d].update(range(p, p + n))
            else:
                seen[g] = (d, p)
    out = {}
    for d, ts in toks.items():
        kept = [t for i, t in enumerate(ts) if i not in covered[d]]
        out[d] = (" ".join(kept), len(covered[d]))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "intro text the quick brown fox jumps over the lazy dog outro"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "short doc"),
        (4, "repeat span here repeat span here repeat span here"),
        (5, "unique content with no overlap whatsoever in this row"),
        (6, ""),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("n", [3, 5])
def test_matches_bruteforce(corpus, n):
    rows, docs = corpus
    got = {r.doc_id: (r.text, r.n_removed)
           for r in dedup_substrings(docs, n=n).collect()}
    assert got == _brute(rows, n)


def test_first_occurrence_survives_later_cut(corpus):
    rows, docs = corpus
    got = {r.doc_id: (r.text, r.n_removed)
           for r in dedup_substrings(docs, n=4).collect()}
    # doc 0 owns the 9-token span: untouched
    assert got[0] == (rows[0][1], 0)
    # doc 1 loses exactly the repeated 9 tokens, keeps its frame
    assert got[1] == ("intro text outro", 9)
    # doc 2 is entirely the repeated span
    assert got[2] == ("", 9)
    # short docs (< n tokens) and empty docs pass through
    assert got[3] == ("short doc", 0)
    assert got[6] == ("", 0)


def test_in_doc_repeats_cut_after_first(spark):
    docs = spark.createDataFrame(
        [(0, "a b c a b c a b c")], "doc_id long, text string")
    got = dedup_substrings(docs, n=3).collect()[0]
    assert (got.text, got.n_removed) == ("a b c", 6)


def test_anchor_and_occurrence_counts(corpus):
    _, docs = corpus
    occ = gram_occurrences(docs, 4)
    # every doc with >= 4 tokens contributes len - 3 occurrences
    per_doc = {r.doc_id: r.c for r in
               occ.groupBy("doc_id").agg(F.count("*").alias("c")).collect()}
    assert per_doc[0] == 10 - 3 and per_doc[2] == 9 - 3
    assert 3 not in per_doc and 6 not in per_doc
    # doc 2's 6 grams all duplicate doc 0's; doc 0 has none
    anch = duplicate_anchors(docs, 4)
    per_doc_a = {r.doc_id: r.c for r in
                 anch.groupBy("doc_id").agg(F.count("*").alias("c")).collect()}
    assert per_doc_a[2] == 6 and 0 not in per_doc_a


def test_extra_columns_preserved(spark):
    docs = spark.createDataFrame(
        [(0, "en", "x y z w"), (1, "fr", "x y z w")],
        "doc_id long, lang string, text string")
    got = {r.doc_id: (r.lang, r.text, r.n_removed)
           for r in dedup_substrings(docs, n=4).collect()}
    assert got[0] == ("en", "x y z w", 0)
    assert got[1] == ("fr", "", 4)


def test_rejects_bad_n(corpus):
    _, docs = corpus
    with pytest.raises(ValueError):
        gram_occurrences(docs, 0)
