"""Distributed BPE merge learning (pipeline/bpe.py): classic-reference
parity (independent Sennrich-style implementation), driver==distributed
path identity, encoder losslessness."""

from __future__ import annotations

import collections
import re

import pytest

from irkit_spark.config import TOKEN_RE
from irkit_spark.pipeline.bpe import (bpe_segment, learn_bpe,
                                      pair_counts, word_types)

_TOK = re.compile(TOKEN_RE)


def _reference_bpe(texts, n_merges):
    """The classic Sennrich space-joined-string implementation —
    independent of the module's list-based code paths."""
    vocab = collections.Counter()
    for t in texts:
        for w in _TOK.findall(t.lower()):
            vocab[" ".join(w)] += 1
    merges = []
    for step in range(n_merges):
        pairs = collections.Counter()
        for w, c in vocab.items():
            syms = w.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, n))
        pat = re.compile(
            r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)")
        vocab = collections.Counter(
            {pat.sub(a + b, w): c for w, c in vocab.items()})
    return merges


@pytest.fixture(scope="module")
def corpus(spark):
    texts = ["low low low low low lower lower lowest",
             "newest newest newest widest widest wide",
             "hug hugs hugged hugging pug pugs"]
    rows = [(i, t) for i, t in enumerate(texts)]
    return texts, spark.createDataFrame(rows, "doc_id long, text string")


def test_learn_matches_reference(corpus):
    texts, docs = corpus
    want = _reference_bpe(texts, 12)
    got = [(r.step, r.lhs, r.rhs, r.merged, r.n)
           for r in learn_bpe(docs, 12).orderBy("step").collect()]
    assert got == want


def test_driver_equals_distributed(corpus):
    texts, docs = corpus
    drv = [(r.step, r.lhs, r.rhs, r.merged, r.n)
           for r in learn_bpe(docs, 8).orderBy("step").collect()]
    dist = [(r.step, r.lhs, r.rhs, r.merged, r.n)
            for r in learn_bpe(docs, 8, collect_max=0)
            .orderBy("step").collect()]
    assert drv == dist == _reference_bpe(texts, 8)


def test_pair_counts_declarative(corpus, spark):
    _, docs = corpus
    got = {(r.lhs, r.rhs): r.n
           for r in pair_counts(word_types(docs)).collect()}
    # 'lo' pair: low x5 + lower x2 + lowest = 8 word occurrences
    assert got[("l", "o")] == 8
    # single-char words contribute nothing
    one = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    assert pair_counts(word_types(one)).count() == 0


def test_merges_stop_when_exhausted(spark):
    docs = spark.createDataFrame([(0, "ab ab ab")],
                                 "doc_id long, text string")
    out = learn_bpe(docs, 10).collect()
    assert len(out) == 1                     # only (a,b) exists
    assert (out[0].lhs, out[0].rhs, out[0].n) == ("a", "b", 3)


def test_segment_lossless_and_greedy(corpus):
    texts, docs = corpus
    merges = learn_bpe(docs, 12).orderBy("step").collect()
    seg = {r.doc_id: r for r in bpe_segment(docs, merges).collect()}
    for i, t in enumerate(texts):
        words = _TOK.findall(t.lower())
        r = seg[i]
        assert r.n_words == len(words)
        # losslessness: pieces concatenate back to the word stream
        assert r.pieces.replace(" ", "") == "".join(words)
        assert r.n_pieces <= sum(len(w) for w in words)
    # a word fully merged by the table becomes ONE piece
    assert "low" in seg[0].pieces.split(" ")


def test_rejects_bad_n(corpus):
    _, docs = corpus
    with pytest.raises(ValueError):
        learn_bpe(docs, 0)


def test_segment_accepts_pair_lists(corpus):
    """merges as plain 2-element lists/tuples (the docstring's
    'list of (lhs, rhs)') — regression for the r6-advice IndexError
    on list input."""
    _, docs = corpus
    as_rows = learn_bpe(docs, 6).orderBy("step").collect()
    as_lists = [[r["lhs"], r["rhs"]] for r in as_rows]
    as_tuples = [(r["lhs"], r["rhs"]) for r in as_rows]
    a = {r.doc_id: r.pieces for r in bpe_segment(docs, as_rows).collect()}
    b = {r.doc_id: r.pieces for r in bpe_segment(docs, as_lists).collect()}
    c = {r.doc_id: r.pieces for r in bpe_segment(docs, as_tuples).collect()}
    assert a == b == c
