"""Snippet / best-window generation (operators/snippets.py):
brute-force identity of the window algebra on a deterministic corpus
spanning several shards, snippet-text reconstruction, tie-break rules,
hit reuse, and guard rails (no positions, OOV, bad window)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from irkit_spark.functions.tokenize import tokenize
from irkit_spark.operators.build import build_index
from irkit_spark.operators.positions import build_positions
from irkit_spark.operators.query import Index, search
from irkit_spark.operators.snippets import snippet_spans, snippets

# Deterministic corpus: vocabulary engineered so query terms co-occur
# at varying distances — windows must trade off distinct-term coverage
# against occurrence counts and the earliest-start tie-break.
VOCAB = ["red", "fox", "dog", "lazy", "jumps", "quick", "brown",
         "river", "stone", "cloud"]


def _mk_docs(n: int) -> list[tuple[int, str]]:
    docs = []
    for d in range(n):
        toks = [VOCAB[(d * 7 + j * j + (j // 3)) % len(VOCAB)]
                for j in range(5 + (d * 13) % 40)]
        docs.append((d, " ".join(toks)))
    return docs


DOCS = _mk_docs(60)


def brute_best_window(toks: list[str], qterms: list[str], window: int):
    """Reference: candidate windows start at query-term occurrences;
    best = (max distinct, then max occurrences, then smallest start)."""
    qset = set(qterms)
    occ = [(i, w) for i, w in enumerate(toks) if w in qset]
    best = None
    for s, _ in occ:
        hits = [(i, w) for i, w in occ if s <= i < s + window]
        key = (-len({w for _, w in hits}), -len(hits), s)
        if best is None or key < best[0]:
            best = (key, (s, len({w for _, w in hits}), len(hits)))
    return best[1] if best else None


def brute_spans(docs, query: str, hits, window: int):
    qterms = tokenize(query)
    out = []
    for did, score in hits:
        got = brute_best_window(tokenize(dict(docs)[did]), qterms,
                                window)
        assert got is not None, "every BM25 hit has an occurrence"
        out.append((did, got[0], got[1], got[2], score))
    out.sort(key=lambda x: (-x[4], x[0]))
    return out


@pytest.fixture(scope="module")
def snip_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snipidx") / "idx")
    shutil.rmtree(out, ignore_errors=True)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, out, docs_per_shard=20, doc_id_col="doc_id",
                key_col="doc_id", n_parts=4)
    build_positions(spark, df, out, doc_id_col="doc_id", n_parts=4)
    return Index(spark, out), df


def _hits(idx, query, k):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in search(idx, query, k=k, mode="wand").collect()]


@pytest.mark.parametrize("query,window", [
    ("red fox", 3),          # tight window: distinct-vs-count tradeoff
    ("red fox", 8),
    ("lazy dog jumps", 5),   # 3 terms, mid window
    ("river stone", 4),
    ("quick brown cloud", 30),  # window >= doc length for short docs
    ("red", 1),              # degenerate: single term, width 1
])
def test_spans_match_bruteforce(snip_index, query, window):
    idx, _ = snip_index
    hits = _hits(idx, query, 10)
    got = [(r["doc_id"], r["win_start"], r["n_distinct"], r["n_occ"],
            round(r["score"], 9))
           for r in snippet_spans(idx, query, k=10,
                                  window=window).collect()]
    assert got == brute_spans(DOCS, query, hits, window)


def test_snippet_text_is_window_tokens(snip_index):
    idx, df = snip_index
    window = 6
    rows = snippets(idx, "red fox lazy", df, k=10,
                    window=window).collect()
    assert len(rows) == 10
    toks_by_id = {d: tokenize(t) for d, t in DOCS}
    for r in rows:
        t = toks_by_id[r["doc_id"]]
        s = int(r["win_start"])
        assert r["snippet"] == " ".join(t[s:s + window])
        # the window really contains a query term at its start
        assert t[s] in {"red", "fox", "lazy"}


def test_spans_ordered_by_ranking(snip_index):
    idx, _ = snip_index
    rows = snippet_spans(idx, "red fox", k=10, window=5).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert {r["doc_id"] for r in rows} == \
        {d for d, _ in _hits(idx, "red fox", 10)}


def test_precomputed_hits_reused(snip_index):
    idx, _ = snip_index
    hits = _hits(idx, "lazy dog", 5)
    a = [tuple(r) for r in snippet_spans(idx, "lazy dog", k=5,
                                         window=4).collect()]
    b = [tuple(r) for r in
         snippet_spans(idx, "lazy dog", k=5, window=4,
                       hits=[(d, s) for d, s in hits]).collect()]
    assert [x[:4] for x in a] == [x[:4] for x in b]


def test_guard_rails(snip_index, spark, tmp_path):
    idx, df = snip_index
    assert snippet_spans(idx, "", k=5).count() == 0
    assert snippet_spans(idx, "zzznotindexed", k=5).count() == 0
    with pytest.raises(ValueError, match="window"):
        snippet_spans(idx, "red", k=5, window=0)
    bare = str(tmp_path / "bare")
    shutil.copytree(idx.path, bare)
    shutil.rmtree(bare + "/positions")
    with pytest.raises(ValueError, match="positions"):
        snippet_spans(Index(spark, bare), "red", k=5)


def test_snippets_on_pages_corpus(spark, pos_index_pages):
    """url-join corpus: spans agree with a recomputed reference over
    the extracted text (the same rows the index tokenized)."""
    idx, src = pos_index_pages
    rows = src.collect()
    by_id = {idx.doc(r["url"])["doc_id"]: r["text"] for r in rows}
    q = " ".join(tokenize(rows[0]["text"])[:2])
    window = 12
    got = snippet_spans(idx, q, k=8, window=window).collect()
    assert got
    qt = tokenize(q)
    for r in got:
        want = brute_best_window(tokenize(by_id[r["doc_id"]]), qt,
                                 window)
        assert (r["win_start"], r["n_distinct"], r["n_occ"]) == want
