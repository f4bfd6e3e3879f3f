"""Faceting (operators/facets.py) + autocomplete (operators/query.py):
counts vs brute-force references over the tokenized corpus, conjunctive
and NOT variants, OOV behavior, dict-vs-scan parity, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irkit_spark.functions.tokenize import tokenize
from irkit_spark.operators.facets import facet_counts
from irkit_spark.operators.query import Index, autocomplete


@pytest.fixture(scope="module")
def corpus(index_small, pages_small):
    idx, _ = index_small
    rows = (idx.docs.select("doc_id", "url")
            .join(pages_small.select("url", "text", "lang"), "url")
            .collect())
    return idx, [(r["doc_id"], r["text"], r["lang"]) for r in rows]


def _ref_counts(rows, terms, conjunctive=False, exclude=()):
    counts = {}
    ts, ex = set(terms), set(exclude)
    for doc_id, text, lang in rows:
        toks = set(tokenize(text or ""))
        hit = ts <= toks if conjunctive else bool(ts & toks)
        if hit and not (ex & toks):
            counts[lang] = counts.get(lang, 0) + 1
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def test_facet_counts_matches_reference(corpus, pages_small):
    idx, rows = corpus
    docs_df = (idx.docs.select("doc_id", "url")
               .join(pages_small.select("url", "lang"), "url"))
    q = "term00000 term00003"
    got = [(r["facet"], r["n_docs"]) for r in
           facet_counts(idx, q, docs_df, "lang").collect()]
    assert got == _ref_counts(rows, q.split()) and got
    got_c = [(r["facet"], r["n_docs"]) for r in
             facet_counts(idx, q, docs_df, "lang",
                          conjunctive=True).collect()]
    assert got_c == _ref_counts(rows, q.split(), conjunctive=True)
    got_n = [(r["facet"], r["n_docs"]) for r in
             facet_counts(idx, q, docs_df, "lang",
                          exclude_terms="term00007").collect()]
    assert got_n == _ref_counts(rows, q.split(),
                                exclude=["term00007"])
    assert facet_counts(idx, "zzznotaterm", docs_df, "lang").count() == 0


def test_autocomplete(corpus):
    idx, _ = corpus
    td = idx._terms_dict()
    want = sorted(((t, v[1]) for t, v in td.items()
                   if t.startswith("term0000")),
                  key=lambda h: (-h[1], h[0]))[:5]
    got = [(r["term"], r["df"]) for r in
           autocomplete(idx, "term0000", n=5).collect()]
    assert got == [(t, int(c)) for t, c in want] and len(got) == 5
    # distributed terms-scan branch agrees
    idx2 = Index(idx.spark, idx.path)
    idx2._terms_dict = lambda: None
    got2 = [(r["term"], r["df"]) for r in
            autocomplete(idx2, "term0000", n=5).collect()]
    assert got2 == got
    assert autocomplete(idx, "zzz").count() == 0
    with pytest.raises(ValueError, match="bad prefix"):
        autocomplete(idx, "no spaces")
    with pytest.raises(ValueError, match="n must be"):
        autocomplete(idx, "term", n=0)


def test_facet_counts_honor_tombstones(spark, pages_small, tmp_path,
                                       corpus):
    """Deleted docs leave the facet counts (selection-only, the same
    contract every query path honors)."""
    import shutil

    from irkit_spark.operators.build import build_index
    from irkit_spark.operators.delete import delete_docs

    idx0, rows = corpus
    out = str(tmp_path / "fidx")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, pages_small, out, docs_per_shard=300,
                text_from_html=True)
    idx = Index(spark, out)
    docs_df = (idx.docs.select("doc_id", "url")
               .join(pages_small.select("url", "lang"), "url"))
    q = "term00000 term00003"
    before = {r["facet"]: r["n_docs"] for r in
              facet_counts(idx, q, docs_df, "lang").collect()}
    # tombstone half the match set
    from irkit_spark.operators.facets import _match_docs
    qmeta = idx.lookup_query(q)
    matched = sorted(r["doc_id"] for r in _match_docs(
        idx, [m["term_id"] for m in qmeta], False).collect())
    dead = matched[::2]
    delete_docs(spark, out, doc_ids=dead)
    idx2 = Index(spark, out)
    after = {r["facet"]: r["n_docs"] for r in
             facet_counts(idx2, q, docs_df, "lang").collect()}
    assert sum(after.values()) == sum(before.values()) - len(dead)
    # reference: recount the survivors' languages
    lang_of = {r["doc_id"]: r["lang"] for r in docs_df.collect()}
    want = {}
    for d in matched:
        if d not in set(dead):
            want[lang_of[d]] = want.get(lang_of[d], 0) + 1
    assert after == want


def test_facet_ranges_matches_reference(corpus, index_small):
    """Numeric-range facets: bucketed doc_len histogram of the match
    set vs a brute-force reference over the tokenized corpus."""
    from irkit_spark.operators.facets import facet_ranges
    idx, rows = corpus
    bounds = [20.0, 40.0]
    q = "term00000"
    docs_df = idx.docs.select("doc_id", "doc_len")
    got = [(r["bucket"], r["lo"], r["hi"], r["n_docs"]) for r in
           facet_ranges(idx, q, docs_df, "doc_len", bounds).collect()]
    # reference: docs containing the term, bucketed by their doc_len
    from irkit_spark.functions.tokenize import tokenize as tok
    dl = {r["doc_id"]: r["doc_len"] for r in docs_df.collect()}
    ref = {}
    for doc_id, text, _ in rows:
        if "term00000" in set(tok(text or "")):
            b = sum(1 for x in bounds if dl[doc_id] >= x)
            ref[b] = ref.get(b, 0) + 1
    lows = [float("-inf")] + bounds
    highs = bounds + [float("inf")]
    want = sorted((b, lows[b], highs[b], n) for b, n in ref.items())
    assert got == want and got


def test_facet_ranges_guards(corpus):
    from irkit_spark.operators.facets import facet_ranges
    idx, _ = corpus
    docs_df = idx.docs.select("doc_id", "doc_len")
    with pytest.raises(ValueError, match="increasing"):
        facet_ranges(idx, "term00000", docs_df, "doc_len", [5.0, 5.0])
    with pytest.raises(ValueError, match="boundary"):
        facet_ranges(idx, "term00000", docs_df, "doc_len", [])
    # OOV query -> empty frame with the right schema
    out = facet_ranges(idx, "zzzoov", docs_df, "doc_len", [10.0])
    assert out.count() == 0 and out.columns == ["bucket", "lo", "hi",
                                                "n_docs"]
