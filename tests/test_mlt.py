"""More-like-this (operators/mlt.py): mined terms == brute-force
tf*idf selection, query == manual search over the mined terms with the
source doc excluded, local==distributed, guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from irkit_spark.functions.scoring import idf as idf_fn
from irkit_spark.functions.tokenize import tokenize
from irkit_spark.operators.mlt import mlt_search, mlt_terms
from irkit_spark.operators.query import search


@pytest.fixture(scope="module")
def docs_txt(index_small, pages_small):
    idx, _ = index_small
    return (idx.docs.select("doc_id", "url")
            .join(pages_small.select("url", "text"), "url")
            .select("doc_id", "text"))


def test_mined_terms_match_reference(index_small, docs_txt):
    idx, _ = index_small
    doc_id = 7
    text = docs_txt.filter(F.col("doc_id") == doc_id) \
        .collect()[0]["text"]
    from collections import Counter
    cnt = Counter(tokenize(text))
    scored = []
    for t, c in cnt.items():
        st = idx.term_stats(t)
        if st:
            w = float(c * idf_fn(np.array([st["df"]]), idx.n_docs)[0])
            scored.append((-w, t))
    want = [t for _, t in sorted(scored)[:5]]
    assert mlt_terms(idx, doc_id, docs_txt, max_terms=5) == want
    # min_tf guard prunes the candidate pool before ranking
    want2 = [t for w, t in sorted(scored) if cnt[t] >= 2][:5]
    assert mlt_terms(idx, doc_id, docs_txt, max_terms=5,
                     min_tf=2) == want2


def test_mlt_equals_manual_search_minus_self(index_small, docs_txt):
    idx, _ = index_small
    doc_id = 7
    terms = mlt_terms(idx, doc_id, docs_txt, max_terms=5)
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           mlt_search(idx, doc_id, docs_txt, k=10, max_terms=5,
                      local=False).collect()]
    manual = [(r["doc_id"], round(r["score"], 9)) for r in
              search(idx, " ".join(terms), k=11, local=False).collect()
              if r["doc_id"] != doc_id][:10]
    # tf*idf mining favors rare terms, so the result set can be
    # smaller than k — identity and self-exclusion are the contract
    assert got == manual and got
    assert all(d != doc_id for d, _ in got)


def test_mlt_local_matches_distributed(index_small, docs_txt):
    idx, _ = index_small
    a = [(r["doc_id"], r["score"]) for r in
         mlt_search(idx, 3, docs_txt, k=10, max_terms=5,
                    local=True).collect()]
    b = [(r["doc_id"], r["score"]) for r in
         mlt_search(idx, 3, docs_txt, k=10, max_terms=5,
                    local=False).collect()]
    assert a == b and a


def test_mlt_guards(index_small, docs_txt):
    idx, _ = index_small
    with pytest.raises(ValueError, match="not found"):
        mlt_terms(idx, 10 ** 9, docs_txt)
    with pytest.raises(ValueError, match="must be >= 1"):
        mlt_terms(idx, 7, docs_txt, max_terms=0)
    with pytest.raises(ValueError, match="must be >= 1"):
        mlt_terms(idx, 7, docs_txt, min_tf=0)
