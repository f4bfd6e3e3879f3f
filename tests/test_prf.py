"""Pseudo-relevance feedback (operators/prf.py): the expansion is
reproduced independently in the test from the raw corpus (same
feedback set, same integer-tf ranking, same weights), and prf_search
must equal the weighted search over it — across modes; plus
fallbacks and guards."""

from __future__ import annotations

from collections import Counter

import pytest

from irkit_spark.functions.tokenize import tokenize
from irkit_spark.operators.build import build_index
from irkit_spark.operators.prf import expand_query, prf_search
from irkit_spark.operators.query import Index, search

VOCAB = ["red", "fox", "dog", "lazy", "jumps", "quick", "brown",
         "river", "stone", "cloud"]
DOCS = [(d, " ".join(VOCAB[(d * 7 + j * j + (j // 3)) % len(VOCAB)]
                     for j in range(5 + (d * 13) % 40)))
        for d in range(80)]


@pytest.fixture(scope="module")
def pr(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prf") / "idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, out, docs_per_shard=25, doc_id_col="doc_id",
                key_col="doc_id", n_parts=4)
    return Index(spark, out), df


def _hits(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def _manual_expansion(idx, q, fb_docs, fb_terms, beta):
    ids = [r["doc_id"] for r in
           search(idx, q, k=fb_docs, mode="wand").collect()]
    qt = set(tokenize(q))
    cnt = Counter(t for d, txt in DOCS if d in set(ids)
                  for t in tokenize(txt) if t not in qt)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    return {t: beta * c / top[0][1] for t, c in top}


def test_expansion_matches_manual(pr):
    idx, df = pr
    q = "red fox"
    exp, w = expand_query(idx, q, df, fb_docs=6, fb_terms=4, beta=0.5)
    want = _manual_expansion(idx, q, 6, 4, 0.5)
    assert w == want
    assert exp.split()[:2] == ["red", "fox"]
    assert set(exp.split()[2:]) == set(want)
    assert all(t not in ("red", "fox") for t in w)
    assert max(w.values()) == 0.5        # top expansion term

def test_prf_equals_weighted_search(pr):
    idx, df = pr
    q = "lazy dog"
    w = _manual_expansion(idx, q, 8, 5, 0.5)
    want = _hits(search(idx, q + " " + " ".join(sorted(w)), k=15,
                        local=False, boosts=w))
    got = _hits(prf_search(idx, q, df, k=15, fb_docs=8, fb_terms=5,
                           local=False))
    assert got == want and got


def test_prf_modes_agree_and_changes_ranking(pr):
    idx, df = pr
    q = "river stone"
    a = _hits(prf_search(idx, q, df, k=15, mode="wand", local=False))
    b = _hits(prf_search(idx, q, df, k=15, mode="daat", local=False))
    assert a == b and a
    plain = _hits(search(idx, q, k=15, local=False))
    assert a != plain                     # expansion actually matters


def test_prf_oov_falls_back_empty(pr):
    idx, df = pr
    assert prf_search(idx, "zzz qqq", df, k=10).count() == 0


def test_prf_guards(pr):
    idx, df = pr
    with pytest.raises(ValueError, match="unboosted"):
        prf_search(idx, "red^2 fox", df)
    with pytest.raises(ValueError, match=">= 1"):
        prf_search(idx, "red", df, fb_docs=0)
    with pytest.raises(ValueError, match="beta"):
        prf_search(idx, "red", df, beta=0)
