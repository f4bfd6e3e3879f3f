"""Property tests (hypothesis) for the sub-document dedup family:
dedup_substrings and dedup_paragraphs against brute-force references
on randomized small corpora with heavy repetition pressure."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from irkit_spark.config import TOKEN_RE
from irkit_spark.pipeline.boilerplate import dedup_paragraphs
from irkit_spark.pipeline.substring import dedup_substrings

_TOK = re.compile(TOKEN_RE)

# tiny vocab => dense collisions; docs of words drawn with repetition
_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _brute_substr(texts, n):
    toks = [(_TOK.findall(t.lower())) for t in texts]
    seen, covered = {}, [set() for _ in texts]
    for d, ts in enumerate(toks):
        for p in range(len(ts) - n + 1):
            g = tuple(ts[p:p + n])
            if g in seen:
                covered[d].update(range(p, p + n))
            else:
                seen[g] = (d, p)
    return {d: (" ".join(t for i, t in enumerate(ts)
                         if i not in covered[d]), len(covered[d]))
            for d, ts in enumerate(toks)}


def _brute_paras(texts):
    seen = {}
    out = {}
    for d, t in enumerate(texts):
        ps = t.split("\n\n")
        kept, removed = [], 0
        for i, p in enumerate(ps):
            k = p.strip().lower()
            if k == "":
                kept.append(p)
            elif k in seen and seen[k] != (d, i):
                removed += 1
            else:
                seen.setdefault(k, (d, i))
                kept.append(p)
        out[d] = ("\n\n".join(kept), removed)
    return out


@pytest.mark.parametrize("n", [2, 3])
@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=_CORPUS)
def test_substring_dedup_property(spark, n, texts):
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_removed)
           for r in dedup_substrings(docs, n=n).collect()}
    assert got == _brute_substr(texts, n)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(
    st.lists(st.sampled_from(["hello world", "b", "  B  ", "", "c d"]),
             min_size=0, max_size=5).map("\n\n".join),
    min_size=1, max_size=6))
def test_paragraph_dedup_property(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_removed)
           for r in dedup_paragraphs(docs).collect()}
    assert got == _brute_paras(texts)
