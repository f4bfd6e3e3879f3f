"""Pseudo-relevance feedback (RM3-style query expansion).

irkit scores one fixed query; real retrieval stacks wrap it in an
expansion loop (Rocchio 1971, Lavrenko & Croft's relevance models):
retrieve, mine the top documents for co-occurring terms, requery with
those terms weighted in. This module is that loop over the engine's
own verified parts — search() for both passes, the frozen tokenizer
for term mining, and the boosts machinery for the weighted requery —
so the whole pipeline stays exactly DuckDB-oracleable:

  1. FIRST PASS: standard BM25 top-`fb_docs` (ties break on doc_id —
     deterministic feedback set).
  2. MINE: the feedback docs' texts (from the caller's docs_df, the
     same source-of-truth contract snippets() uses — the index stores
     no text by design) are tokenized with the frozen tokenizer;
     candidate terms are ranked by their INTEGER total tf over the
     feedback set (count-based RM1 — integer ranking makes the
     selection bit-reproducible in SQL, where a float-weighted rank
     could tie-break differently), original query terms excluded,
     top-`fb_terms` kept by (tf DESC, term ASC).
  3. REQUERY: original terms at weight 1.0, expansion term t at
     weight beta * tf_t / max_tf — pure IEEE division/multiplication
     of integers, so the weights are bit-identical in any engine; the
     weighted search reuses the boosts path (bounds scale linearly,
     pruning stays lossless).

Scale shape: the feedback set is k docs (driver-side, tiny); the
expansion adds fb_terms posting lists to the second pass — the same
pruned-scan plan as any (|q| + fb_terms)-term query. Two passes total,
each the standard search plan.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.functions.tokenize import tokenize
from irkit_spark.operators.query import Index, search


def expand_query(index: Index, query: str, docs_df: DataFrame,
                 fb_docs: int = 10, fb_terms: int = 10,
                 beta: float = 0.5, mode: str = "wand",
                 text_col: str = "text", id_col: str = "doc_id"
                 ) -> tuple[str, dict[str, float]]:
    """(expanded query string, {expansion term: weight}) — steps 1-2
    of the PRF loop. docs_df must be the rows the index tokenized,
    keyed by id_col carrying the index's doc ids."""
    if "^" in query:
        raise ValueError("PRF assigns expansion weights itself — "
                         "pass an unboosted query")
    if fb_docs < 1 or fb_terms < 1:
        raise ValueError("fb_docs and fb_terms must be >= 1")
    if not 0 < beta:
        raise ValueError("beta must be > 0")
    hits = search(index, query, k=fb_docs, mode=mode).collect()
    if not hits:
        return query, {}
    ids = [int(r["doc_id"]) for r in hits]
    texts = (docs_df.filter(F.col(id_col).isin(ids))
             .select(text_col).collect())
    qterms = set(tokenize(query))
    cnt: Counter = Counter()
    for r in texts:
        for t in tokenize(r[text_col] or ""):
            if t not in qterms:
                cnt[t] += 1
    if not cnt:
        return query, {}
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    max_tf = top[0][1]
    weights = {t: beta * c / max_tf for t, c in top}
    return query + " " + " ".join(t for t, _ in top), weights


def prf_search(index: Index, query: str, docs_df: DataFrame,
               k: int = 10, fb_docs: int = 10, fb_terms: int = 10,
               beta: float = 0.5, mode: str = "wand",
               local: bool | None = None,
               text_col: str = "text", id_col: str = "doc_id"
               ) -> DataFrame:
    """Two-pass pseudo-relevance-feedback retrieval: expand_query,
    then the weighted second pass (original terms at 1.0, expansion
    terms at beta * tf/max_tf through the boosts machinery). Falls
    back to the plain search when the first pass returns nothing."""
    expanded, weights = expand_query(index, query, docs_df,
                                     fb_docs=fb_docs,
                                     fb_terms=fb_terms, beta=beta,
                                     mode=mode, text_col=text_col,
                                     id_col=id_col)
    return search(index, expanded, k=k, mode=mode, local=local,
                  boosts=weights or None)


__all__ = ["expand_query", "prf_search"]
