"""More-like-this: retrieve documents similar to a given document.

The Lucene MoreLikeThis analog over the engine's own verified parts:
mine the source document's representative terms (tf·idf — tf from the
frozen tokenizer over the caller's docs_df, the same source-of-truth
contract snippets()/prf use, idf from the index's terms artifact),
then run the standard disjunctive top-k over those terms with the
source document excluded. Every step is deterministic and
SQL-expressible, so the whole loop is DuckDB-oracleable:

  1. MINE: distinct terms of the source doc with tf >= min_tf, scored
     w = tf * ln(1 + (N - df + 0.5)/(df + 0.5)) — an exact-integer tf
     times the engine's own idf, ties broken by the term string;
     top-`max_terms` kept (Lucene's maxQueryTerms, default 25).
  2. QUERY: standard search() over the mined terms (all pruning modes
     stay lossless — mined terms are ordinary terms), k+1 requested,
     the source doc dropped, k returned.

Scale shape: the mine step touches ONE document's text (driver-side,
bounded by doc length) and resolves df via the vocab-gated terms dict
(zero Spark jobs warm) or one pruned terms filter; the query is the
standard (max_terms)-posting-list pruned scan.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.functions.scoring import idf as idf_fn
from irkit_spark.functions.tokenize import tokenize
from irkit_spark.operators.query import Index, search


def mlt_terms(index: Index, doc_id: int, docs_df: DataFrame,
              max_terms: int = 25, min_tf: int = 1,
              text_col: str = "text", id_col: str = "doc_id"
              ) -> list[str]:
    """The mined term list for `doc_id`, ordered by (tf*idf DESC,
    term ASC). docs_df must be the rows the index tokenized, keyed by
    id_col carrying the index's doc ids. Terms absent from the lexicon
    (can only happen when docs_df drifted from the indexed corpus) are
    ignored; an unknown doc_id raises."""
    if max_terms < 1 or min_tf < 1:
        raise ValueError("max_terms and min_tf must be >= 1")
    rows = (docs_df.filter(F.col(id_col) == int(doc_id))
            .select(text_col).collect())
    if not rows:
        raise ValueError(f"doc_id {doc_id} not found in docs_df")
    cnt = Counter(tokenize(rows[0][text_col] or ""))
    cand = sorted(t for t, c in cnt.items() if c >= min_tf)
    if not cand:
        return []
    meta = index.lookup_query(" ".join(cand))
    scored = [(float(cnt[m["term"]]
                     * idf_fn(np.array([m["df"]]), index.n_docs)[0]),
               m["term"]) for m in meta]
    scored.sort(key=lambda s: (-s[0], s[1]))
    return [t for _, t in scored[:max_terms]]


def mlt_search(index: Index, doc_id: int, docs_df: DataFrame,
               k: int = 10, mode: str = "wand",
               max_terms: int = 25, min_tf: int = 1,
               local: bool | None = None,
               text_col: str = "text", id_col: str = "doc_id"
               ) -> DataFrame:
    """Top-k documents most similar to `doc_id` (itself excluded):
    (doc_id, score) under the standard scorer over the mined terms."""
    terms = mlt_terms(index, doc_id, docs_df, max_terms, min_tf,
                      text_col, id_col)
    if not terms:
        from irkit_spark.operators.query import TOPK_SCHEMA
        return index.spark.createDataFrame([], TOPK_SCHEMA)
    out = search(index, " ".join(terms), k=k + 1, mode=mode,
                 local=local)
    return (out.filter(F.col("doc_id") != int(doc_id))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
