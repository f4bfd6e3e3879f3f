"""Frozen tokenizer + Arrow-vectorized tokenize-and-count.

Re-expresses irkit's parser/normalizer (SURVEY.md §2.3 T1
[pub:parsing/]) as: lowercase, extract `[a-z0-9]+` runs. FROZEN —
rank-identity across the TAAT/DAAT/WAND paths and the DuckDB oracle
depends on every path tokenizing identically:

  * python:   re.findall(TOKEN_RE, text.lower())
  * Spark:    F.regexp_extract_all(F.lower(text), TOKEN_RE, 0)
  * DuckDB:   regexp_extract_all(lower(text), '[a-z0-9]+')

The hot path is `tokenize_count_udf` (SURVEY.md A1): a pandas-batched
iterator for mapInPandas that turns (doc_id, doc_len implicit) text into
(doc_id, term, tf, dl) WITHOUT an explode+groupBy shuffle of
10^12 x avg_len token rows — tf counting happens Arrow-side per batch.
`dl` (doc length in tokens) rides along so the encode stage can compute
exact per-posting BM25 tf_norms with no doc-length join (SURVEY.md A5).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from irkit_spark.config import TOKEN_RE

_TOKEN = re.compile(TOKEN_RE)


def tokenize(text: str) -> list[str]:
    """Frozen scalar tokenizer (driver-side query parsing, tests)."""
    return _TOKEN.findall(text.lower())


def tokenize_batch(texts: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized-ish batch tokenize: returns (row_idx, token, dl_per_row).

    pandas `.str` ops are the Arrow-side fast path available without
    per-row Python UDF registration; the regex loop itself is C-level
    (re module over a pandas str accessor).
    """
    tok_lists = texts.fillna("").str.lower().str.findall(TOKEN_RE)
    lens = tok_lists.str.len().to_numpy(dtype=np.int64)
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    if len(tok_lists):
        flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists]) \
            if lens.sum() else np.empty(0, dtype=object)
    else:
        flat = np.empty(0, dtype=object)
    return row_idx, flat, lens


def tokenize_count_iter(batches: Iterator[pd.DataFrame],
                        id_col: str = "doc_id",
                        text_col: str = "text") -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, text) -> (doc_id, term, tf, dl).

    tf computed per (doc, term) inside the Arrow batch via a single
    pandas groupby (C-level hash agg) — the only shuffle the caller
    needs afterwards is the salted repartition-by-term (SURVEY.md §3.1).
    """
    for pdf in batches:
        row_idx, flat, lens = tokenize_batch(pdf[text_col])
        if flat.size == 0:
            yield pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                "term": pd.Series([], dtype="object"),
                                "tf": pd.Series([], dtype="int64"),
                                "dl": pd.Series([], dtype="int64")})
            continue
        doc_ids = pdf[id_col].to_numpy()[row_idx]
        tok = pd.DataFrame({id_col: doc_ids, "term": flat})
        counted = (tok.groupby([id_col, "term"], sort=False)
                      .size().rename("tf").reset_index())
        dl_map = pd.Series(lens, index=pdf[id_col].to_numpy())
        counted["dl"] = dl_map.reindex(counted[id_col].to_numpy()).to_numpy()
        counted["tf"] = counted["tf"].astype("int64")
        counted["dl"] = counted["dl"].astype("int64")
        yield counted
