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


def canonicalize_iter(batches: Iterator[pd.DataFrame],
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      from_html: bool = False,
                      emit_terms: bool = False,
                      extractor: str = "frozen") -> Iterator[pd.DataFrame]:
    r"""(doc_id, text|html) -> (doc_id, text=space-joined frozen tokens).

    extractor selects the html->text form from
    functions/extract.EXTRACTORS ("frozen" default; "dom" opt-in —
    quote-aware tags, noscript/template dropped); only consulted when
    from_html. The tokenizer itself is always the frozen regex.

    Runs the extractor (optionally) and the frozen regex
    tokenizer ONCE, fused in a single Python crossing — raw html enters
    the worker, only canonical tokens leave (at web scale that removes
    two full Arrow transfers of the corpus text). Downstream passes
    split on whitespace (pre_tokenized=True), ~5x cheaper than the
    regex; the token sequence is identical by construction (tokens are
    [a-z0-9]+, so ' '.join is lossless).

    Stays scalar-python on purpose: measured on the bench corpus, an
    Arrow/RE2 column-kernel variant ran 0.9x (RE2 no faster than
    CPython's C regex on ~1KB docs; list<->Arrow conversions ate the
    rest) and a bytes.translate token pass only 1.2x — not worth the
    ASCII-gating complexity the frozen unicode semantics would force
    (python lower()/\b/\s have no exact RE2 spelling).

    emit_terms=True additionally yields each batch's DISTINCT terms as
    sentinel rows (id_col NULL, text = term) — the token lists are
    already in hand here, so the build's pass A (a second full
    split+factorize scan of the cached canonical corpus) collapses
    into a filter. NULL-keyed input rows were never indexable (the id
    join / int cast drops them), so the sentinel is unambiguous. In
    this mode every row also carries `dl` (the doc's token count —
    free here, len(tok_list)), so the docs table downstream is a pure
    projection: no corpus-wide re-split for doc lengths."""
    from irkit_spark.functions.extract import EXTRACTORS_NOWS
    # the no-whitespace-collapse twin: the token stream of
    # findall(TOKEN_RE, x.lower()) is invariant under the collapse
    # (whitespace is never inside a token and never joins two runs),
    # and this path never emits the extracted text itself — only the
    # canonical ' '.join(tokens) — so the collapse pass (~70% of
    # extract wall on the bench corpus) is pure overhead here
    _extract = EXTRACTORS_NOWS[extractor]
    for pdf in batches:
        if from_html:
            texts = (_extract(h) for h in pdf[text_col])
        else:
            texts = (t if isinstance(t, str) else "" for t in pdf[text_col])
        if not emit_terms:
            canon = [" ".join(_TOKEN.findall(t.lower())) for t in texts]
            yield pd.DataFrame({id_col: pdf[id_col],
                                "text": pd.Series(canon, dtype="object")})
            continue
        tok_lists = [_TOKEN.findall(t.lower()) for t in texts]
        canon = [" ".join(ts) for ts in tok_lists]
        yield pd.DataFrame({
            id_col: pdf[id_col],
            "text": pd.Series(canon, dtype="object"),
            "dl": pd.Series(np.fromiter(map(len, tok_lists),
                                        dtype=np.int32,
                                        count=len(tok_lists)))})
        # batch-distinct via set.update — ~4x faster than the old
        # flat-array + factorize form (round 7), and the downstream
        # global distinct() is order-insensitive anyway
        uniq: set = set()
        for ts in tok_lists:
            uniq.update(ts)
        if uniq:
            nu = len(uniq)
            yield pd.DataFrame({
                id_col: pd.Series([None] * nu, dtype="object"),
                "text": pd.Series(list(uniq), dtype="object"),
                "dl": pd.Series(np.zeros(nu, dtype=np.int32))})


def _flat_tokens(texts, pre_tokenized: bool = False
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared tokenize core: texts -> (flat object array, row_idx, lens).

    (Round 7 note: a join-whole-batch + single-split variant of the
    pre_tokenized path measured 1.5x SLOWER than the per-doc split +
    slice-assign below — the per-doc loop is already C-dominated —
    so this form stands.)"""
    if pre_tokenized:
        # str.split() returns [] for '' and tokens hold no whitespace,
        # so this reproduces the frozen token sequence exactly
        tok_lists = [t.split() if isinstance(t, str) else []
                     for t in texts]
    else:
        tok_lists = [_TOKEN.findall(t.lower()) if isinstance(t, str)
                     else [] for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for t in tok_lists:
        n = len(t)
        if n:
            flat[pos:pos + n] = t
            pos += n
    row_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
    return flat, row_idx, lens


def distinct_terms_iter(batches: Iterator[pd.DataFrame],
                        text_col: str = "text",
                        pre_tokenized: bool = False
                        ) -> Iterator[pd.DataFrame]:
    """Pass A of the build (SURVEY.md T3): per-batch DISTINCT terms —
    the big token stream never leaves the worker; only vocab-sized rows
    cross Arrow. A global distinct() finishes the term set; df/cf are
    aggregated later from the integer token table (far cheaper than
    counting strings here)."""
    for pdf in batches:
        flat, _, _ = _flat_tokens(pdf[text_col], pre_tokenized)
        if flat.size == 0:
            yield pd.DataFrame({"term": pd.Series([], dtype="object")})
            continue
        _, uniq = pd.factorize(flat)
        yield pd.DataFrame({"term": np.asarray(uniq, dtype=object)})


def tokenize_ids_iter(batches: Iterator[pd.DataFrame], bc_term_ids,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      pre_tokenized: bool = False
                      ) -> Iterator[pd.DataFrame]:
    """Pass B of the build (T1+A1+T3): (doc_id, text) ->
    (doc_id, term_id, tf, dl) with term-ID assignment via the broadcast
    dictionary INSIDE the kernel (BASELINE.json:6). The 10^12-row output
    stream is integer-only — no Python string objects cross the Arrow
    channel, which is what makes this pass scale with cores. Terms not
    in the dictionary are dropped (P3; only possible with a shared
    lexicon narrower than the batch)."""
    for pdf in batches:
        flat, row_idx, lens = _flat_tokens(pdf[text_col], pre_tokenized)
        if flat.size == 0:
            yield pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                "term_id": pd.Series([], dtype="int32"),
                                "tf": pd.Series([], dtype="int32"),
                                "dl": pd.Series([], dtype="int32")})
            continue
        codes, uniq = pd.factorize(flat)
        nu = len(uniq)
        lookup = bc_term_ids.value
        code_ids = np.fromiter((lookup.get(t, -1) for t in uniq),
                               dtype=np.int64, count=nu)
        ukey, tf = np.unique(row_idx * nu + codes, return_counts=True)
        rows = ukey // nu
        tid = code_ids[ukey % nu]
        keep = tid >= 0
        yield pd.DataFrame({
            id_col: pdf[id_col].to_numpy()[rows[keep]],
            "term_id": tid[keep].astype("int32"),
            "tf": tf[keep].astype("int32"),
            "dl": lens[rows[keep]].astype("int32")})


def tokenize_count_iter(batches: Iterator[pd.DataFrame],
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        pre_tokenized: bool = False
                        ) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, text) -> (doc_id, term, tf, dl).

    tf counting per (doc, term) inside the Arrow batch: one factorize
    pass over the flat token array + an integer np.unique — ~6x faster
    and far less allocation-heavy than a pandas hash groupby (matters
    at high task concurrency). The only shuffle the caller needs
    afterwards is the salted repartition-by-term (SURVEY.md §3.1).
    """
    for pdf in batches:
        flat, row_idx, lens = _flat_tokens(pdf[text_col], pre_tokenized)
        if flat.size == 0:
            yield pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                "term": pd.Series([], dtype="object"),
                                "tf": pd.Series([], dtype="int64"),
                                "dl": pd.Series([], dtype="int64")})
            continue
        codes, uniq = pd.factorize(flat)
        nu = len(uniq)
        key = row_idx * nu + codes
        ukey, tf = np.unique(key, return_counts=True)
        rows = ukey // nu
        terms = np.asarray(uniq, dtype=object)[ukey % nu]
        doc_ids = pdf[id_col].to_numpy()[rows]
        yield pd.DataFrame({id_col: doc_ids,
                            "term": terms,
                            "tf": tf.astype("int64"),
                            "dl": lens[rows]})
