"""Distributed BPE merge learning — tokenizer training over the
corpus (Sennrich et al. 2016), the op a training-data pipeline runs
once per corpus to fit the vocabulary it will tokenize with.

The scale insight: classic BPE iterates over word TYPES, not the
corpus. One corpus-wide groupBy reduces 100 TB of text to a
(word, count) table (~10^7-10^8 types for web text, ~GBs); every merge
iteration then runs on that compact table only. Two value-identical
paths, the repo's standard gate pattern:

- driver path (default, below `collect_max` types): collect the type
  table and run the exact greedy loop in Python — the classic
  implementation, O(types x merges).
- distributed path (above the gate): per iteration, one declarative
  pair-count aggregate (map-side combine; only (pair, count) rows
  shuffle) + a 1-row argmax to the driver + one codegen'd
  F.aggregate fold applying the merge to the symbol arrays
  (localCheckpoint per iteration keeps the plan flat). 2 jobs per
  merge on the types table — never the corpus.

Frozen semantics (shared by both paths and the tests' brute-force
reference): words are the frozen tokenizer stream; initial symbols
are the word's characters (no end-of-word marker — the frozen
tokenizer already strips whitespace/punctuation, so words are
self-delimiting); each step merges the adjacent pair with the
HIGHEST total count over types (count x type frequency), ties broken
by lexicographically smallest (left, right); within a word the merge
applies greedily left-to-right without overlap ("aaa" + (a,a) ->
["aa","a"]). Merges stop early if no pair remains.

`bpe_segment` applies a learned merge table: per word, repeatedly
merge the lowest-rank adjacent pair (rank = merge step) until no
learned pair remains — the standard BPE encoder, run as an Arrow
kernel with a per-batch word cache and the rank dict broadcast by
closure (merge tables are vocabulary-sized).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE

# Word-type tables are vocabulary-shaped; 2M types x ~20 B is a few
# tens of MB on the driver — same order as the repo's vocab gate.
BPE_COLLECT_MAX = 2_000_000


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): frozen-tokenizer word types with corpus counts —
    the one corpus-wide reduction BPE training needs."""
    return (docs.select(F.explode(F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0))
                .alias("word"))
            .groupBy("word")
            .agg(F.count("*").cast("long").alias("cnt")))


def pair_counts(types: DataFrame) -> DataFrame:
    """(lhs, rhs, n) adjacent-symbol pair counts over a types table
    carrying either `word` (chars are the symbols) or `syms`
    (array<string>). Declarative: slice-zip-explode + one aggregate."""
    if "syms" in types.columns:
        syms = F.col("syms")
    else:
        syms = F.split(F.col("word"), "")
    sz = F.size(syms)
    z = F.arrays_zip(F.slice(syms, 1, sz - 1).alias("lhs"),
                     F.slice(syms, 2, sz - 1).alias("rhs"))
    return (types.filter(sz >= 2)
            .select("cnt", F.explode(z).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"),
                     F.col("p.rhs").alias("rhs"))
            .agg(F.sum("cnt").cast("long").alias("n")))


def _merge_fold(a: str, b: str):
    """Codegen'd greedy left-to-right merge of adjacent (a, b) in a
    symbol array, non-overlapping ('' is a safe sentinel: symbols are
    never empty)."""
    empty = F.array().cast("array<string>")

    def step(st, x):
        hit = (st.prev == F.lit(a)) & (x == F.lit(b))
        return (F.when(st.prev == F.lit(""),
                       F.struct(st.acc.alias("acc"), x.alias("prev")))
                .when(hit, F.struct(
                    F.concat(st.acc, F.array(F.lit(a + b))).alias("acc"),
                    F.lit("").alias("prev")))
                .otherwise(F.struct(
                    F.concat(st.acc, F.array(st.prev)).alias("acc"),
                    x.alias("prev"))))

    return lambda col: F.aggregate(
        col, F.struct(empty.alias("acc"), F.lit("").alias("prev")), step,
        lambda st: F.when(st.prev == F.lit(""), st.acc)
        .otherwise(F.concat(st.acc, F.array(st.prev))))


def _merge_word_list(syms: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _learn_driver(pairs_of_types: list, n_merges: int) -> list:
    """Exact classic loop over a [(symbols_list, cnt)] type table."""
    types = pairs_of_types
    merges = []
    for step in range(n_merges):
        counts: dict = {}
        for syms, cnt in types:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = \
                    counts.get((syms[i], syms[i + 1]), 0) + cnt
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, n))
        types = [(_merge_word_list(s, a, b) if n else s, c)
                 for s, c in types]
    return merges


def learn_bpe(docs: DataFrame, n_merges: int = 50,
              text_col: str = "text",
              collect_max: int = BPE_COLLECT_MAX) -> DataFrame:
    """Learn `n_merges` BPE merges from the corpus. Returns a
    DataFrame (step, lhs, rhs, merged, n) in merge order. Driver loop
    below `collect_max` word types, distributed iteration above —
    value-identical (tested)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = docs.sparkSession
    types = word_types(docs, text_col)
    head = types.limit(collect_max + 1).collect()
    if len(head) <= collect_max:
        merges = _learn_driver([(list(r.word), r.cnt) for r in head],
                               n_merges)
    else:
        merges = _learn_distributed(types, n_merges)
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, merged string, n long")


def _learn_distributed(types: DataFrame, n_merges: int) -> list:
    cur = types.select(F.split("word", "").alias("syms"), "cnt") \
        .localCheckpoint()
    merges = []
    for step in range(n_merges):
        top = (pair_counts(cur.select("syms", "cnt"))
               .orderBy(F.desc("n"), "lhs", "rhs").limit(1).collect())
        if not top:
            break
        a, b, n = top[0].lhs, top[0].rhs, top[0].n
        merges.append((step, a, b, a + b, n))
        cur = cur.select(_merge_fold(a, b)(F.col("syms")).alias("syms"),
                         "cnt").localCheckpoint()
    return merges


def bpe_segment(docs: DataFrame, merges: list,
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_pieces, pieces_fp-free form): apply learned
    merges (list of (lhs, rhs) in merge order, or rows from
    learn_bpe) to every word — the standard greedy lowest-rank
    encoder. Returns doc_id, n_words, n_pieces, pieces (the full
    piece stream, ' '-joined)."""
    rank = {}
    for m in merges:
        # branch on length alone: a 2-element list/tuple is (lhs, rhs),
        # anything longer is a learn_bpe Row (ix, lhs, rhs, ...)
        pair = (m[0], m[1]) if len(m) == 2 else (m[1], m[2])
        if pair not in rank:
            rank[pair] = len(rank)
    import pandas as pd
    tok_re = re.compile(TOKEN_RE)

    def encode_word(w: str, cache: dict) -> list:
        got = cache.get(w)
        if got is not None:
            return got
        syms = list(w)
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms = (syms[:bi] + [syms[bi] + syms[bi + 1]]
                    + syms[bi + 2:])
        cache[w] = syms
        return syms

    def run(batches):
        for pdf in batches:
            cache: dict = {}
            ids, nw, np_, pieces = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = tok_re.findall((text or "").lower())
                ps = [p for w in words for p in encode_word(w, cache)]
                ids.append(doc_id)
                nw.append(len(words))
                np_.append(len(ps))
                pieces.append(" ".join(ps))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "n_words": pd.Series(nw, dtype="int64"),
                 "n_pieces": pd.Series(np_, dtype="int64"),
                 "pieces": pieces})

    return docs.select("doc_id", F.col(text_col).alias("text")) \
        .mapInPandas(run, "doc_id long, n_words long, n_pieces long, "
                          "pieces string")
