"""Exact-substring duplicate-span removal — the ExactSubstr pass of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"), the substring-granular member of the repo's repeated-content
family (lines: boilerplate.remove_boilerplate; paragraphs:
boilerplate.dedup_paragraphs; whole docs: dedup.py).

Semantics (frozen): tokens are the frozen tokenizer stream
(TOKEN_RE over lowered text); an n-token gram occurrence at
(doc_id, pos) is a DUPLICATE iff the same gram hash occurs at a
strictly earlier corpus position ((doc_id, pos) lexicographic,
in-doc repeats included). A token is removed iff covered by at
least one duplicate gram occurrence — so the corpus-FIRST copy of
every repeated span survives and every later exact repeat of
>= n tokens is cut, with no content lost (the paper's 50-token
threshold is the `n` knob; tests and the driver entry use small n
so synthetic corpora show signal). The operator is defined over the
normalized token stream, as in the paper: the rewritten `text` is
the surviving tokens ' '-joined.

Hashing is the repo's PORTABLE 31-bit Karp-Rabin scheme (token hash
base 257, gram hash base 263, both mod 2^31-1 — identical to
pipeline/contamination.py) so the DuckDB oracle (`substring_dedup`
in __spark_entry__.py) reproduces every hash bit-for-bit.

Scale shape: the Arrow kernel emits (doc_id, pos, gh) int64 triples —
document text itself never shuffles. First-occurrence election is
groupBy(gh).agg(min(struct(doc_id, pos))) — a partial (map-side
combine) aggregate, so corpus-head grams (boilerplate sentences
repeated across millions of pages) collapse before the shuffle, then
one int-triple join back on gh (AQE splits any residual skewed key —
a window row_number over gh could not). Because the election's
aggregate and the join both consume the kernel output, Catalyst plans
the kernel twice (column pruning defeats exchange reuse): the corpus
is tokenized+hashed in two passes, but only int triples ever shuffle
— the classic ExactSubstr trade (suffix-array builds are also
multi-pass); callers looping over one corpus can persist() the input.
Covered positions explode xN as (doc_id, p) int pairs; reassembly is
one declarative projection with the removed-position array joined per
affected doc (bounded by doc length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE

P = 2_147_483_647
B_TOK = 257
B_GRAM = 263


def _occurrence_kernel(n: int):
    """mapInPandas kernel: (doc_id, text) -> (doc_id, pos, gh), one
    row per n-gram OCCURRENCE (not distinct — positions matter).

    Vectorized batch-wide (round 7, guide §4.2): ONE flat token array
    per Arrow batch, one length-sorted Karp-Rabin fold over all tokens
    (pipeline/dedup._kr_token_hashes — bit-identical to the old
    per-doc code-point matrix fold for [a-z0-9]+ tokens), one window
    fold over the whole batch with cross-document windows masked out.
    The old form allocated a (tokens x max_len) matrix and three
    Python lists PER DOC — the per-task hot loop at corpus scale."""
    import numpy as np
    import pandas as pd
    from irkit_spark.functions.tokenize import _flat_tokens
    from irkit_spark.pipeline.dedup import _kr_token_hashes

    empty = {"doc_id": pd.Series([], dtype="int64"),
             "pos": pd.Series([], dtype="int64"),
             "gh": pd.Series([], dtype="int64")}

    def run(batches):
        for pdf in batches:
            flat, row_idx, lens = _flat_tokens(pdf["text"])
            if flat.size < n:
                yield pd.DataFrame(empty)
                continue
            th = _kr_token_hashes(flat, B_TOK)
            nw = th.size - n + 1
            gh = np.zeros(nw, dtype=np.int64)
            for j in range(n):
                gh = (gh * B_GRAM + th[j:j + nw]) % P
            # keep only windows fully inside one document
            idx = np.flatnonzero(row_idx[:nw] == row_idx[n - 1:])
            if idx.size == 0:
                yield pd.DataFrame(empty)
                continue
            starts = np.zeros(lens.size, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            docs_of = row_idx[idx]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy()[docs_of]
                .astype(np.int64),
                "pos": idx - starts[docs_of],
                "gh": gh[idx]})

    return run


def gram_occurrences(docs: DataFrame, n: int,
                     text_col: str = "text") -> DataFrame:
    """(doc_id, pos, gh) for EVERY token n-gram occurrence."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return docs.select("doc_id", F.col(text_col).alias("text")) \
        .mapInPandas(_occurrence_kernel(n), "doc_id long, pos long, gh long")


def duplicate_anchors(docs: DataFrame, n: int,
                      text_col: str = "text") -> DataFrame:
    """(doc_id, pos) of every n-gram occurrence whose hash occurs at a
    strictly earlier corpus position — the removal anchors."""
    occ = gram_occurrences(docs, n, text_col)
    first = occ.groupBy("gh").agg(
        F.min(F.struct("doc_id", "pos")).alias("_f"))
    return (occ.join(first, "gh")
            .filter(F.struct("doc_id", "pos") != F.col("_f"))
            .select("doc_id", "pos"))


def dedup_substrings(docs: DataFrame, n: int = 8,
                     text_col: str = "text") -> DataFrame:
    """Remove every duplicated >=n-token span beyond its corpus-first
    occurrence. Returns the input columns with `text_col` rewritten to
    the surviving token stream (' '-joined, order preserved) plus
    `n_removed` (tokens cut from this doc). Docs with < n tokens and
    docs containing no repeated gram keep their full token stream.
    """
    anchors = duplicate_anchors(docs, n, text_col)
    removed = (anchors
               .select("doc_id",
                       F.explode(F.sequence(
                           "pos", F.col("pos") + F.lit(n - 1))).alias("p"))
               .distinct()
               .groupBy("doc_id")
               .agg(F.collect_list("p").alias("_rm")))
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_RE), 0)
    other = [c for c in docs.columns if c != text_col]
    base = docs.select(*other, toks.alias("_ts"))
    empty = F.array().cast("array<long>")
    rm = F.coalesce(F.col("_rm"), empty)
    return (base.join(removed, "doc_id", "left")
            .select(*other,
                    F.concat_ws(
                        " ",
                        F.filter("_ts", lambda t, i: ~F.array_contains(
                            rm, i.cast("long")))).alias(text_col),
                    F.size(rm).cast("long").alias("n_removed")))
