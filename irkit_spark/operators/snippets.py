"""Snippet / best-window generation over the positions artifact.

The second consumer of operators/positions (after phrase_search):
given a ranked query, pick for each top-k document the best
fixed-width token window to show a user — the classic result-page
"keyword in context" highlight (irkit's public surface stops at TREC
run output; this extends it the way any serving deployment must).

Contract (deterministic, DuckDB-oracleable — the window algebra is
pure integer arithmetic over tokenizer offsets):

  * Candidate windows start AT a query-term occurrence.  The optimal
    fixed-width window can always be slid right until its first
    contained occurrence is its start without losing any occurrence,
    so restricting starts to occurrences loses nothing and makes the
    tie-break well-defined on both engines.
  * A window is the half-open token range [s, s + window).
  * Best window per doc = max by (distinct query terms in window,
    then total query-term occurrences in window, then SMALLEST s).
  * win_start is a 0-based offset of the FROZEN tokenizer
    (functions/tokenize.TOKEN_RE) — the same coordinate system the
    positions artifact stores.

Scale shape: the top-k doc ids (k rows) are collected driver-side —
the same k-row materialization the CLI/TREC writer already does — and
the window kernel runs as a term_id- AND partition_id-pruned scan of
positions/ (dir-partitioned by shard): only the shards that hold a
top-k doc are read, each shard's work is a vectorized numpy sweep over
that shard's query-term occurrences restricted to its candidate docs.
No corpus shuffle, no full positions scan; the snippet-text join
pushes an isin(doc_id) predicate into the source-table scan and
broadcasts the k-row span frame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE
from irkit_spark.functions.tokenize import tokenize
from irkit_spark.operators.positions import (_POS_BITS,
                                             decode_positions_row,
                                             has_positions,
                                             read_positions)

SPAN_SCHEMA = "doc_id long, win_start long, n_distinct int, n_occ long"
SNIPPET_SCHEMA = SPAN_SCHEMA + ", score double"


def _window_kernel(term_ids: list[int], window: int,
                   docs_per_shard: int, cand: np.ndarray):
    """Per-shard best-window sweep, fully vectorized.

    Occurrences of the query terms within this shard's candidate docs
    become sorted int64 keys (doc_local << 33 | pos) — strictly
    increasing because a token position holds exactly one term — and
    for every occurrence i the window [pos_i, pos_i + window) closes
    at end_i = searchsorted(keys, key_i + window): occurrence count is
    end_i - i, distinct-term count is a per-term prefix-sum difference
    (one cumsum per unique query term, m of them).  Best-per-doc is
    one lexsort + first-of-group — no per-candidate Python loop.
    """
    m = len(term_ids)
    t_index = {int(t): j for j, t in enumerate(term_ids)}
    win = np.int64(window)
    dps = docs_per_shard

    def run(post_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "win_start": pd.Series([], dtype="int64"),
            "n_distinct": pd.Series([], dtype="int32"),
            "n_occ": pd.Series([], dtype="int64")})
        if post_pdf.empty:
            return empty
        shard = int(post_pdf["partition_id"].iloc[0])
        base = shard * dps
        c = cand[np.searchsorted(cand, base):
                 np.searchsorted(cand, base + dps)]
        if c.size == 0:
            return empty
        doc_l, pos_l, ti_l = [], [], []
        # one row per (term, shard) — the same pinned invariant as the
        # main shard kernel (operators/query.py run()); a blocks-per-row
        # layout change would need a column pull here too
        for _, r in post_pdf.iterrows():
            docs, cnts, offs, pos_flat = decode_positions_row(r)
            ix = np.searchsorted(c, docs)
            present = (ix < c.size) & (c[np.minimum(ix, c.size - 1)]
                                       == docs)
            if not present.any():
                continue
            sl = cnts[present]
            total = int(sl.sum())
            if total == 0:
                continue
            # gather each selected doc's position slice in one fancy
            # index: repeat(start) + intra-slice ramp
            sstart = offs[:-1][present]
            ramp = (np.arange(total, dtype=np.int64)
                    - np.repeat(np.concatenate(
                        ([0], np.cumsum(sl[:-1]))), sl))
            doc_l.append(np.repeat(docs[present], sl))
            pos_l.append(pos_flat[np.repeat(sstart, sl) + ramp])
            ti_l.append(np.full(total, t_index[int(r["term_id"])],
                                dtype=np.int64))
        if not doc_l:
            return empty
        doc = np.concatenate(doc_l)
        pos = np.concatenate(pos_l)
        ti = np.concatenate(ti_l)
        if int(pos.max()) + window >= (1 << int(_POS_BITS)):
            raise ValueError(
                "snippet window sweep packs doc-local ids with "
                "positions into int64 keys: max position + window "
                "must stay below 2^33")
        key = ((doc - base) << _POS_BITS) + pos
        order = np.argsort(key)            # strictly increasing keys
        key, doc, pos, ti = (key[order], doc[order], pos[order],
                             ti[order])
        n = key.size
        idx = np.arange(n)
        end = np.searchsorted(key, key + win, side="left")
        n_occ = end - idx
        ndist = np.zeros(n, dtype=np.int64)
        for t in range(m):
            pref = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(ti == t, out=pref[1:])
            ndist += (pref[end] - pref[idx]) > 0
        # best per doc: primary doc, then distinct desc, occ desc,
        # start asc — lexsort keys listed least-significant first
        order2 = np.lexsort((pos, -n_occ, -ndist, doc))
        ds = doc[order2]
        firsts = order2[np.flatnonzero(np.concatenate(
            ([True], ds[1:] != ds[:-1])))]
        return pd.DataFrame({
            "doc_id": doc[firsts].astype(np.int64),
            "win_start": pos[firsts].astype(np.int64),
            "n_distinct": ndist[firsts].astype(np.int32),
            "n_occ": n_occ[firsts].astype(np.int64)})

    return run


def _resolve_hits(index, query: str, k: int, mode: str,
                  hits) -> list[tuple[int, float]]:
    if hits is not None:
        return [(int(d), float(s)) for d, s in hits]
    from irkit_spark.operators.query import search
    rows = search(index, query, k=k, mode=mode).collect()
    return [(int(r["doc_id"]), float(r["score"])) for r in rows]


def snippet_spans(index, query: str, k: int = 10, window: int = 30,
                  mode: str = "wand",
                  hits: list[tuple[int, float]] | None = None
                  ) -> DataFrame:
    """Best snippet window per top-k doc:
    (doc_id, win_start, n_distinct, n_occ, score), ordered by the
    query ranking (score desc, doc_id asc).

    hits: optional precomputed top-k [(doc_id, score), ...] — pass it
    to reuse a ranking you already materialized (snippets() does);
    default runs search(index, query, k=k, mode=mode) and collects the
    k rows driver-side.  OOV query terms are dropped (P3 semantics);
    every hit doc carries at least one surviving-term occurrence by
    construction, so the span frame covers all k hits."""
    from irkit_spark.operators.segments import SegmentedIndex
    if isinstance(index, SegmentedIndex):
        raise ValueError(
            "snippets read the positions artifact, which is "
            "per-segment — merge_indexes the segments first "
            "(SegmentedIndex federates the docID+tf tier only)")
    spark = index.spark
    empty = spark.createDataFrame([], SNIPPET_SCHEMA)
    toks = tokenize(query)
    if not toks:
        return empty
    if not has_positions(index):
        raise ValueError(f"index at {index.path} has no positions/ "
                         "artifact — run build_positions first")
    if not (0 < window < (1 << 30)):
        raise ValueError("window must be a small positive int")
    qmeta = index.lookup_query(" ".join(toks))
    if not qmeta:
        return empty
    pairs = _resolve_hits(index, query, k, mode, hits)
    if not pairs:
        return empty
    cand = np.array(sorted(d for d, _ in pairs), dtype=np.int64)
    dps = index.docs_per_shard
    if dps >= (1 << 30):
        raise ValueError("snippet kernel packs doc-local ids into "
                         "int64 keys: docs_per_shard must be < 2^30")
    shards = sorted({int(d) // dps for d in cand})
    term_ids = sorted(int(m["term_id"]) for m in qmeta)
    qpos = (read_positions(spark, index.path)
            .filter(F.col("partition_id").isin(shards))
            .filter(F.col("term_id").isin(term_ids)))
    kern = _window_kernel(term_ids, window, dps, cand)
    spans = (qpos.groupBy("partition_id")
             .applyInPandas(lambda pdf: kern(pdf), SPAN_SCHEMA))
    hits_df = spark.createDataFrame(pairs, "doc_id long, score double")
    return (spans.join(F.broadcast(hits_df), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id")))


def snippets(index, query: str, docs_df: DataFrame, k: int = 10,
             window: int = 30, mode: str = "wand",
             text_col: str = "text", id_col: str = "doc_id"
             ) -> DataFrame:
    """snippet_spans + the snippet TEXT: the window's tokens of the
    frozen tokenizer joined with single spaces (a canonical, engine-
    portable rendition — token char-spans differ per whitespace run,
    token joins don't).  docs_df must be the same rows the index
    tokenized, keyed by id_col carrying the index's doc ids (the
    doc_id_col build path) — the caller's source of truth for text;
    the index's own docs artifact stores no text by design.

    Plan: k-row isin pushdown into the docs_df scan, broadcast join
    against the span frame, then one JVM-side
    regexp_extract_all → slice → array_join over k rows."""
    pairs = _resolve_hits(index, query, k, mode, None)
    spans = snippet_spans(index, query, k=k, window=window, mode=mode,
                          hits=pairs)
    ids = [d for d, _ in pairs]
    src = (docs_df
           .filter(F.col(id_col).isin(ids) if ids else F.lit(False))
           .select(F.col(id_col).cast("long").alias("doc_id"),
                   F.col(text_col).alias("_snip_text")))
    snip = F.expr(
        f"array_join(slice(regexp_extract_all(lower(_snip_text), "
        f"'{TOKEN_RE}', 0), cast(win_start + 1 as int), "
        f"{int(window)}), ' ')")
    return (src.join(F.broadcast(spans), "doc_id")
            .withColumn("snippet", snip)
            .drop("_snip_text")
            .select("doc_id", "win_start", "n_distinct", "n_occ",
                    "snippet", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")))
