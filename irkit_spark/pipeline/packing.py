"""Sequence-packing plan: concat-and-chunk documents into fixed-size
training windows (the GPT-style pretraining layout).

The token stream is the corpus in doc_id order; window w covers tokens
[w*window_size, (w+1)*window_size). Each document starts at the global
running token offset and may span several windows. The plan emits, per
document, its start offset and the [first_window, last_window] range —
everything a downstream batch writer needs to route doc text to window
files.

Scale shape: the naive form is `sum() OVER (ORDER BY doc_id)` — a
single-partition global window, a non-starter at 10^12 docs. Here it
is the classic two-phase distributed prefix sum (same pattern as
plans/dense_ids.py): docs bucket by doc_id range, per-bucket token
subtotals come to the driver (n_buckets rows, bytes), exclusive bucket
offsets go back as a broadcast join, and the within-bucket running sum
is a window PARTITIONED by bucket — every bucket scans in parallel.
Only (bucket, n_tokens) ever shuffles; text does not move. The result
is invariant to the bucket count (tested), so buckets scale with the
corpus exactly like dense-ID assignment.

All arithmetic is BIGINT (integer division via `DIV`), shared text
with the DuckDB oracle (`pack_windows` in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE

# ~keys per bucket in the prefix-sum: 10^12 docs -> 20k buckets of
# driver-side subtotals (tiny); small corpora still get >=1 bucket.
DOCS_PER_BUCKET = 50_000_000


def pack_plan(docs: DataFrame, window_size: int = 2048,
              text_col: str = "text",
              docs_per_bucket: int = DOCS_PER_BUCKET) -> DataFrame:
    """(doc_id, n_tokens, start_tok, first_window, last_window,
    n_windows) for the doc_id-ordered token stream chunked into
    `window_size`-token windows.

    Empty documents (0 tokens) occupy no tokens; they are assigned
    first_window == last_window == the window of their start offset
    (via max(n,1) in the end-offset) so every doc routes somewhere.
    """
    if window_size <= 0:
        raise ValueError(f"window_size must be positive: {window_size}")
    t = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                    F.lit(TOKEN_RE), 0))
        .cast("long").alias("n_tokens"),
        (F.col("doc_id").cast("long") / F.lit(int(docs_per_bucket)))
        .cast("long").alias("_b"))

    # phase 1: per-bucket subtotals -> driver -> exclusive offsets
    subtotals = {r["_b"]: r["s"] for r in
                 t.groupBy("_b").agg(F.sum("n_tokens").alias("s"))
                 .collect()}
    off, offsets = 0, []
    for b in sorted(subtotals):
        offsets.append((b, off))
        off += subtotals[b]
    spark = docs.sparkSession
    odf = spark.createDataFrame(offsets, "`_b` long, `_off` long") \
        if offsets else spark.createDataFrame([], "`_b` long, `_off` long")

    # phase 2: within-bucket running sum, parallel across buckets
    w = (Window.partitionBy("_b").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.col("_off") + F.sum("n_tokens").over(w)
             - F.col("n_tokens")).alias("start_tok")
    c = t.join(F.broadcast(odf), "_b").select(
        "doc_id", "n_tokens", start)
    return c.select(
        "doc_id", "n_tokens", "start_tok",
        F.expr(f"start_tok DIV {int(window_size)}").alias("first_window"),
        F.expr(f"(start_tok + greatest(n_tokens, 1) - 1) "
               f"DIV {int(window_size)}").alias("last_window"),
    ).withColumn("n_windows",
                 (F.col("last_window") - F.col("first_window") + 1)
                 .cast("long"))


def pack_materialize(docs: DataFrame, window_size: int = 2048,
                     text_col: str = "text",
                     docs_per_bucket: int = DOCS_PER_BUCKET) -> DataFrame:
    """Assemble the packed windows themselves: (window_id, n_tokens,
    n_docs, tokens) where `tokens` is the window's token slice of the
    global doc_id-ordered stream, boundary documents split mid-doc.

    Scale shape: one shuffle of (global_pos, term) pairs keyed by
    window_id — dense keys, per-window state bounded by window_size
    tokens, so executor memory is flat no matter the corpus size. The
    plan side reuses pack_plan's bucketed prefix sum; text reshuffles
    exactly once (it must: window assembly is a re-keying of the
    corpus). The final window is ragged (< window_size tokens).
    """
    plan = pack_plan(docs, window_size, text_col, docs_per_bucket) \
        .select("doc_id", "start_tok")
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.regexp_extract_all(F.lower(F.col(text_col)),
                                          F.lit(TOKEN_RE), 0))
        .alias("_i", "term"))
    g = (toks.join(plan, "doc_id")
         .select("doc_id", "term",
                 (F.col("start_tok") + F.col("_i")).alias("_pos")))
    w = g.withColumn("window_id",
                     F.expr(f"_pos DIV {int(window_size)}"))
    return (w.groupBy("window_id")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs"),
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("_pos", "term"))),
                     lambda s: s["term"]).alias("tokens")))
