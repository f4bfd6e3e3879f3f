"""Incremental index ingestion via Structured Streaming.

irkit itself is batch-only (SURVEY.md §2.10); its incrementality is
"build batch indexes, then k-way merge" ([pub:tools/irk-merge]). This
module is the Spark-native form of exactly that: a `readStream` over an
arriving `pages` directory drives `foreachBatch`, each micro-batch
becomes one batch index (operators/build.py with a SHARED, growing
lexicon and running collection stats), and `merge_indexes` folds the
batches into the serving index. Checkpointing gives exactly-once batch
processing across restarts; per-shard lineage inside each batch build
gives intra-batch resumability (§4.4).

State kept under `out_dir/_state` (all driver-written, tiny):
  lexicon/   (term, term_id) parquet — ids grow densely, never change
  counters.json  n_docs, coll_len, next_doc_id, batch dirs

Scoring note: batch b's block max-scores use the RUNNING avgdl at batch
time; the final merge records `bound_slack` so block-max WAND stays
lossless under avgdl drift (see operators/merge.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from irkit_spark.operators.build import build_index
from irkit_spark.operators.merge import merge_indexes
from irkit_spark.sources.pages import PAGES_SCHEMA

_COUNTERS = "counters.json"


def _state_dir(out_dir: str) -> str:
    d = os.path.join(out_dir, "_state")
    os.makedirs(d, exist_ok=True)
    return d


def _load_counters(out_dir: str) -> dict:
    pth = os.path.join(_state_dir(out_dir), _COUNTERS)
    if os.path.exists(pth):
        with open(pth) as f:
            return json.load(f)
    return {"n_docs": 0, "coll_len": 0, "next_doc_id": 0,
            "next_term_id": 0, "batches": [], "epochs": []}


def _save_counters(out_dir: str, c: dict):
    pth = os.path.join(_state_dir(out_dir), _COUNTERS)
    tmp = pth + ".tmp"
    with open(tmp, "w") as f:
        json.dump(c, f)
    os.replace(tmp, pth)


def _grow_lexicon(spark, out_dir: str, batch_terms, counters: dict,
                  window_max: int = 100_000):
    """Append unseen terms with new dense ids; existing ids never move
    (so already-built batch indexes stay valid).

    Id assignment is gated on the NEW-term count: small deltas (the
    steady state — most batches add few terms) use one global sorted
    window; above `window_max` (e.g. the FIRST micro-batch of a
    web-scale stream, which carries the whole vocabulary) ids come
    from plans/dense_ids.sorted_rank_mapping — range-partitioned
    sorted rank, no single-task window (VERDICT r3 item 8). Both
    assign rank-in-sorted-order + next_term_id, so the id space is
    identical either way."""
    lex_path = os.path.join(_state_dir(out_dir), "lexicon")
    from pyspark.sql import Window
    if os.path.exists(os.path.join(lex_path, "_SUCCESS")):
        lex = spark.read.parquet(lex_path)
        new = batch_terms.join(lex.select("term"), "term", "left_anti")
    else:
        lex = None
        new = batch_terms
    new_d = new.select("term").distinct().persist()
    n_new = new_d.count()
    if n_new > window_max:
        from irkit_spark.plans.dense_ids import sorted_rank_mapping
        new_ids = (sorted_rank_mapping(new_d, "term", "__rank")
                   .withColumn(
                       "term_id",
                       (F.col("__rank") + counters["next_term_id"])
                       .cast("int"))
                   .select("term", "term_id"))
    else:
        w = Window.orderBy("term")
        new_ids = new_d.withColumn(
            "term_id",
            (F.row_number().over(w) - 1 + counters["next_term_id"])
            .cast("int"))
    updated = new_ids if lex is None else lex.unionByName(new_ids)
    tmp = lex_path + "_tmp"
    # coalesce only small lexicons into one file; a huge first batch
    # keeps its partitioned layout
    if n_new <= window_max and (lex is None or lex.rdd.getNumPartitions() == 1):
        updated = updated.coalesce(1)
    updated.write.mode("overwrite").parquet(tmp)
    new_d.unpersist()
    if os.path.exists(lex_path):
        import shutil
        shutil.rmtree(lex_path)
    os.rename(tmp, lex_path)
    counters["next_term_id"] += n_new
    return spark.read.parquet(lex_path)


def process_batch(spark: SparkSession, batch_df, out_dir: str,
                  docs_per_shard: int, codec: str = "varbyte",
                  epoch_id: int | None = None,
                  extractor: str = "frozen",
                  positions: bool = False) -> dict:
    """One micro-batch -> one batch index with global ids/stats.

    Idempotent per epoch: foreachBatch replays a micro-batch when the
    driver crashes between state mutation and the checkpoint commit, so
    an epoch_id already recorded in counters.json is a no-op — without
    this the replay would re-ingest the same docs under new doc_ids and
    inflate n_docs/coll_len (exactly-once would silently degrade to
    at-least-once)."""
    c = _load_counters(out_dir)
    if epoch_id is not None and epoch_id in c.get("epochs", []):
        return c
    batch_df = batch_df.cache()
    n = batch_df.count()
    if n == 0:
        batch_df.unpersist()
        return c
    # dense doc ids continuing after everything ingested so far
    from irkit_spark.plans.dense_ids import dense_id_mapping
    mapping, _ = dense_id_mapping(batch_df, "url", "doc_id")
    mapping = mapping.withColumn(
        "doc_id", F.col("doc_id") + c["next_doc_id"])
    ids = batch_df.join(F.broadcast(mapping), "url")

    # grow the shared lexicon with this batch's unseen terms
    from irkit_spark.functions.extract import extract_text_udf
    from irkit_spark.functions.tokenize import distinct_terms_iter
    src = ids.withColumn("text",
                         extract_text_udf(extractor)(F.col("html")))
    batch_terms = (src.select("text")
                   .mapInPandas(lambda it: distinct_terms_iter(it, "text"),
                                schema="term string").distinct())
    lex = _grow_lexicon(spark, out_dir, batch_terms, c)

    # running collection stats (drift covered by bound_slack at merge)
    batch_len = (src.select(F.size(F.regexp_extract_all(
        F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias("l"))
        .agg(F.sum("l")).collect()[0][0] or 0)
    n_docs = c["n_docs"] + n
    coll_len = c["coll_len"] + int(batch_len)
    avgdl = coll_len / n_docs

    bdir = os.path.join(out_dir, "batches", f"b{len(c['batches']):05d}")
    build_index(spark, ids, bdir, codec=codec,
                docs_per_shard=docs_per_shard, text_from_html=True,
                doc_id_col="doc_id", shared_lexicon=lex,
                global_stats=(n_docs, avgdl), extractor=extractor)
    if positions:
        # src already carries the SAME extracted text the build
        # tokenized (extract_text_udf(extractor)); runs before the
        # counters commit so a crash replays the whole batch
        from irkit_spark.operators.positions import build_positions
        build_positions(spark, src, bdir, doc_id_col="doc_id")
    c.update({"n_docs": n_docs, "coll_len": coll_len,
              "next_doc_id": c["next_doc_id"] + n})
    c["batches"].append(bdir)
    if epoch_id is not None:
        c.setdefault("epochs", []).append(epoch_id)
    _save_counters(out_dir, c)
    batch_df.unpersist()
    return c


def ingest_available_now(spark: SparkSession, input_dir: str,
                         out_dir: str, docs_per_shard: int = 100000,
                         codec: str = "varbyte",
                         merge: bool = True,
                         extractor: str = "frozen",
                         positions: bool = False) -> dict:
    """Process every file currently in `input_dir` (exactly-once via the
    stream checkpoint), then merge all batch indexes into
    `out_dir/current`. Re-running after new files arrive ingests only
    the new ones and re-merges. `extractor` must stay the same across
    every run against one out_dir (merge enforces it via stats); so
    must `positions` (a mixed batch set fails the merge loudly —
    backfill with build_positions on the old batches to switch on)."""
    ckpt = os.path.join(_state_dir(out_dir), "checkpoint")
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", "64")
              .parquet(input_dir))
    q = (stream.writeStream
         .foreachBatch(lambda df, epoch: process_batch(
             spark, df, out_dir, docs_per_shard, codec, epoch_id=epoch,
             extractor=extractor, positions=positions))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    c = _load_counters(out_dir)
    if merge and c["batches"]:
        merge_indexes(spark, c["batches"],
                      os.path.join(out_dir, "current"))
    return c


def streaming_term_counts(pages: DataFrame, window: str = "1 day",
                          watermark: str = "1 day",
                          text_col: str = "text") -> DataFrame:
    """Trending terms at ingest: tumbling-window term counts over a
    pages READSTREAM — (window_start, term, n_docs, n_occurrences),
    windowed on warc_ts with a watermark so closed windows' state
    drops (the crawl-monitoring op: which terms surged this window).
    With an availableNow run over a static input it produces exactly
    the batch twin `batch_term_counts` rows (tested).

    Scale shape: the per-batch explode emits (ts, term) pairs only
    (the frozen tokenizer expression, JVM-side — no Python in the
    stream) and the windowed aggregate is a standard partial+final
    hash aggregate keyed by (window, term); state is bounded by
    vocab x open windows."""
    from irkit_spark.config import TOKEN_RE
    toks = pages.select(
        F.col("warc_ts").cast("timestamp").alias("ts"),
        F.array_distinct(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)).alias("td"),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0).alias("ta"))
    per_doc = toks.select(
        "ts", F.explode("ta").alias("term"),
        F.lit(0).alias("_d")).unionByName(
        toks.select("ts", F.explode("td").alias("term"),
                    F.lit(1).alias("_d")))
    return (per_doc.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "term")
            .agg(F.sum("_d").cast("long").alias("n_docs"),
                 F.sum(1 - F.col("_d")).cast("long")
                 .alias("n_occurrences"))
            .select(F.col("w.start").alias("window_start"), "term",
                    "n_docs", "n_occurrences"))


def batch_term_counts(pages: DataFrame, window: str = "1 day",
                      text_col: str = "text") -> DataFrame:
    """The batch twin of streaming_term_counts (same expressions, no
    watermark) — and the comparison target in tests."""
    from irkit_spark.config import TOKEN_RE
    ta = F.regexp_extract_all(F.lower(F.col(text_col)),
                              F.lit(TOKEN_RE), 0)
    occ = pages.select(F.col("warc_ts").cast("timestamp").alias("ts"),
                       F.explode(ta).alias("term"))
    docs = pages.select(F.col("warc_ts").cast("timestamp").alias("ts"),
                        F.explode(F.array_distinct(ta)).alias("term"))
    o = (occ.groupBy(F.window("ts", window).alias("w"), "term")
         .agg(F.count("*").cast("long").alias("n_occurrences")))
    d = (docs.groupBy(F.window("ts", window).alias("w"), "term")
         .agg(F.count("*").cast("long").alias("n_docs")))
    return (o.join(d, ["w", "term"])
            .select(F.col("w.start").alias("window_start"), "term",
                    "n_docs", "n_occurrences"))
