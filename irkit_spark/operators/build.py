"""Distributed inverted-index build (SURVEY.md §3.1, BASELINE.json:6).

Pipeline (stage per line; shuffles marked):

  pages(url, warc_ts, html, text, lang)                     [input_hint]
    -> extract: Arrow pandas_udf html->text                 (S3)
    -> doc_id:  deterministic dense two-pass assignment     (T2, 1 small shuffle)
    -> tok:     mapInPandas tokenize+count -> (doc_id, term, tf, dl)  (T1+A1,
                no explode shuffle; dl rides along so encode needs no
                doc-length join)
    -> tok checkpoint: parquet partitioned by shard         (resumability §4.4)
    -> terms:   groupBy(term).agg(df, cf) + dense term_id   (A2+T3, small shuffle)
                -> broadcast {term -> term_id} dict         [B:6]
    -> THE shuffle: repartition(n_parts, term_id, shard)
                + sortWithinPartitions(term_id, shard, doc_id)
                == the "salted repartition-by-term +
                sortWithinPartitions(term, docID)" of BASELINE.json:6,
                with salt = shard(doc_id) = doc_id // DOCS_PER_SHARD.
    -> encode:  mapInPandas streaming-group kernel: delta-gap + varbyte/
                streamvbyte blocks + per-block max tf_norm   (C1/C2/C3/C4/A5)
    -> write:   postings (dir-partitioned by shard), terms, docs, stats,
                lineage (per-shard status + metrics)         (S5, §4.4)

Skew handling (explicit, BASELINE.json:14): the salt IS the term-split —
a head term's posting list is cut into <= n_shards sub-lists, each
bounded by the shard's postings; no (term_id, shard) shuffle key can
exceed one doc-shard's occurrences of one term. skew_ratio
(shard postings / median shard postings) is logged per shard in lineage.

Why blocks store idf-free `max tf_norm` rather than full BM25 UBs: the
encode kernel knows tf and dl (carried through the shuffle) and avgdl (a
broadcast scalar), but per-term df would need a join of the token table
against `terms` — an extra 10^12-row shuffle. WAND multiplies the
broadcast per-query-term idf at query time instead; terms.max_score
(= idf * max tf_norm over all blocks) is aggregated after the encode.

Reference parity: replaces irkit's assembler/merger batch build
([pub:include/irkit/index/assembler.hpp, merger.hpp] — SURVEY.md §2.1
S4/S5, §2.7 U1); Spark's sort-shuffle is the k-way merge.
"""

from __future__ import annotations

import math
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irkit_spark import config
from irkit_spark.functions.codecs import encode_blocks
from irkit_spark.functions.extract import extract_text_udf
from irkit_spark.functions.scoring import idf as idf_fn
from irkit_spark.functions.tokenize import tokenize_count_iter
from irkit_spark.plans.dense_ids import assign_dense_ids

TOK_SCHEMA = "doc_id long, term string, tf long, dl long"
POSTINGS_SCHEMA = (
    "term_id int, partition_id int, n_docs int, "
    "blocks array<struct<first_doc: long, last_doc: long, n: int, "
    "max_score: float, doc_bytes: binary, tf_bytes: binary>>")


def tokenize_spark(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, text) -> (doc_id, term, tf, dl) with no explode shuffle."""
    src = df.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.col(text_col).alias("text"))
    return src.mapInPandas(
        lambda it: tokenize_count_iter(it, "doc_id", "text"),
        schema=TOK_SCHEMA)


def _encode_kernel(avgdl: float, codec: str, block_size: int,
                   docs_per_shard: int):
    """mapInPandas encoder: streaming (term_id, shard) group merger.

    Input batches arrive sorted by (term_id, shard, doc_id) within the
    Spark partition; a group may span Arrow batches, so the last
    (possibly incomplete) group of each batch is carried into the next.
    """
    k1, b = config.BM25_K1, config.BM25_B

    def run(batches):
        carry = None

        def encode_region(pdf: pd.DataFrame):
            t = pdf["term_id"].to_numpy()
            s = pdf["shard"].to_numpy()
            d = pdf["doc_id"].to_numpy().astype(np.uint64)
            tf = pdf["tf"].to_numpy().astype(np.uint64)
            dl = pdf["dl"].to_numpy().astype(np.float64)
            tf_norm = tf.astype(np.float64) / (
                tf + k1 * (1.0 - b + b * dl / avgdl))
            # group starts where (term_id, shard) changes
            change = np.empty(len(pdf), dtype=bool)
            change[0] = True
            change[1:] = (t[1:] != t[:-1]) | (s[1:] != s[:-1])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(pdf))
            rows = {"term_id": [], "partition_id": [], "n_docs": [],
                    "blocks": []}
            for g0, g1 in zip(starts, ends):
                rows["term_id"].append(int(t[g0]))
                rows["partition_id"].append(int(s[g0]))
                rows["n_docs"].append(int(g1 - g0))
                rows["blocks"].append(encode_blocks(
                    d[g0:g1], tf[g0:g1], tf_norm[g0:g1], block_size, codec))
            return pd.DataFrame(rows)

        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            t = pdf["term_id"].to_numpy()
            s = pdf["shard"].to_numpy()
            # split off the trailing (possibly incomplete) group
            last_t, last_s = t[-1], s[-1]
            in_last = (t == last_t) & (s == last_s)
            # find start of trailing run
            nz = np.flatnonzero(~in_last)
            cut = (nz[-1] + 1) if nz.size else 0
            carry = pdf.iloc[cut:].reset_index(drop=True)
            head = pdf.iloc[:cut]
            if len(head):
                yield encode_region(head)
        if carry is not None and len(carry):
            yield encode_region(carry)

    return run


def _term_id_mapper(bc_term_ids):
    """mapInPandas: (doc_id, term, tf, dl) -> (doc_id, term_id, tf, dl, shard)
    via the broadcast term->id dictionary (BASELINE.json:6)."""
    def run(batches):
        for pdf in batches:
            ids = pdf["term"].map(bc_term_ids.value)
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "term_id": ids.astype("int32"),
                "tf": pdf["tf"],
                "dl": pdf["dl"],
            })
            yield out
    return run


def build_index(spark: SparkSession, pages: DataFrame, out_dir: str, *,
                codec: str = config.DEFAULT_CODEC,
                block_size: int = config.BLOCK_SIZE,
                docs_per_shard: int | None = None,
                n_buckets: int = config.ID_BUCKETS,
                text_from_html: bool = False,
                key_col: str = "url",
                doc_id_col: str | None = None,
                n_parts: int | None = None,
                resume: bool = False) -> dict:
    """Build (or resume) the index; returns build metrics dict."""
    t0 = time.monotonic()
    docs_per_shard = docs_per_shard or config.DOCS_PER_SHARD
    n_parts = n_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    os.makedirs(out_dir, exist_ok=True)
    p = lambda name: os.path.join(out_dir, name)

    # ---- resume bookkeeping -------------------------------------------
    done_shards: set[int] = set()
    prev_attempts: dict[int, int] = {}
    if resume and os.path.exists(os.path.join(p("lineage"), "_SUCCESS")):
        lin = spark.read.parquet(p("lineage")).collect()
        for r in lin:
            prev_attempts[r["partition_id"]] = r["attempt"]
            if r["status"] == "done":
                done_shards.add(r["partition_id"])

    # ---- stage 1: doc ids + tokenize (or reuse checkpoint) ------------
    tok_path = p("tok")
    docs_path = p("docs")
    reuse_tok = (resume and os.path.exists(os.path.join(tok_path, "_SUCCESS"))
                 and os.path.exists(os.path.join(docs_path, "_SUCCESS")))
    if reuse_tok:
        tok = spark.read.parquet(tok_path)
        docs = spark.read.parquet(docs_path)
        docs_base = docs.select("doc_id", "url")
    else:
        src = pages
        if text_from_html:
            src = src.withColumn("text", extract_text_udf()(F.col("html")))
        if doc_id_col is None:
            src = assign_dense_ids(src, key_col, "doc_id", n_buckets)
        else:
            src = src.withColumn("doc_id", F.col(doc_id_col).cast("long"))
        docs_base = src.select(
            "doc_id", F.col(key_col).cast("string").alias("url"))
        tok = tokenize_spark(src, "doc_id", "text").withColumn(
            "shard", (F.col("doc_id") / docs_per_shard).cast("int"))
        tok.write.mode("overwrite").partitionBy("shard").parquet(tok_path)
        tok = spark.read.parquet(tok_path)
        docs = (docs_base
                .join(tok.groupBy("doc_id").agg(
                    F.first("dl").cast("int").alias("doc_len")),
                    "doc_id", "left")
                .fillna(0, ["doc_len"])
                .withColumn("partition_id",
                            (F.col("doc_id") / docs_per_shard).cast("int")))
        # dir-partitioned by shard so query-time doc-length reads prune
        docs.write.mode("overwrite").partitionBy("partition_id") \
            .parquet(docs_path)
        docs = spark.read.parquet(docs_path)

    glob = docs.agg(F.count("*").alias("n"),
                    F.sum("doc_len").alias("len")).collect()[0]
    n_docs, coll_len = int(glob["n"]), int(glob["len"] or 0)
    avgdl = coll_len / n_docs if n_docs else 1.0
    n_shards = max(1, math.ceil(n_docs / docs_per_shard))

    # ---- stage 2: lexicon + broadcast dict ----------------------------
    terms0 = tok.groupBy("term").agg(F.count("*").alias("df"),
                                     F.sum("tf").alias("cf"))
    terms = assign_dense_ids(terms0, "term", "term_id_l", n_buckets) \
        .withColumn("term_id", F.col("term_id_l").cast("int")) \
        .drop("term_id_l")
    term_rows = terms.select("term", "term_id").collect()
    bc = spark.sparkContext.broadcast({r["term"]: r["term_id"]
                                       for r in term_rows})

    # ---- stage 3: THE shuffle + encode --------------------------------
    pending = [s for s in range(n_shards) if s not in done_shards]
    tok_p = tok if not done_shards else tok.filter(F.col("shard").isin(pending))
    tok_ids = (tok_p.mapInPandas(_term_id_mapper(bc),
                                 schema="doc_id long, term_id int, "
                                        "tf long, dl long")
               .withColumn("shard",
                           (F.col("doc_id") / docs_per_shard).cast("int")))
    enc_in = (tok_ids
              .repartition(n_parts, "term_id", "shard")
              .sortWithinPartitions("term_id", "shard", "doc_id"))
    postings_new = enc_in.mapInPandas(
        _encode_kernel(avgdl, codec, block_size, docs_per_shard),
        schema=POSTINGS_SCHEMA)

    post_path = p("postings")
    if pending:
        # dynamic = keep done shard dirs on resume; static = clean rebuild
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic" if done_shards else "static")
        postings_new.write.mode("overwrite") \
            .partitionBy("partition_id").parquet(post_path)
    postings = spark.read.parquet(post_path)

    # ---- stage 4: terms.max_score + final small tables ----------------
    per_term_max = (postings
                    .select("term_id",
                            F.array_max(F.transform(
                                "blocks", lambda blk: blk["max_score"]))
                            .alias("mx"))
                    .groupBy("term_id").agg(F.max("mx").alias("max_norm")))
    terms_final = (terms.join(per_term_max, "term_id", "left")
                   .withColumn("idf", F.log1p(
                       (F.lit(float(n_docs)) - F.col("df") + 0.5)
                       / (F.col("df") + 0.5)))
                   .withColumn("max_score",
                               (F.col("idf") * F.coalesce("max_norm",
                                                          F.lit(0.0)))
                               .cast("float"))
                   .select("term_id", "term", "df", "cf", "max_score"))
    terms_final.write.mode("overwrite").parquet(p("terms"))

    wall_ms = int((time.monotonic() - t0) * 1000)
    total_postings = postings.agg(F.sum("n_docs")).collect()[0][0] or 0

    # ---- stage 5: lineage + stats (per-shard metrics, §4.4) ------------
    shard_m = (postings.groupBy("partition_id")
               .agg(F.sum("n_docs").alias("postings_cnt"),
                    F.sum(F.aggregate(
                        "blocks", F.lit(0).cast("long"),
                        lambda acc, blk: acc + F.length(blk["doc_bytes"])
                        + F.length(blk["tf_bytes"]))).alias("bytes"))
               .collect())
    cnts = sorted(r["postings_cnt"] for r in shard_m) or [0]
    med = cnts[len(cnts) // 2] or 1
    lineage_rows = [
        (int(r["partition_id"]), "done", int(r["postings_cnt"]),
         int(r["bytes"]), float(r["postings_cnt"] / med), wall_ms,
         prev_attempts.get(int(r["partition_id"]), 0)
         + (1 if int(r["partition_id"]) in pending or not prev_attempts
            else 0))
        for r in shard_m]
    spark.createDataFrame(
        lineage_rows,
        "partition_id int, status string, postings_cnt long, bytes long, "
        "skew_ratio double, wall_ms long, attempt int") \
        .write.mode("overwrite").parquet(p("lineage"))

    stats_row = [(n_docs, float(avgdl), int(coll_len), int(total_postings),
                  codec, int(block_size), int(docs_per_shard), int(n_shards),
                  wall_ms)]
    spark.createDataFrame(
        stats_row,
        "n_docs long, avg_doc_len double, coll_len long, total_postings long, "
        "codec string, block_size int, docs_per_shard int, n_shards int, "
        "wall_ms long") \
        .withColumn("built_at", F.current_timestamp()) \
        .write.mode("overwrite").parquet(p("stats"))

    return {"n_docs": n_docs, "avgdl": avgdl, "n_shards": n_shards,
            "total_postings": int(total_postings), "wall_ms": wall_ms,
            "postings_per_sec": (total_postings / (wall_ms / 1000.0)
                                 if wall_ms else 0.0),
            "skew_ratio": float(max(cnts) / med),
            "bytes_per_posting": (sum(r["bytes"] for r in shard_m)
                                  / max(1, total_postings)),
            "rebuilt_shards": pending}
