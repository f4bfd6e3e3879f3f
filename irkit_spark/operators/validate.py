"""Index invariant checker (`irkit_spark verify` CLI).

The ops counterpart to resumable builds/merges: after a crash-resume,
a merge, or an incremental ingest lands, confirm the artifact bundle
is internally consistent BEFORE serving from it. Every check is a
narrow distributed aggregate (no driver collect of bulk data); the
opt-in deep check decodes every posting block once — a full scan, the
same cost class as one TAAT query over the whole vocabulary.

Checks (fast tier):
  docs_stats        n_docs / coll_len / avgdl in stats == docs table
  docs_unique       doc_id unique; partition_id == doc_id // docs_per_shard
  postings_unique   (term_id, partition_id) unique
  df_consistent     terms.df == sum over shards of postings.n_docs
  cf_consistent     terms.cf == sum over shards of postings.cf
  max_norm          terms.max_score == idf(df) * max(shard max_norm)
                    within fp tolerance (x bound_slack for merged)
  lineage_done      every lineage row status == 'done'
Deep tier (--deep): decode every block; per row assert block doc ids
strictly increasing, spans within block first/last, counts match, tfs
positive (or impacts in [0,127] for quantized), stored per-block
max <= row max_norm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def verify_index(spark: SparkSession, path: str,
                 table_format: str | None = None,
                 deep: bool = False) -> dict:
    """Returns {"ok": bool, "checks": {name: {"ok": bool, ...}}}."""
    from irkit_spark.sources.catalog import artifact_format, read_artifact
    fmt = artifact_format(table_format)
    st = read_artifact(spark, path, "stats", fmt=fmt).collect()[0]
    docs = read_artifact(spark, path, "docs", fmt=fmt)
    postings = read_artifact(spark, path, "postings", fmt=fmt)
    terms = read_artifact(spark, path, "terms", fmt=fmt)
    docs_per_shard = int(st["docs_per_shard"])
    checks: dict[str, dict] = {}

    def rec(name, ok, **details):
        checks[name] = {"ok": bool(ok), **details}

    # -- docs vs stats (one agg) --------------------------------------
    g = docs.agg(F.count("*").alias("n"),
                 F.countDistinct("doc_id").alias("nd"),
                 F.sum("doc_len").alias("l"),
                 F.sum(F.when(F.col("partition_id") !=
                              (F.col("doc_id") /
                               docs_per_shard).cast("int"), 1)
                       .otherwise(0)).alias("bad_shard")).collect()[0]
    n, coll = int(g["n"]), int(g["l"] or 0)
    rec("docs_stats",
        n == int(st["n_docs"]) and coll == int(st["coll_len"])
        and abs(coll / max(n, 1) - float(st["avg_doc_len"])) < 1e-9,
        docs_rows=n, stats_n_docs=int(st["n_docs"]),
        docs_coll_len=coll, stats_coll_len=int(st["coll_len"]))
    rec("docs_unique", int(g["nd"]) == n and int(g["bad_shard"]) == 0,
        duplicate_ids=n - int(g["nd"]),
        misplaced_rows=int(g["bad_shard"]))

    # -- postings key uniqueness + per-term sums (one agg) ------------
    pg = (postings.groupBy("term_id")
          .agg(F.count("*").alias("rows"),
               F.countDistinct("partition_id").alias("shards"),
               F.sum("n_docs").alias("df"),
               F.sum("cf").alias("cf"),
               F.max("max_norm").alias("mx")))
    dup = pg.filter(F.col("rows") != F.col("shards")).count()
    rec("postings_unique", dup == 0, terms_with_dup_shard_rows=dup)

    # -- terms vs postings: df / cf / max_score ------------------------
    # terms built under a shared lexicon may legitimately carry df=0
    # rows (lexicon term absent from this batch's docs) -> missing
    # postings aggregate counts as 0. max_score = idf * max(max_norm),
    # float32-stored (formula per build stage 4 / merge terms_final;
    # bound_slack applies at query time, not here).
    j = (terms.join(pg, "term_id", "full")
         .select("term_id",
                 (F.coalesce(terms["df"], F.lit(-1)) !=
                  F.coalesce(pg["df"], F.lit(0))).alias("bad_df"),
                 (F.coalesce(terms["cf"], F.lit(-1)) !=
                  F.coalesce(pg["cf"], F.lit(0))).alias("bad_cf"),
                 (F.abs(terms["max_score"] -
                        F.log1p((F.lit(float(n)) - terms["df"] + 0.5)
                                / (terms["df"] + 0.5))
                        * F.coalesce(pg["mx"], F.lit(0.0)))
                  > F.lit(1e-4) * (F.abs(terms["max_score"]) + 1.0))
                 .alias("bad_mx"))
         .agg(F.sum(F.col("bad_df").cast("int")).alias("df"),
              F.sum(F.col("bad_cf").cast("int")).alias("cf"),
              F.sum(F.col("bad_mx").cast("int")).alias("mx"))
         .collect()[0])
    rec("df_consistent", int(j["df"] or 0) == 0,
        mismatched_terms=int(j["df"] or 0))
    rec("cf_consistent", int(j["cf"] or 0) == 0,
        mismatched_terms=int(j["cf"] or 0))
    rec("max_norm", int(j["mx"] or 0) == 0,
        mismatched_terms=int(j["mx"] or 0))

    # -- lineage -------------------------------------------------------
    lin = read_artifact(spark, path, "lineage", fmt=fmt) \
        .groupBy("status").count().collect()
    bad = sum(int(r["count"]) for r in lin if r["status"] != "done")
    rec("lineage_done", bad == 0, not_done=bad)

    # -- positions (opt-in artifact): per (term, shard) n_docs/cf must
    # reconcile with postings exactly — positions re-tokenize the same
    # corpus, so drift means the source changed under the index -------
    from irkit_spark.sources.catalog import artifact_exists
    if artifact_exists(spark, path, "positions", fmt=fmt):
        from irkit_spark.operators.positions import read_positions
        pos = read_positions(spark, path, fmt) \
            .select("term_id", "partition_id",
                    F.col("n_docs").alias("p_nd"),
                    F.col("cf").alias("p_cf"))
        pj = (postings.select("term_id", "partition_id", "n_docs", "cf")
              .join(pos, ["term_id", "partition_id"], "full")
              .agg(F.sum(F.when(
                  (F.col("n_docs").isNull() | F.col("p_nd").isNull()
                   | (F.col("n_docs") != F.col("p_nd"))
                   | (F.col("cf") != F.col("p_cf"))), 1).otherwise(0))
                  .alias("bad")).collect()[0])
        rec("positions_consistent", int(pj["bad"] or 0) == 0,
            mismatched_rows=int(pj["bad"] or 0))

    # -- deletions (opt-in tombstones): unique, correctly sharded, and
    # a subset of the docs table (delete_docs guarantees all three; a
    # hand-edited or crash-corrupted artifact would break queries) ----
    from irkit_spark.operators.delete import has_deletions
    if has_deletions(spark, path, fmt):
        from irkit_spark.operators.delete import read_deletions
        dels = read_deletions(spark, path, fmt)
        dg = dels.agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("nd"),
            F.sum(F.when(F.col("partition_id") !=
                         (F.col("doc_id") /
                          docs_per_shard).cast("int"), 1)
                  .otherwise(0)).alias("bad_shard")).collect()[0]
        orphans = dels.join(docs.select("doc_id"), "doc_id",
                            "left_anti").count()
        nd_ = int(dg["n"] or 0)
        rec("deletions_consistent",
            nd_ == int(dg["nd"] or 0) and int(dg["bad_shard"] or 0) == 0
            and orphans == 0,
            n_deleted=nd_, duplicates=nd_ - int(dg["nd"] or 0),
            misplaced_rows=int(dg["bad_shard"] or 0),
            not_in_docs=int(orphans))

    # -- deep: decode every block (full scan, opt-in) -------------------
    if deep:
        codec = st["codec"]
        quantized = bool(st.asDict().get("quantized", False))

        def scan(batches):
            from irkit_spark.functions.codecs import decode_blocks_batch
            for pdf in batches:
                bad_rows = 0
                for _, r in pdf.iterrows():
                    blocks = list(r["blocks"])
                    d, t, _ = decode_blocks_batch(blocks, codec)
                    ok = (len(d) == int(r["n_docs"])
                          and bool(np.all(np.diff(d) > 0)))
                    if quantized:
                        ok = ok and bool(np.all((t >= 0) & (t <= 127)))
                    else:
                        ok = ok and bool(np.all(t >= 1))
                    off = 0
                    for blk in blocks:
                        nb = int(blk["n"])
                        ok = (ok and off + nb <= len(d)
                              and d[off] == int(blk["first_doc"])
                              and d[off + nb - 1] == int(blk["last_doc"]))
                        off += nb
                    ok = ok and off == len(d)
                    bad_rows += 0 if ok else 1
                yield pd.DataFrame({"bad": [bad_rows]})

        bad_rows = (postings.mapInPandas(scan, "bad long")
                    .agg(F.sum("bad")).collect()[0][0] or 0)
        rec("deep_blocks", int(bad_rows) == 0,
            bad_posting_rows=int(bad_rows))

    return {"ok": all(c["ok"] for c in checks.values()),
            "checks": checks}
