"""Retrieval-effectiveness evaluation — the trec_eval analog.

irkit is a research IR toolkit: its run output (SURVEY.md O3, TREC
format via tools/irk-query) exists to be scored against relevance
judgments. This operator closes that loop engine-side: given a run
(qid, doc_id, score) and graded qrels (qid, doc_id, rel), compute the
standard effectiveness metrics per query and their means — entirely as
DataFrame aggregations (joins + windows + groupBy; zero Python in the
hot path), so a million-query sweep is one shuffle by qid.

Metrics (trec_eval definitions, depth k):

    P@k       = |{top-k docs with rel > 0}| / k
    Recall@k  = |{top-k docs with rel > 0}| / R
    AP@k      = sum_{r<=k, doc_r relevant} Precision@r / R
    RR@k      = 1 / rank of the first relevant doc (0 if none in top-k)
    nDCG@k    = DCG@k / IDCG@k,
                DCG@k = sum_{r<=k} (2^rel_r - 1) / log2(r + 1)

where R = |{rel > 0 judged docs}| for the query and IDCG is the DCG of
the judgments sorted by (rel DESC, doc_id) — a deterministic ideal
ordering. Ranks come from (score DESC, doc_id ASC), the engine's own
top-k tie-break, so evaluating a search()/batch_search() run reproduces
the served ordering exactly. Queries with no rel>0 judgments are
dropped (trec_eval's convention); unjudged retrieved docs count as
non-relevant. log2 is computed as ln(x)/ln(2) in both the Spark path
and the DuckDB oracle, keeping the float contract identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LN2 = "0.6931471805599453"     # ln(2) literal, identical in SQL text


def evaluate_run(run: DataFrame, qrels: DataFrame, k: int = 10,
                 round_dp: int = 6) -> DataFrame:
    """Per-query metrics: (qid, p_at_k, recall_at_k, ap, rr, ndcg).

    run:   (qid, doc_id, score) — extra columns ignored; ranks are
           recomputed as row_number over (score DESC, doc_id) so a
           stored TREC run and a live search() result score alike.
    qrels: (qid, doc_id, rel) — graded, rel >= 0; duplicates are an
           error upstream (one judgment per (qid, doc_id)).

    Scale shape: one shuffle by qid for the windows, one broadcast-able
    per-query totals join; output is |queries| rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    run = run.select("qid", "doc_id", "score")
    qrels = qrels.select("qid", "doc_id",
                         F.col("rel").cast("double").alias("rel"))

    # per-query judgment totals + ideal DCG (rel DESC, doc_id tie-break)
    wq = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (qrels.withColumn("r", F.row_number().over(wq))
             .filter(F.col("r") <= k)
             .groupBy("qid")
             .agg(F.sum((F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                        / (F.log(F.col("r") + 1.0) / F.lit(float(_LN2))))
                  .alias("idcg")))
    totals = (qrels.groupBy("qid")
              .agg(F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
                   .alias("n_rel"))
              .filter(F.col("n_rel") > 0)
              .join(ideal, "qid"))

    wr = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    wcum = (Window.partitionBy("qid").orderBy("rank")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = (run.withColumn("rank", F.row_number().over(wr))
              .filter(F.col("rank") <= k)
              .join(qrels, ["qid", "doc_id"], "left")
              .fillna(0.0, ["rel"])
              .withColumn("hit", F.when(F.col("rel") > 0, 1.0)
                          .otherwise(0.0))
              .withColumn("cum_hits", F.sum("hit").over(wcum)))
    per_q = (ranked.groupBy("qid").agg(
        F.sum("hit").alias("hits"),
        F.sum(F.col("hit") * F.col("cum_hits") / F.col("rank"))
        .alias("ap_num"),
        F.max(F.col("hit") / F.col("rank")).alias("rr"),
        F.sum((F.pow(F.lit(2.0), F.col("rel")) - 1.0)
              / (F.log(F.col("rank") + 1.0) / F.lit(float(_LN2))))
        .alias("dcg")))
    return (totals.join(per_q, "qid", "left")
            .fillna(0.0, ["hits", "ap_num", "rr", "dcg"])
            .select(
                "qid",
                F.round(F.col("hits") / k, round_dp).alias("p_at_k"),
                F.round(F.col("hits") / F.col("n_rel"),
                        round_dp).alias("recall_at_k"),
                F.round(F.col("ap_num") / F.col("n_rel"),
                        round_dp).alias("ap"),
                F.round(F.col("rr"), round_dp).alias("rr"),
                F.round(F.col("dcg") / F.col("idcg"),
                        round_dp).alias("ndcg")))


def mean_metrics(per_query: DataFrame, round_dp: int = 6) -> DataFrame:
    """One-row means over evaluate_run's output: (n_queries, p_at_k,
    recall_at_k, map, mrr, ndcg) — the trec_eval summary block."""
    return per_query.agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("p_at_k"), round_dp).alias("p_at_k"),
        F.round(F.avg("recall_at_k"), round_dp).alias("recall_at_k"),
        F.round(F.avg("ap"), round_dp).alias("map"),
        F.round(F.avg("rr"), round_dp).alias("mrr"),
        F.round(F.avg("ndcg"), round_dp).alias("ndcg"))


def evaluate_trec_file(spark, run_path: str, qrels_path: str,
                       k: int = 10) -> DataFrame:
    """Evaluate TREC-format text files: run lines 'qid Q0 doc rank
    score tag', qrels lines 'qid 0 doc rel' — the trec_eval CLI
    contract, read distributed (spark.read.csv with whitespace sep)."""
    run = (spark.read.csv(run_path, sep=" ")
           .select(F.col("_c0").alias("qid"),
                   F.col("_c2").cast("long").alias("doc_id"),
                   F.col("_c4").cast("double").alias("score")))
    qrels = (spark.read.csv(qrels_path, sep=" ")
             .select(F.col("_c0").alias("qid"),
                     F.col("_c2").cast("long").alias("doc_id"),
                     F.col("_c3").cast("double").alias("rel")))
    return evaluate_run(run, qrels, k=k)
