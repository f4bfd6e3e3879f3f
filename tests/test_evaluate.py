"""Retrieval evaluation (operators/evaluate.py): hand-computed metric
values, a brute-force python reference over a multi-query fixture,
trec_eval edge conventions (unjudged = non-relevant, no-relevant
queries dropped, missing-from-run queries score zero), TREC file
round-trip, and an end-to-end run from the engine's own search()."""

from __future__ import annotations

import math

import pytest

from irkit_spark.operators.evaluate import (evaluate_run, evaluate_trec_file,
                                            mean_metrics)

LOG2 = math.log(2.0)


def _ref_metrics(run, qrels, k):
    """Textbook reference: run = {qid: [(doc, score)...]}, qrels =
    {qid: {doc: rel}}. Returns {qid: (p, recall, ap, rr, ndcg)}."""
    out = {}
    for qid, judged in qrels.items():
        n_rel = sum(1 for r in judged.values() if r > 0)
        if n_rel == 0:
            continue
        ranked = sorted(run.get(qid, []), key=lambda t: (-t[1], t[0]))[:k]
        hits = ap_num = dcg = 0.0
        rr = 0.0
        for i, (doc, _) in enumerate(ranked, 1):
            rel = judged.get(doc, 0)
            if rel > 0:
                hits += 1
                ap_num += hits / i
                if rr == 0.0:
                    rr = 1.0 / i
            dcg += (2.0 ** rel - 1.0) / (math.log(i + 1.0) / LOG2)
        ideal = sorted(judged.items(), key=lambda t: (-t[1], t[0]))[:k]
        idcg = sum((2.0 ** rel - 1.0) / (math.log(i + 1.0) / LOG2)
                   for i, (_, rel) in enumerate(ideal, 1))
        out[qid] = tuple(round(v, 6) for v in (
            hits / k, hits / n_rel, ap_num / n_rel, rr,
            dcg / idcg if idcg else 0.0))
    return out


def _spark_metrics(spark, run, qrels, k):
    run_df = spark.createDataFrame(
        [(q, d, float(s)) for q, rs in run.items() for d, s in rs],
        "qid string, doc_id long, score double")
    qrels_df = spark.createDataFrame(
        [(q, d, float(r)) for q, js in qrels.items() for d, r in js.items()],
        "qid string, doc_id long, rel double")
    rows = evaluate_run(run_df, qrels_df, k=k).collect()
    return {r["qid"]: (r["p_at_k"], r["recall_at_k"], r["ap"], r["rr"],
                       r["ndcg"]) for r in rows}


def test_hand_computed_values(spark):
    # docs 1 and 2 relevant; run retrieves 1, 3, 2 -> P@3 = 2/3,
    # AP = (1/1 + 2/3)/2, RR = 1, nDCG = (1 + 1/log2(4)) / (1 + 1/log2(3))
    run = {"q": [(1, 3.0), (3, 2.0), (2, 1.0)]}
    qrels = {"q": {1: 1, 2: 1}}
    got = _spark_metrics(spark, run, qrels, k=3)
    dcg = 1.0 + 1.0 / (math.log(4.0) / LOG2)
    idcg = 1.0 + 1.0 / (math.log(3.0) / LOG2)
    assert got["q"] == (round(2 / 3, 6), 1.0, round((1 + 2 / 3) / 2, 6),
                        1.0, round(dcg / idcg, 6))


def test_graded_ndcg_prefers_high_rel_first(spark):
    # same hit set, swapped order: the run placing rel=2 first wins
    qrels = {"a": {1: 2, 2: 1}, "b": {1: 2, 2: 1}}
    run = {"a": [(1, 9.0), (2, 8.0)], "b": [(2, 9.0), (1, 8.0)]}
    got = _spark_metrics(spark, run, qrels, k=2)
    assert got["a"][4] == 1.0 and got["b"][4] < 1.0
    assert got == _ref_metrics(run, qrels, 2)


def test_reference_identity_multi_query(spark):
    # deterministic pseudo-random fixture: 6 queries x 30 docs
    run, qrels = {}, {}
    for q in range(6):
        qid = f"q{q}"
        run[qid] = [(d, float((d * 7 + q * 13) % 29) + d / 100.0)
                    for d in range(30) if (d + q) % 3 != 0]
        qrels[qid] = {d: (d * 11 + q * 5) % 4 for d in range(30)
                      if (d * 3 + q) % 4 == 0}
    for k in (5, 10):
        assert _spark_metrics(spark, run, qrels, k) == \
            _ref_metrics(run, qrels, k)


def test_trec_conventions(spark):
    run = {"has_rel": [(1, 2.0), (2, 1.0)],
           "no_rel_retrieved": [(9, 1.0)],
           "unjudged_only": [(7, 1.0)]}
    qrels = {"has_rel": {1: 1},
             "no_rel_retrieved": {3: 1},
             "all_zero": {5: 0},             # no rel>0 -> dropped
             "not_in_run": {6: 2}}           # scored, all zeros
    got = _spark_metrics(spark, run, qrels, k=5)
    assert set(got) == {"has_rel", "no_rel_retrieved", "not_in_run"}
    assert got["no_rel_retrieved"] == (0.0, 0.0, 0.0, 0.0, 0.0)
    assert got["not_in_run"] == (0.0, 0.0, 0.0, 0.0, 0.0)
    assert got["has_rel"][0] == 0.2 and got["has_rel"][3] == 1.0


def test_mean_metrics(spark):
    run = {"a": [(1, 2.0)], "b": [(2, 2.0)]}
    qrels = {"a": {1: 1}, "b": {3: 1}}
    per_q = evaluate_run(
        spark.createDataFrame(
            [(q, d, s) for q, rs in run.items() for d, s in rs],
            "qid string, doc_id long, score double"),
        spark.createDataFrame(
            [(q, d, float(r)) for q, js in qrels.items()
             for d, r in js.items()],
            "qid string, doc_id long, rel double"), k=1)
    m = mean_metrics(per_q).collect()[0]
    assert m["n_queries"] == 2 and m["p_at_k"] == 0.5 \
        and m["map"] == 0.5 and m["mrr"] == 0.5 and m["ndcg"] == 0.5


def test_trec_file_round_trip(spark, tmp_path):
    run = {"q1": [(1, 3.0), (3, 2.0), (2, 1.0)], "q2": [(4, 1.0)]}
    qrels = {"q1": {1: 1, 2: 2}, "q2": {4: 1, 5: 1}}
    run_path = tmp_path / "run.txt"
    run_path.write_text("".join(
        f"{q} Q0 {d} {i} {s:.6f} irkit_spark\n"
        for q, rs in run.items() for i, (d, s) in enumerate(rs, 1)))
    qrels_path = tmp_path / "qrels.txt"
    qrels_path.write_text("".join(
        f"{q} 0 {d} {r}\n" for q, js in qrels.items()
        for d, r in js.items()))
    got = {r["qid"]: (r["p_at_k"], r["recall_at_k"], r["ap"], r["rr"],
                      r["ndcg"])
           for r in evaluate_trec_file(spark, str(run_path),
                                       str(qrels_path), k=3).collect()}
    assert got == _ref_metrics(run, qrels, 3)


def test_engine_run_end_to_end(spark, index_small, pages_small):
    # score the engine's own batch run against term-presence qrels
    import pandas as pd
    from pyspark.sql import functions as F

    from irkit_spark.functions.extract import EXTRACTORS
    from irkit_spark.operators import sqlpath as sp
    from irkit_spark.operators.query import batch_search

    idx, _ = index_small
    queries = {"qa": "term00000 term00007", "qb": "term00123"}
    run_df = (batch_search(idx, queries, k=10, mode="wand")
              .select(F.col("query_id").alias("qid"), "doc_id", "score"))
    ext = EXTRACTORS["frozen"]

    def extr(it):
        for pdf in it:
            yield pd.DataFrame({"url": pdf["url"],
                                "text": [ext(h) for h in pdf["html"]]})
    src = pages_small.mapInPandas(extr, "url string, text string")
    docs = idx.docs.select("doc_id", "url").join(src, "url")
    tf = sp.term_freqs(docs)
    parts = []
    for qid, q in queries.items():
        parts.append(tf.filter(F.col("term").isin(q.split()))
                     .groupBy("doc_id")
                     .agg(F.countDistinct("term").cast("double")
                          .alias("rel"))
                     .withColumn("qid", F.lit(qid))
                     .select("qid", "doc_id", "rel"))
    qrels_df = parts[0].unionByName(parts[1])
    got = {r["qid"]: (r["p_at_k"], r["recall_at_k"], r["ap"], r["rr"],
                      r["ndcg"])
           for r in evaluate_run(run_df, qrels_df, k=10).collect()}
    run = {}
    for r in run_df.collect():
        run.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    qrels = {}
    for r in qrels_df.collect():
        qrels.setdefault(r["qid"], {})[r["doc_id"]] = r["rel"]
    assert got == _ref_metrics(run, qrels, 10) and len(got) == 2


def test_guards(spark):
    df = spark.createDataFrame([("q", 1, 1.0)],
                               "qid string, doc_id long, score double")
    qr = spark.createDataFrame([("q", 1, 1.0)],
                               "qid string, doc_id long, rel double")
    with pytest.raises(ValueError, match="k must be"):
        evaluate_run(df, qr, k=0)
