"""Structured-Streaming incremental ingest: arriving page files ->
batch indexes -> merged serving index; exactly-once across re-runs;
results match a brute-force oracle over everything ingested."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from irkit_spark.operators.query import Index, search
from irkit_spark.operators.sqlpath import bm25_topk_text
from irkit_spark.sources.pages import pages_pandas
from irkit_spark.streaming.ingest import ingest_available_now


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inp = str(base / "incoming")
    out = str(base / "index")
    os.makedirs(inp)
    pdf = pages_pandas(600)
    # first two arrivals
    for i, sl in enumerate([slice(0, 200), slice(200, 400)]):
        spark.createDataFrame(pdf.iloc[sl]).coalesce(1) \
            .write.mode("overwrite").parquet(f"{inp}/part{i}")
    return inp, out, pdf


def test_incremental_ingest_and_late_arrivals(spark, stream_dirs):
    inp, out, pdf = stream_dirs
    c = ingest_available_now(spark, f"{inp}/part*", out,
                             docs_per_shard=200)
    assert c["n_docs"] == 400
    idx = Index(spark, os.path.join(out, "current"))
    assert idx.n_docs == 400
    assert idx.bound_slack >= 1.0

    # oracle over exactly the ingested docs, same doc_id mapping
    q = "term00001 term00080"
    docs_txt = (idx.docs.select("doc_id", "url")
                .join(spark.createDataFrame(pdf[["url", "text"]]), "url")
                .select("doc_id", "text"))
    want = [(r["doc_id"], r["score"])
            for r in bm25_topk_text(docs_txt, q, 10).collect()]
    got = [(r["doc_id"], round(r["score"], 6))
           for r in search(idx, q, 10, "wand").collect()]
    assert got == want

    # late arrival: third file lands; re-run ingests ONLY the new file
    spark.createDataFrame(pdf.iloc[400:600]).coalesce(1) \
        .write.mode("overwrite").parquet(f"{inp}/part2")
    c2 = ingest_available_now(spark, f"{inp}/part*", out,
                              docs_per_shard=200)
    assert c2["n_docs"] == 600
    assert len(c2["batches"]) == len(c["batches"]) + 1

    idx2 = Index(spark, os.path.join(out, "current"))
    assert idx2.n_docs == 600
    docs_txt2 = (idx2.docs.select("doc_id", "url")
                 .join(spark.createDataFrame(pdf[["url", "text"]]), "url")
                 .select("doc_id", "text"))
    want2 = [(r["doc_id"], r["score"])
             for r in bm25_topk_text(docs_txt2, q, 10).collect()]
    got2 = [(r["doc_id"], round(r["score"], 6))
            for r in search(idx2, q, 10, "wand").collect()]
    assert got2 == want2
    # WAND stays lossless under avgdl drift (bound_slack)
    daat2 = [(r["doc_id"], round(r["score"], 6))
             for r in search(idx2, q, 10, "daat").collect()]
    assert got2 == daat2
