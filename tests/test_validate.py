"""verify_index invariant checker: green on a clean build (fast +
deep tiers), red on injected corruptions, green on a quantized build
(max_score bound semantics shared)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from irkit_spark.operators.build import build_index
from irkit_spark.operators.validate import verify_index


def test_verify_clean_index(spark, index_small):
    idx, _ = index_small
    r = verify_index(spark, idx.path, deep=True)
    assert r["ok"], r
    assert set(r["checks"]) == {"docs_stats", "docs_unique",
                                "postings_unique", "df_consistent",
                                "cf_consistent", "max_norm",
                                "lineage_done", "deep_blocks"}


def test_verify_quantized_index(spark, pages_small, tmp_path):
    out = str(tmp_path / "qidx")
    build_index(spark, pages_small.limit(300), out, docs_per_shard=150,
                text_from_html=True, quantize=True)
    r = verify_index(spark, out, deep=True)
    assert r["ok"], r


def test_verify_catches_corruption(spark, index_small, tmp_path):
    idx, _ = index_small
    out = str(tmp_path / "bad")
    shutil.copytree(idx.path, out)

    # corrupt terms: bump one df
    terms = spark.read.parquet(os.path.join(out, "terms")).cache()
    terms.count()
    tampered = terms.withColumn(
        "df", F.when(F.col("term_id") == 0, F.col("df") + 1)
        .otherwise(F.col("df")))
    tampered.write.mode("overwrite").parquet(os.path.join(out, "terms"))
    r = verify_index(spark, out)
    assert not r["ok"]
    assert not r["checks"]["df_consistent"]["ok"]
    # max_score was computed from the true df, so the recompute with
    # the tampered df must also trip
    assert not r["checks"]["max_norm"]["ok"]
    assert r["checks"]["cf_consistent"]["ok"]

    # corrupt postings block metadata: shift one block's last_doc
    out2 = str(tmp_path / "bad2")
    shutil.copytree(idx.path, out2)
    post = spark.read.parquet(os.path.join(out2, "postings")).cache()
    post.count()
    bad = post.withColumn(
        "blocks", F.when(
            F.col("term_id") == 0,
            F.transform("blocks", lambda b: b.withField(
                "last_doc", b["last_doc"] + 1)))
        .otherwise(F.col("blocks")))
    bad.write.mode("overwrite").parquet(os.path.join(out2, "postings"))
    r2 = verify_index(spark, out2, deep=True)
    assert not r2["ok"]
    assert not r2["checks"]["deep_blocks"]["ok"]
    assert r2["checks"]["deep_blocks"]["bad_posting_rows"] >= 1


def test_verify_catches_stats_drift(spark, index_small, tmp_path):
    idx, _ = index_small
    out = str(tmp_path / "drift")
    shutil.copytree(idx.path, out)
    docs = spark.read.parquet(os.path.join(out, "docs")).cache()
    docs.count()
    # drop one doc row: docs-vs-stats and df-vs-postings both still
    # agree, but docs_stats must trip on the count
    docs.filter(F.col("doc_id") != 0).write.mode("overwrite") \
        .parquet(os.path.join(out, "docs"))
    r = verify_index(spark, out)
    assert not r["ok"]
    assert not r["checks"]["docs_stats"]["ok"]
