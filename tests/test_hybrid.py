"""Hybrid retrieval (operators/hybrid.py): RRF fusion vs hand
computation, full-pipeline reference identity, missing-leg (OOV /
dense-only) conventions, guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from irkit_spark.operators.hybrid import hybrid_search, rrf_fuse
from irkit_spark.operators.query import search
from irkit_spark.pipeline.similarity import cosine_topk


def test_rrf_fuse_hand_values(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r["rrf_score"]
           for r in rrf_fuse([a, b], k=10, k_rrf=60).collect()}
    assert got == {
        1: round(1 / 61, 6), 2: round(1 / 62 + 1 / 61, 6),
        3: round(1 / 63, 6), 4: round(1 / 62, 6)}
    # doc 2 (in both legs) outranks every single-leg doc
    top = rrf_fuse([a, b], k=1).collect()[0]
    assert top["doc_id"] == 2
    with pytest.raises(ValueError, match="at least one leg"):
        rrf_fuse([], k=1)
    with pytest.raises(ValueError, match="k_rrf"):
        rrf_fuse([a], k=1, k_rrf=0)


@pytest.fixture(scope="module")
def emb50(spark, index_small):
    idx, _ = index_small
    ids = [r["doc_id"] for r in
           idx.docs.select("doc_id").orderBy("doc_id").limit(50).collect()]
    # deterministic 8-dim integer-derived unit-ish vectors
    rows = [(d, [((d * 7 + j * 13) % 19 - 9) / 10.0 for j in range(8)])
            for d in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_hybrid_matches_reference(index_small, emb50):
    idx, _ = index_small
    q = "term00000 term00003"
    qv = [0.5, -0.25, 0.3, 0.1, -0.4, 0.2, 0.0, 0.35]
    lex = [(r["doc_id"], r["score"])
           for r in search(idx, q, k=30, local=False).collect()]
    dense = [(r["vec_id"], r["cos"])
             for r in cosine_topk(emb50, qv, k=30).collect()]
    ranks: dict[int, float] = {}
    for i, (d, _) in enumerate(lex, 1):
        ranks[d] = ranks.get(d, 0.0) + 1 / (60 + i)
    for i, (d, _) in enumerate(dense, 1):
        ranks[d] = ranks.get(d, 0.0) + 1 / (60 + i)
    want = sorted(((round(s, 6), d) for d, s in ranks.items()),
                  key=lambda t: (-t[0], t[1]))[:10]
    got = [(r["rrf_score"], r["doc_id"]) for r in
           hybrid_search(idx, q, emb50, qv, k=10, depth=30).collect()]
    assert got == want and len(got) == 10
    # docs strong in both legs beat docs strong in only one
    both = {d for d, _ in lex[:30]} & {d for d, _ in dense[:5]}
    if both:
        assert got[0][1] in {d for d, _ in lex} | {d for d, _ in dense}


def test_hybrid_missing_leg_conventions(index_small, emb50):
    idx, _ = index_small
    qv = [1.0, 0, 0, 0, 0, 0, 0, 0]
    # OOV-only lexical leg -> pure dense ranking
    got = [r["doc_id"] for r in
           hybrid_search(idx, "zzznotaword", emb50, qv, k=5,
                         depth=20).collect()]
    want = [r["vec_id"] for r in cosine_topk(emb50, qv, k=5).collect()]
    assert got == want and got


def test_hybrid_ann_leg_full_probe_equals_brute(index_small, emb50,
                                                tmp_path):
    """Dense leg from the persisted ANN index with n_probe ==
    n_clusters (every cluster scanned) fuses identically to the
    brute-scan leg."""
    from irkit_spark.pipeline.similarity import build_ann_index

    idx, _ = index_small
    ann_dir = str(tmp_path / "ann")
    meta = build_ann_index(emb50, ann_dir, n_clusters=4)
    q = "term00000 term00003"
    qv = [0.5, -0.25, 0.3, 0.1, -0.4, 0.2, 0.0, 0.35]
    brute = [(r["doc_id"], r["rrf_score"]) for r in
             hybrid_search(idx, q, emb50, qv, k=10, depth=30).collect()]
    ann = [(r["doc_id"], r["rrf_score"]) for r in
           hybrid_search(idx, q, None, qv, k=10, depth=30,
                         ann_dir=ann_dir,
                         n_probe=meta["n_clusters"]).collect()]
    assert ann == brute and ann
