"""Hybrid lexical + dense retrieval via Reciprocal Rank Fusion.

The modern retrieval stack runs BM25 and embedding search side by side
and fuses the rankings; RRF (Cormack, Clarke & Buettcher, SIGIR 2009)
is the standard score-free fusion:

    rrf(d) = sum_legs 1 / (k_rrf + rank_leg(d))

with docs absent from a leg contributing nothing for it. Both legs
here are the engine's own verified parts — search() for BM25 (any
mode/scorer) and pipeline.similarity.cosine_topk for the dense leg —
and ranks use each leg's deterministic tie-break (score DESC, id ASC),
so the fused ranking is exactly DuckDB-oracleable: integer ranks into
1/(k+r) doubles, identical division text in both engines.

Scale shape: each leg is its own top-`depth` (the standard pruned
plans); the fusion joins two depth-sized frames — driver-trivial at
any corpus size. Requires the corpus convention that embedding ids and
doc ids share a key space (the documents/embeddings fixture contract);
pass `id_map` when they don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from irkit_spark.operators.query import Index, search
from irkit_spark.pipeline.similarity import cosine_topk


def rrf_fuse(legs: list[DataFrame], k: int = 10,
             k_rrf: int = 60, round_dp: int = 6) -> DataFrame:
    """Fuse ranked legs — each (doc_id, rank) — into
    (doc_id, rrf_score) top-k by (rrf DESC, doc_id)."""
    if not legs:
        raise ValueError("need at least one leg")
    if k_rrf < 1:
        raise ValueError("k_rrf must be >= 1")
    out = None
    for i, leg in enumerate(legs):
        part = leg.select("doc_id",
                          (F.lit(1.0) / (F.lit(k_rrf) + F.col("rank")))
                          .alias(f"__c{i}"))
        out = part if out is None else out.join(part, "doc_id", "full")
    contribs = [F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
                for i in range(len(legs))]
    s = contribs[0]
    for c in contribs[1:]:
        s = s + c
    return (out.select("doc_id", F.round(s, round_dp).alias("rrf_score"))
            .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
            .limit(k))


def hybrid_search(index: Index, query: str, emb: DataFrame, query_vec,
                  k: int = 10, depth: int = 100, k_rrf: int = 60,
                  mode: str = "wand", scorer: str = "bm25",
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  round_dp: int = 6,
                  ann_dir: str | None = None,
                  n_probe: int = 4) -> DataFrame:
    """(doc_id, rrf_score): RRF fusion of the BM25 top-`depth` for
    `query` and the cosine top-`depth` for `query_vec` over `emb`
    (whose id_col must carry doc ids). An OOV-only query degrades to
    the dense-only ranking and vice versa for an empty emb — RRF's
    missing-leg convention.

    ann_dir: serve the dense leg from a persisted ANN index
    (similarity.build_ann_index) instead of the brute scan — a
    partition-PRUNED read of the n_probe nearest cluster dirs, the
    10^9+-vector serving shape (`emb` is then ignored). With
    n_probe == n_clusters the probe covers every cluster, so the
    fused ranking equals the brute-leg ranking exactly (tested)."""
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (search(index, query, k=depth, mode=mode, scorer=scorer,
                  local=False)
           .withColumn("rank", F.row_number().over(wb)))
    if ann_dir is not None:
        from irkit_spark.pipeline.similarity import ann_index_topk
        dtop = ann_index_topk(index.spark, ann_dir, query_vec, k=depth,
                              n_probe=n_probe, vec_col=vec_col,
                              round_dp=round_dp)
    else:
        dtop = cosine_topk(emb, query_vec, k=depth, id_col=id_col,
                           vec_col=vec_col, round_dp=round_dp)
    wd = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    dense = (dtop.withColumn("rank", F.row_number().over(wd))
             .select(F.col("vec_id").alias("doc_id"), "rank"))
    return rrf_fuse([lex.select("doc_id", "rank"), dense], k=k,
                    k_rrf=k_rrf, round_dp=round_dp)