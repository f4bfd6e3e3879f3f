"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k (the oracle-checkable baseline) stays fully
JVM-side via zip_with/aggregate in double precision. The scale path is
random-hyperplane LSH: signature via one matmul in a pandas UDF,
candidates from a bucket groupBy (shuffle bounded by #buckets), exact
re-scoring of candidates only — the IVF/LSH shape that survives 10^9+
vectors where brute force can't.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PLANES = 16           # 16-bit LSH signature
_PLANE_SEED = 42


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((dim, N_PLANES))


def _cos_expr(vec_col, qlit):
    """Double-precision cosine between an array<float> column and a
    literal query vector — built-in functions only."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.array(*[F.lit(float(x)).cast("double") for x in qlit])
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nq = float(np.sqrt(np.sum(np.asarray(qlit, dtype=np.float64) ** 2)))
    return dot / (nv * F.lit(nq))


def cosine_topk(emb: DataFrame, query_vec, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_dp: int = 6) -> DataFrame:
    """Brute-force cosine top-k: one scan, no shuffle until the final
    tiny orderBy/limit. (vec_id, cos)."""
    return (emb.select(F.col(id_col).alias("vec_id"),
                       F.round(_cos_expr(vec_col, query_vec), round_dp)
                       .alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(k))


def lsh_signatures(emb: DataFrame, dim: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(vec_id, sig): sign-of-projection 16-bit bucket id."""
    planes = _planes(dim)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                    "sig": pd.Series([], dtype="int32")})
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = m @ planes
            bits = (proj > 0).astype(np.int64)
            sig = (bits << np.arange(N_PLANES)).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col].astype("int64"),
                                "sig": sig.astype("int32")})

    return emb.select(id_col, vec_col).mapInPandas(
        run, "vec_id long, sig int")


def lsh_topk(emb: DataFrame, query_vec, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             probe_hamming: int = 5, round_dp: int = 6) -> DataFrame:
    """ANN top-k: multi-probe LSH — score only vectors whose signature
    is within `probe_hamming` bits of the query's. Approximate (recall
    tested against brute force in tests/test_pipeline.py)."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _planes(q.size)
    qsig = int(((q @ planes > 0).astype(np.int64)
                << np.arange(N_PLANES)).sum())
    sig = lsh_signatures(emb, q.size, id_col, vec_col)
    ham = F.bit_count(
        F.col("sig").cast("long").bitwiseXOR(F.lit(qsig).cast("long")))
    cand_ids = (sig.filter(ham <= probe_hamming)
                .select(F.col("vec_id").alias("__cid")))
    cand = emb.join(cand_ids, emb[id_col] == F.col("__cid")).drop("__cid")
    return (cand.select(F.col(id_col).alias("vec_id"),
                        F.round(_cos_expr(vec_col, query_vec), round_dp)
                        .alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(k))


def kmeans_centroids(emb: DataFrame, n_clusters: int = 16,
                     sample: int = 4096, iters: int = 10,
                     vec_col: str = "embedding") -> np.ndarray:
    """Seeded driver-side k-means on a bounded sample — the IVF coarse
    quantizer. At 10^9+ vectors the sample stays bounded (limit) and
    assignment below stays distributed; only centroids live on the
    driver."""
    rows = emb.select(vec_col).limit(sample).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(42)
    cent = x[rng.choice(len(x), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cluster): distributed nearest-centroid assignment —
    one matmul per Arrow batch."""
    cent = centroids

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                    "cluster": pd.Series([], dtype="int32")})
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                            1e-12)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].astype("int64"),
                "cluster": np.argmax(m @ cent.T, axis=1).astype("int32")})

    return emb.select(id_col, vec_col).mapInPandas(
        run, "vec_id long, cluster int")


def ivf_topk(emb: DataFrame, query_vec, k: int = 10, n_clusters: int = 16,
             n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", round_dp: int = 6,
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF ANN: score only vectors whose cluster is among the n_probe
    centroids nearest the query. Candidate selection is an equi-join on
    cluster id (partition-prunable when assignments are stored
    dir-partitioned by cluster) — the inverted-file shape that survives
    10^9+ vectors."""
    cent = (kmeans_centroids(emb, n_clusters, vec_col=vec_col)
            if centroids is None else centroids)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(cent @ qn))[:n_probe].tolist()
    assign = ivf_assign(emb, cent, id_col, vec_col)
    cand_ids = (assign.filter(F.col("cluster").isin(probes))
                .select(F.col("vec_id").alias("__cid")))
    cand = emb.join(cand_ids, emb[id_col] == F.col("__cid")).drop("__cid")
    return (cand.select(F.col(id_col).alias("vec_id"),
                        F.round(_cos_expr(vec_col, query_vec), round_dp)
                        .alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(k))


def cosine_pairs(emb: DataFrame, threshold: float = 0.3,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_dp: int = 6) -> DataFrame:
    """(vec_a, vec_b, cos): embedding near-dup pairs above threshold.
    All-pairs form (oracle / small scale); at 100 TB use lsh_signatures
    as the blocking key first — same verify expression."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"))
    norm = base.withColumn(
        "n", F.sqrt(F.aggregate(F.transform("v", lambda x: x * x),
                                F.lit(0.0), lambda a, x: a + x)))
    l = norm.select(F.col("id").alias("vec_a"), F.col("v").alias("va"),
                    F.col("n").alias("na"))
    r = norm.select(F.col("id").alias("vec_b"), F.col("v").alias("vb"),
                    F.col("n").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (l.join(r, F.col("vec_a") < F.col("vec_b"))
            .withColumn("cos", F.round(dot / (F.col("na") * F.col("nb")),
                                       round_dp))
            .filter(F.col("cos") > threshold)
            .select("vec_a", "vec_b", "cos"))
