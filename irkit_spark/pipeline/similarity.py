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
    quantizer. At 10^9+ vectors the sample stays bounded and assignment
    below stays distributed; only centroids live on the driver.

    The sample is drawn ACROSS partitions (seeded hash of vec_id /
    deterministic per-partition Bernoulli), never `.limit()` — a limit
    short-circuits to the first partitions, so at corpus scale the
    centroids would be trained on whatever corner of the data sorts
    first."""
    total = emb.count()
    if total > sample:
        # Bernoulli-sample ~1.5x the target across ALL partitions, then
        # trim to `sample` with a seeded driver-side choice (a .limit()
        # here would re-introduce the first-partitions bias)
        frac = min(1.0, 1.5 * sample / total)
        rows = emb.select(vec_col).sample(fraction=frac, seed=42).collect()
        if len(rows) > sample:
            sel = np.random.default_rng(42).choice(
                len(rows), size=sample, replace=False)
            rows = [rows[i] for i in sel]
    else:
        rows = emb.select(vec_col).collect()
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


def _dim_of(emb: DataFrame, vec_col: str) -> int:
    return int(emb.select(F.size(vec_col)).first()[0])


def lsh_band_signatures(emb: DataFrame, dim: int, band_bits: int = 4,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(vec_id, band, bsig): the N_PLANES sign bits split into bands of
    `band_bits` — the pair-blocking keys (two vectors are candidates if
    ANY band matches; more/narrower bands = higher recall)."""
    planes = _planes(dim)
    n_bands = N_PLANES // band_bits

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                    "band": pd.Series([], dtype="int32"),
                                    "bsig": pd.Series([], dtype="int32")})
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (m @ planes > 0).astype(np.int64)      # (n, N_PLANES)
            bb = bits.reshape(len(pdf), n_bands, band_bits)
            bsig = (bb << np.arange(band_bits)).sum(axis=2)
            yield pd.DataFrame({
                "vec_id": np.repeat(pdf[id_col].to_numpy().astype("int64"),
                                    n_bands),
                "band": np.tile(np.arange(n_bands, dtype=np.int32),
                                len(pdf)),
                "bsig": bsig.reshape(-1).astype("int32")})

    return emb.select(id_col, vec_col).mapInPandas(
        run, "vec_id long, band int, bsig int")


def lsh_cosine_pairs(emb: DataFrame, threshold: float = 0.8,
                     band_bits: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     round_dp: int = 6) -> DataFrame:
    """(vec_a, vec_b, cos): embedding near-dup pairs via banded-LSH
    blocking + exact cosine verify — the scale form of cosine_pairs:
    candidate generation is an equi-join on (band, bsig) (shuffle
    bounded by bucket sizes, never the O(n^2) pair space), and only
    candidate pairs are re-scored. Approximate: recall is the banded-
    LSH collision probability (tested vs the exact all-pairs oracle)."""
    dim = _dim_of(emb, vec_col)
    sig = lsh_band_signatures(emb, dim, band_bits, id_col, vec_col)
    l, r = sig.alias("l"), sig.alias("r")
    cand = (l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.bsig") == F.col("r.bsig"))
                   & (F.col("l.vec_id") < F.col("r.vec_id")))
            .select(F.col("l.vec_id").alias("vec_a"),
                    F.col("r.vec_id").alias("vec_b"))
            .distinct())
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = (emb.select(F.col(id_col).alias("id"), v.alias("v"))
            .withColumn("n", F.sqrt(F.aggregate(
                F.transform("v", lambda x: x * x),
                F.lit(0.0), lambda a, x: a + x))))
    va = norm.select(F.col("id").alias("vec_a"), F.col("v").alias("va"),
                     F.col("n").alias("na"))
    vb = norm.select(F.col("id").alias("vec_b"), F.col("v").alias("vb"),
                     F.col("n").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (cand.join(va, "vec_a").join(vb, "vec_b")
            .withColumn("cos", F.round(dot / (F.col("na") * F.col("nb")),
                                       round_dp))
            .filter(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", "cos"))


def build_ann_index(emb: DataFrame, out_dir: str, n_clusters: int = 16,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> dict:
    """Persisted ANN index: vectors stored WITH their IVF cluster and
    LSH signature, dir-partitioned by cluster, plus a centroids table.
    Query-time candidate selection is then a partition-PRUNED scan of
    n_probe cluster dirs — no signature/assignment recompute per query
    (the serving shape for 10^9+ vectors)."""
    import os
    dim = _dim_of(emb, vec_col)
    cent = kmeans_centroids(emb, n_clusters, vec_col=vec_col)
    assign = ivf_assign(emb, cent, id_col, vec_col)
    sig = lsh_signatures(emb, dim, id_col, vec_col)
    table = (emb.select(F.col(id_col).alias("vec_id"), vec_col)
             .join(assign, "vec_id").join(sig, "vec_id"))
    (table.repartition("cluster").write.mode("overwrite")
     .partitionBy("cluster").parquet(os.path.join(out_dir, "vectors")))
    spark = emb.sparkSession
    spark.createDataFrame(
        [(i, [float(x) for x in cent[i]]) for i in range(len(cent))],
        "cluster int, centroid array<double>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(out_dir, "centroids"))
    return {"n_clusters": int(len(cent)), "dim": dim}


def ann_index_topk(spark, out_dir: str, query_vec, k: int = 10,
                   n_probe: int = 4, vec_col: str = "embedding",
                   round_dp: int = 6) -> DataFrame:
    """Top-k over a persisted ANN index: pick n_probe nearest centroids
    on the driver, scan ONLY those cluster partitions, exact-cosine the
    survivors."""
    import os
    cent_rows = spark.read.parquet(
        os.path.join(out_dir, "centroids")).collect()
    cent = np.array([r["centroid"] for r in
                     sorted(cent_rows, key=lambda r: r["cluster"])])
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(cent @ qn))[:n_probe].tolist()
    vecs = spark.read.parquet(os.path.join(out_dir, "vectors")) \
        .filter(F.col("cluster").isin(probes))
    return (vecs.select("vec_id",
                        F.round(_cos_expr(vec_col, query_vec), round_dp)
                        .alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(k))


def cosine_pairs(emb: DataFrame, threshold: float = 0.3,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_dp: int = 6) -> DataFrame:
    """(vec_a, vec_b, cos): embedding near-dup pairs above threshold.
    All-pairs form (the oracle); lsh_cosine_pairs is the banded-LSH
    blocked form that survives 100 TB — same verify expression."""
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


def dedup_embedding_keep_first(emb: DataFrame, threshold: float = 0.95,
                               band_bits: int = 4,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """The APPLIED form of embedding-cosine near-dup dedup: banded-LSH
    cosine pairs above `threshold` -> connected components -> keep each
    component's canonical (min id) member; rows in no near-dup pair
    survive untouched. End-to-end 100 TB shape: bucketed candidates,
    exact re-score of candidates only, label propagation as joins, one
    left-anti join — the embedding analog of
    dedup.dedup_near_keep_first (MinHash) over text."""
    from irkit_spark.pipeline.dedup import connected_components
    pairs = lsh_cosine_pairs(emb, threshold, band_bits, id_col, vec_col) \
        .select(F.col("vec_a").alias("doc_a"),
                F.col("vec_b").alias("doc_b"))
    comp = connected_components(pairs)
    losers = (comp.join(
        comp.groupBy("component").agg(F.min("doc_id").alias("keep")),
        "component")
        .filter(F.col("doc_id") != F.col("keep"))
        .select(F.col("doc_id").alias(id_col))).persist()
    losers.count()
    comp.unpersist()
    return emb.join(losers, id_col, "left_anti")
