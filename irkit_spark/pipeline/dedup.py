"""Deduplication operators: exact, token-Jaccard, trigram-shingle
Jaccard, MinHash+LSH, SimHash.

Scale design: the exact/Jaccard forms are the *oracle-checkable* small
paths; MinHash-LSH and SimHash are the 100 TB paths — candidate
generation is a band-bucket groupBy (shuffle bounded by #buckets, never
the O(n^2) pair space), followed by exact verification of candidates
only. All signature math is numpy inside mapInPandas (Arrow-batched).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE

# ---- frozen minhash/simhash parameters ---------------------------------
N_PERM = 128
N_BANDS = 16            # 16 bands x 8 rows
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(42)
_A = _rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


def _toks(text_col="text"):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


# ------------------------------------------------------------ exact dedup

def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(h, rep_doc, n_copies): md5(text) groups; rep = min doc_id.
    Pure hash-groupBy — the one-shuffle exact dedup."""
    return (docs.select("doc_id", F.md5("text").alias("h"))
            .groupBy("h")
            .agg(F.min("doc_id").alias("rep_doc"),
                 F.count("*").alias("n_copies")))


def dedup_keep_first(docs: DataFrame) -> DataFrame:
    """The applied form of exact dedup: keep only each text's canonical
    (min doc_id) copy — the one-shuffle cleaning pass a training
    pipeline actually runs. Returns the full surviving rows."""
    reps = exact_dup_groups(docs).select(
        F.col("rep_doc").alias("doc_id"))
    return docs.join(reps, "doc_id", "left_semi")


# ------------------------------------------------- exact Jaccard (oracle)

def token_jaccard_pairs(docs: DataFrame, block_col: str = "source",
                        threshold: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jac): distinct-token Jaccard over pairs within a
    blocking column (at scale: block first, never all-pairs)."""
    base = docs.select("doc_id", F.col(block_col).alias("blk"),
                       F.array_distinct(_toks()).alias("toks"))
    tok = base.select("doc_id", "blk", F.explode("toks").alias("term"))
    sizes = base.select("doc_id", F.size("toks").cast("long").alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (a.join(b, (F.col("a.term") == F.col("b.term"))
                    & (F.col("a.blk") == F.col("b.blk"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.withColumnRenamed("doc_id", "doc_a") \
              .withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b") \
              .withColumnRenamed("n", "nb")
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jac", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6))
            .filter(F.col("jac") >= threshold)
            .select("doc_a", "doc_b", "jac"))


def shingle_jaccard_pairs(docs: DataFrame, n: int = 3,
                          threshold: float = 0.1) -> DataFrame:
    """(doc_a, doc_b, jac): n-gram (token shingle) Jaccard near-dup pairs.
    Pair candidates come from an equi-join on shared shingles, so only
    docs with >=1 common shingle ever meet (no cross join)."""
    base = docs.select("doc_id", _toks().alias("toks"))
    pos = base.select("doc_id", F.posexplode("toks").alias("pos", "term"))
    a1, a2, a3 = pos.alias("x"), pos.alias("y"), pos.alias("z")
    sh = (a1.join(a2, (F.col("x.doc_id") == F.col("y.doc_id"))
                  & (F.col("y.pos") == F.col("x.pos") + 1))
          .join(a3, (F.col("x.doc_id") == F.col("z.doc_id"))
                & (F.col("z.pos") == F.col("x.pos") + 2))
          .select(F.col("x.doc_id").alias("doc_id"),
                  F.concat_ws(" ", "x.term", "y.term", "z.term")
                  .alias("sh"))
          .distinct())
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (l.join(r, (F.col("l.sh") == F.col("r.sh"))
                    & (F.col("l.doc_id") < F.col("r.doc_id")))
             .groupBy(F.col("l.doc_id").alias("doc_a"),
                      F.col("r.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.withColumnRenamed("doc_id", "doc_a") \
              .withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b") \
              .withColumnRenamed("n", "nb")
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jac", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6))
            .filter(F.col("jac") >= threshold)
            .select("doc_a", "doc_b", "jac"))


# ------------------------------------------------------------ minhash-lsh

def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    import re
    toks = re.findall(TOKEN_RE, text.lower())
    if len(toks) < n:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
         for s in set(shingles)), dtype=np.uint64)
    return hs


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, band, band_hash): N_PERM minhashes folded into N_BANDS
    band fingerprints — the LSH keys. Arrow-batched numpy."""

    def run(batches):
        for pdf in batches:
            out_doc, out_band, out_hash = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hs = _shingle_hashes(text or "", n)
                if hs.size == 0:
                    continue
                # universal hashing: (a*h + b) mod p, min per permutation
                vals = (hs[None, :] * _A[:, None] + _B[:, None]) % _MERSENNE
                sig = vals.min(axis=1)          # N_PERM u64
                bands = sig.reshape(N_BANDS, ROWS_PER_BAND)
                for bi in range(N_BANDS):
                    h = hashlib.md5(bands[bi].tobytes()).hexdigest()[:16]
                    out_doc.append(doc_id)
                    out_band.append(bi)
                    out_hash.append(h)
            yield pd.DataFrame({"doc_id": pd.Series(out_doc, dtype="int64"),
                                "band": pd.Series(out_band, dtype="int32"),
                                "band_hash": pd.Series(out_hash,
                                                       dtype="object")})

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, band int, band_hash string")


def minhash_lsh_pairs(docs: DataFrame, n: int = 3,
                      verify_threshold: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jac): LSH candidates (same band bucket) verified
    with exact shingle Jaccard. The scale path: candidate generation is
    a groupBy on (band, band_hash) — bounded shuffle, no pair blowup."""
    sig = minhash_signatures(docs, n)
    l, r = sig.alias("l"), sig.alias("r")
    cand = (l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.band_hash") == F.col("r.band_hash"))
                   & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("doc_a"),
                    F.col("r.doc_id").alias("doc_b"))
            .distinct())
    exact = shingle_jaccard_pairs(docs, n, threshold=0.0)
    return (cand.join(exact, ["doc_a", "doc_b"])
            .filter(F.col("jac") >= verify_threshold)
            .select("doc_a", "doc_b", "jac"))


# ---------------------------------------------------------------- simhash

def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash, chunk0..chunk3): 64-bit tf-weighted simhash +
    four 16-bit chunks (pigeonhole keys: hamming<=3 dupes share >=1
    chunk, so candidate generation is an equi-join per chunk)."""

    def run(batches):
        import re
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = re.findall(TOKEN_RE, (text or "").lower())
                if not toks:
                    ids.append(doc_id)
                    hashes.append(0)
                    continue
                s = pd.Series(toks).value_counts()
                th = np.fromiter(
                    (int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                                    "little") for t in s.index),
                    dtype=np.uint64)
                w = s.to_numpy().astype(np.float64)
                bits = ((th[:, None] >> np.arange(64, dtype=np.uint64))
                        & np.uint64(1)).astype(np.float64)
                acc = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
                h = int(((acc > 0).astype(np.uint64)
                         << np.arange(64, dtype=np.uint64)).sum())
                ids.append(doc_id)
                hashes.append(h - (1 << 64) if h >= 1 << 63 else h)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(hashes, dtype="int64")})

    out = docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, simhash long")
    u = F.col("simhash").cast("long")
    mask = F.lit(65535).cast("long")
    return out.select(
        "doc_id", "simhash",
        *[F.shiftrightunsigned(u, 16 * i).bitwiseAND(mask).cast("int")
          .alias(f"chunk{i}") for i in range(4)])


def simhash_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """(doc_a, doc_b, hamming): near-dup pairs via chunk-bucketed
    candidate join + exact hamming verify."""
    sh = simhash64(docs)
    cands = None
    for i in range(4):
        l = sh.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("ha"),
                      F.col(f"chunk{i}").alias("ck"))
        r = sh.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("hb"),
                      F.col(f"chunk{i}").alias("ck"))
        c = l.join(r, ["ck"]).filter(F.col("doc_a") < F.col("doc_b")) \
             .select("doc_a", "doc_b", "ha", "hb")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.distinct()
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cands.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))
