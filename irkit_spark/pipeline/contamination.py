"""Benchmark-contamination detection: flag corpus documents sharing
any token n-gram with a benchmark/eval set — the decontamination pass
(GPT-3 appendix C / PaLM style) every serious pretraining pipeline
runs before training.

Hashing is the repo's PORTABLE 31-bit scheme so the DuckDB oracle
reproduces it bit-for-bit: each token hashes to a Karp-Rabin
polynomial over its code points (base 257 mod P = 2^31-1, seeded by
the first code point), and an n-gram hashes the n token-hashes with a
second base (263 mod P). Every intermediate product is < 2^62.

Scale shape: the benchmark side is eval-set-sized (thousands of docs,
millions of n-grams) — its distinct hash set broadcasts; the corpus
side streams one Arrow kernel pass producing (doc_id, gram hash) and
one semi-join + groupBy(doc). No shuffle touches the corpus text, and
nothing pairs corpus docs with each other.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE

P = 2_147_483_647
B_TOK = 257
B_GRAM = 263


def _gram_hash_kernel(n: int):
    """mapInPandas kernel: (doc_id, text) -> (doc_id, gh) rows, one per
    DISTINCT token n-gram hash in the doc."""
    import numpy as np
    import pandas as pd
    tok_re = re.compile(TOKEN_RE)

    def run(batches):
        for pdf in batches:
            ids, ghs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = tok_re.findall((text or "").lower())
                if len(toks) < n:
                    continue
                # per-token polynomial hash, vectorized over tokens:
                # pad to the max token length and fold column-wise
                # (tokens are short — a handful of passes)
                ml = max(len(t) for t in toks)
                mat = np.zeros((len(toks), ml), dtype=np.int64)
                for i, t in enumerate(toks):
                    mat[i, :len(t)] = np.frombuffer(
                        t.encode("utf-32-le"), dtype=np.uint32)
                th = mat[:, 0].copy()
                for j in range(1, ml):
                    col = mat[:, j]
                    live = col > 0
                    th[live] = (th[live] * B_TOK + col[live]) % P
                # rolling n-gram hash over the token-hash sequence
                nw = len(toks) - n + 1
                gh = np.zeros(nw, dtype=np.int64)
                for j in range(n):
                    gh = (gh * B_GRAM + th[j:j + nw]) % P
                u = np.unique(gh)
                ids.extend([doc_id] * u.size)
                ghs.extend(u.tolist())
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "gh": pd.Series(ghs, dtype="int64")})

    return run


def ngram_hashes(docs: DataFrame, n: int = 8) -> DataFrame:
    """(doc_id, gh): distinct token-n-gram hashes per document."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return docs.select("doc_id", "text").mapInPandas(
        _gram_hash_kernel(n), "doc_id long, gh long")


def contamination(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  broadcast_max: int = 50_000_000) -> DataFrame:
    """(doc_id, n_hits): corpus docs sharing >= 1 token n-gram with the
    benchmark, with the count of DISTINCT shared n-gram hashes. The
    applied decontamination filter is an anti-join against these ids.

    The benchmark's distinct hash set broadcasts below `broadcast_max`
    hashes (an eval suite is ~10^6-10^7 n-grams); above it the join
    shuffles on gh, still never pairing corpus docs together."""
    bench = ngram_hashes(benchmark, n).select("gh").distinct()
    n_bench = bench.count()
    right = F.broadcast(bench) if n_bench <= broadcast_max else bench
    return (ngram_hashes(docs, n)
            .join(right, "gh", "left_semi")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_hits")))
