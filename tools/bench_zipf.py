"""Subprocess worker for the Zipf-adversarial skew bench (VERDICT r4
item 4, BASELINE.json [B:6]): build the index over a HOSTILE corpus —
head terms at df == n_docs (stopwords in EVERY doc, several occurrences
each) over a steep-Zipf tail — at a given core count, print one JSON
metrics line.

The uniform bench corpus (sources/pages.py, Zipf s=1.2 over 5k terms)
never stresses term-splitting: its heaviest term holds ~1.6% of
postings. Here 5 stopwords hold ~35% of all postings between them, so a
naive groupBy(term) encode would put >n_docs postings in one reducer.
The engine buckets the encode exchange by (term, doc-shard) — a df==N
term becomes n_shards bounded cells — so skew_ratio (max/median
postings per doc-shard) must stay ~1 and N->4N scaling must hold even
on this input. bench.py runs this at 1 and 4 pinned cores and reports
`zipf_skew` next to the uniform numbers.

Generation is chunked on a fixed grid (rng seeded per chunk id), same
determinism contract as sources/pages.py: content depends only on doc
index, never on partitioning.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import numpy as np
import pandas as pd

SEED = 1337
CHUNK = 5000
N_STOP = 5              # head terms, df == n_docs
STOP_TF = 8             # occurrences of each stopword per doc
TAIL_VOCAB = 2000
TAIL_ZIPF_S = 1.4       # steeper than the uniform corpus's 1.2
TAIL_LEN = 60           # tail tokens per doc

_STOPS = np.array([f"stop{i:02d}" for i in range(N_STOP)], dtype=object)
_TAIL = np.array([f"tail{i:05d}" for i in range(TAIL_VOCAB)], dtype=object)
_TAIL_P = 1.0 / np.arange(1, TAIL_VOCAB + 1) ** TAIL_ZIPF_S
_TAIL_P = _TAIL_P / _TAIL_P.sum()
# every doc's head block is identical: N_STOP terms x STOP_TF each
_HEAD = " ".join(s for s in _STOPS for _ in range(STOP_TF))


def gen_chunk(chunk_id: int, n_total: int) -> pd.DataFrame:
    start = chunk_id * CHUNK
    end = min(start + CHUNK, n_total)
    n = end - start
    rng = np.random.default_rng(SEED * 1_000_003 + chunk_id)
    toks = rng.choice(_TAIL, size=(n, TAIL_LEN), p=_TAIL_P)
    texts = [_HEAD + " " + " ".join(toks[j]) for j in range(n)]
    urls = [f"https://zipf.example/p/{start + j:07d}" for j in range(n)]
    return pd.DataFrame({"url": pd.Series(urls, dtype="object"),
                         "text": pd.Series(texts, dtype="object")})


def zipf_pages_df(spark, n_docs: int):
    """One partition per chunk (see sources/pages.py:pages_df for why
    the grid is NOT capped at defaultParallelism)."""
    n_chunks = (n_docs + CHUNK - 1) // CHUNK
    chunk_ids = (spark.range(n_chunks).withColumnRenamed("id", "chunk_id")
                 .repartition(n_chunks))

    def gen(batches):
        for pdf in batches:
            for cid in pdf["chunk_id"].tolist():
                yield gen_chunk(int(cid), n_docs)

    return chunk_ids.mapInPandas(gen, schema="url string, text string")


def main():
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    out_dir = sys.argv[3]
    from irkit_spark.config import get_spark
    from irkit_spark.operators.build import build_index

    spark = get_spark(f"bench-zipf-{cores}", cores,
                      shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    gen_dir = os.path.join(os.path.dirname(out_dir),
                           f"zipf_pages_{n_docs}")
    if not os.path.exists(os.path.join(gen_dir, "_SUCCESS")):
        zipf_pages_df(spark, n_docs).write.mode("overwrite") \
            .parquet(gen_dir)
    pages = spark.read.parquet(gen_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    # untimed JVM/python-worker warmup through the real pipeline (same
    # rationale as tools/bench_build.py)
    warm_docs = min(20_000, max(4_000, n_docs // 10))
    warm_dir = os.path.join(os.path.dirname(out_dir),
                            f"zipf_warm_{cores}")
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, pages.limit(warm_docs), warm_dir,
                docs_per_shard=max(1000, warm_docs // 8))
    shutil.rmtree(warm_dir, ignore_errors=True)
    dps = max(1000, n_docs // 64)
    t0 = time.monotonic()
    m = build_index(spark, pages, out_dir, docs_per_shard=dps)
    wall = time.monotonic() - t0
    # postings share of the df==n_docs head terms (hostility measure)
    from irkit_spark.operators.query import Index
    from pyspark.sql import functions as F
    idx = Index(spark, out_dir)
    head_cf = (idx.terms.filter(F.col("term").isin(list(_STOPS)))
               .agg(F.sum("cf").alias("cf"), F.min("df").alias("min_df"))
               .collect()[0])
    print(json.dumps({
        "cores": cores, "n_docs": n_docs, "wall_sec": round(wall, 3),
        "total_postings": m["total_postings"],
        "postings_per_sec": round(m["total_postings"] / wall, 1),
        "skew_ratio": round(m["skew_ratio"], 4),
        "head_token_share": round(
            head_cf["cf"] / max(1, idx.coll_len), 4),
        "head_min_df": int(head_cf["min_df"]),
        "bytes_per_posting": round(m["bytes_per_posting"], 4),
        "n_shards": m["n_shards"],
        "phases": m.get("phases", {}),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
