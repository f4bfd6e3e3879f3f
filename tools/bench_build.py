"""Subprocess worker for bench.py: build the index over a synthesized
pages table at a given core count, print one JSON metrics line.

Separate process per parallelism level because a JVM's master is fixed
— this is the sandbox stand-in for N vs 4N executors (BASELINE.md)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main():
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    out_dir = sys.argv[3]
    from irkit_spark.config import get_spark
    from irkit_spark.operators.build import build_index
    from irkit_spark.sources.pages import pages_df

    spark = get_spark(f"bench-build-{cores}", cores,
                      shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    pages = pages_df(spark, n_docs)
    # materialize the input first so build wall-clock measures the
    # build, not the synthetic generator (shared across core counts)
    # v2: one file per generation chunk (see pages_df) — a cache dir
    # written by the old layout would silently cap scan parallelism
    gen_dir = os.path.join(os.path.dirname(out_dir), f"pages_{n_docs}_v2")
    if not os.path.exists(os.path.join(gen_dir, "_SUCCESS")):
        pages.write.mode("overwrite").parquet(gen_dir)
    pages = spark.read.parquet(gen_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    # untimed python-worker warmup: import numpy/pandas in every worker
    # once (a steady-state executor fleet is warm; without this the
    # first timed stage carries one ~2s cold-import straggler per
    # worker, which distorts small-N/large-N comparisons differently)
    def _warm(batches):
        import numpy  # noqa: F401
        import pandas as _pd
        for b in batches:
            yield _pd.DataFrame({"id": b["id"]})

    spark.range(cores * 4, numPartitions=cores * 4) \
        .mapInPandas(_warm, "id long").count()
    # shard size derives from n_docs (not cores) so the index content is
    # identical across parallelism levels (BASELINE.json:6)
    dps = max(1000, n_docs // 64)
    # untimed JIT/codegen warm-up: one mini-build through the REAL
    # pipeline (canonicalize -> ids -> pack -> shuffle -> encode ->
    # write) compiles every hot JVM path before the timed run. The JIT
    # cost is ~constant wall, so it distorts short timed runs (the 4N
    # leg) proportionally more than long ones (the N leg) — warming
    # both legs removes that asymmetry from the N->4N ratio
    # (BENCH.md's 2M-doc experiment measured exactly this skew).
    warm_docs = min(24_000, max(4_000, n_docs // 20))
    warm_dir = os.path.join(os.path.dirname(out_dir),
                            f"warmidx_{cores}")
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, pages.limit(warm_docs), warm_dir,
                text_from_html=True,
                docs_per_shard=max(1000, warm_docs // 8))
    shutil.rmtree(warm_dir, ignore_errors=True)
    t0 = time.monotonic()
    m = build_index(spark, pages, out_dir, text_from_html=True,
                    docs_per_shard=dps)
    wall = time.monotonic() - t0
    print(json.dumps({
        "cores": cores, "n_docs": n_docs, "wall_sec": round(wall, 3),
        "total_postings": m["total_postings"],
        "postings_per_sec": round(m["total_postings"] / wall, 1),
        "skew_ratio": round(m["skew_ratio"], 4),
        "bytes_per_posting": round(m["bytes_per_posting"], 4),
        "n_shards": m["n_shards"],
        "phases": m.get("phases", {}),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
