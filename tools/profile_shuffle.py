"""Decompose the build's shuffle_encode_write phase at a given core
count (blob-shuffle era): scan of the packed tok artifact, the blob
exchange, the unpack+sort+encode kernel, and the final write.

Usage: taskset -c 0-{N-1} python tools/profile_shuffle.py N [tok_dir]
Prints one JSON line with per-variant wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main():
    cores = int(sys.argv[1])
    tok_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/irkit_bench/idx8/tok"
    from pyspark.sql import functions as F

    from irkit_spark import config
    from irkit_spark.config import get_spark
    from irkit_spark.operators.build import (POSTINGS_SCHEMA,
                                             TOK_BLOB_SCHEMA,
                                             _encode_kernel_arrow)

    spark = get_spark(f"profile-{cores}", cores,
                      shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    n_parts = max(cores, 8)
    dps = 500000 // 64
    out: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        out[name] = round(time.monotonic() - t0, 3)

    tok = spark.read.schema(TOK_BLOB_SCHEMA).parquet(tok_dir)
    rep = lambda: tok.repartition(n_parts, "bucket")
    kern = _encode_kernel_arrow(180.0, config.BLOCK_SIZE, dps, False,
                                blob_input=True)
    tok.limit(10).count()    # warm JVM

    timed("scan_only", lambda: tok.agg(
        F.sum(F.length("blob"))).collect())
    timed("scan_shuffle", lambda: rep().agg(
        F.sum(F.length("blob"))).collect())
    timed("scan_shuffle_encode", lambda: rep().mapInArrow(
        kern, POSTINGS_SCHEMA).count())
    out_dir = f"/tmp/irkit_profile/post_{cores}"
    timed("full_with_write", lambda: rep().mapInArrow(
        kern, POSTINGS_SCHEMA)
        .repartition("partition_id")
        .sortWithinPartitions("term_id")
        .write.mode("overwrite").partitionBy("partition_id")
        .parquet(out_dir))
    print(json.dumps({"cores": cores, "n_parts": n_parts, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
