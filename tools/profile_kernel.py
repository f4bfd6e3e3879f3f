"""Standalone (no-Spark) scaling probe for the REAL encode kernel:
pre-split the bench tok checkpoint into N_PARTS per-partition parquet
files (hash on (term_id, shard), same key as the build shuffle), then
run lexsort+varbyte encode per partition under multiprocessing at
1/2/4/8 workers, each pinned like the bench pins the local[n] JVM.

If THIS scales ~linearly, the build's flat shuffle_encode phase is
Spark-side; if it doesn't, the phase is memory-bus-bound and the probe
IS the machine ceiling for the build's workload class.

Usage: python tools/profile_kernel.py [tok_dir] [n_parts]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/irkit_bench/idx32/tok"
N_PARTS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DPS = 500000 // 64
PART_DIR = "/tmp/irkit_profile/kparts"


def prep():
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq
    os.makedirs(PART_DIR, exist_ok=True)
    tbl = ds.dataset(TOK).to_table()
    d = tbl.column("doc_id").to_numpy()
    t = tbl.column("term_id").to_numpy()
    shard = (d // DPS).astype(np.int64)
    part = (t.astype(np.int64) * 31 + shard) % N_PARTS
    for i in range(N_PARTS):
        pq.write_table(tbl.filter(pa.array(part == i)),
                       f"{PART_DIR}/part{i}.parquet")


def work(part: int) -> tuple[float, float]:
    import pyarrow.parquet as pq

    from irkit_spark import config
    from irkit_spark.operators.build import _encode_kernel_arrow

    t0 = time.monotonic()
    sub = pq.read_table(f"{PART_DIR}/part{part}.parquet")
    t_read = time.monotonic() - t0
    kern = _encode_kernel_arrow(180.0, config.BLOCK_SIZE, DPS, False, True)
    t1 = time.monotonic()
    for rb in kern(sub.to_batches(max_chunksize=65536)):
        pass
    return t_read, time.monotonic() - t1


def main():
    if not os.path.exists(f"{PART_DIR}/part{N_PARTS - 1}.parquet"):
        prep()
    out = {}
    for n in (1, 2, 4, 8):
        os.sched_setaffinity(0, set(range(n)))
        with mp.Pool(n) as pool:
            t0 = time.monotonic()
            rs = pool.map(work, range(N_PARTS))
            out[f"wall_{n}w"] = round(time.monotonic() - t0, 3)
            out[f"read_sum_{n}w"] = round(sum(r[0] for r in rs), 3)
            out[f"kernel_sum_{n}w"] = round(sum(r[1] for r in rs), 3)
    out["eff_1_to_4"] = round(out["wall_1w"] / out["wall_4w"] / 4, 3)
    out["eff_2_to_8"] = round(out["wall_2w"] / out["wall_8w"] / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
