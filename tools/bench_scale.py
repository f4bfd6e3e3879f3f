"""Round-7 scale-up evidence runs (r6 verdict tasks 2 and 5).

Usage: python tools/bench_scale.py [n_docs] [out_json]

Part A — one 10x-scale build + query set (default 5M docs, ~10-20x
sf0.1's 500k): full build at local[$SPARK_GRAFT_CPUS] with the
production DOCS_PER_SHARD (100k -> ~n/100k shards), then the wand /
daat / selective / tiered / batch query set against it, plus the
positions artifact + a phrase query. Reports postings/sec, skew_ratio,
per-phase walls and per-query latencies.

Part B — selective/tiered at a realistic shard count: the SAME corpus
rebuilt at docs_per_shard = n/512 (>= 256 shards), shard_stats +
impact tier built, then selective/tiered vs plain wand on identical
queries with stats dicts capturing how many shards each phase touched.

Everything computes from the synthesized pages input; nothing is
reused across invocations except the generated pages parquet (input
data, same role as /root/testdata)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(HERE, "BENCH_LOCAL_r07_sf1.json")
    base = "/tmp/irkit_scale"
    os.makedirs(base, exist_ok=True)

    from irkit_spark.config import get_spark
    spark = get_spark("bench-scale", CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    rep: dict = {"n_docs": n_docs, "cpus": CPUS}

    from irkit_spark.sources.pages import pages_df
    gen_dir = os.path.join(base, f"pages_{n_docs}")
    if not os.path.exists(os.path.join(gen_dir, "_SUCCESS")):
        t0 = time.monotonic()
        pages_df(spark, n_docs).write.mode("overwrite").parquet(gen_dir)
        rep["gen_sec"] = round(time.monotonic() - t0, 1)
    pages = spark.read.parquet(gen_dir)

    from irkit_spark.operators.build import build_index
    from irkit_spark.operators.query import (Index, batch_search,
                                             search)
    from irkit_spark.operators.selective import (build_shard_stats,
                                                 selective_search)
    from irkit_spark.operators.tiered import (build_impact_tier,
                                              tiered_search)

    # ---- part A: production-shard-size build + query set -------------
    idx_dir = os.path.join(base, f"idx_{n_docs}")
    sc.setJobDescription("scale: build 10x")
    if not os.path.exists(os.path.join(idx_dir, "stats", "_SUCCESS")):
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.monotonic()
        m = build_index(spark, pages, idx_dir, text_from_html=True)
        wall = time.monotonic() - t0
        rep["build"] = {
            "wall_sec": round(wall, 1),
            "postings": m["total_postings"],
            "postings_per_sec": round(m["total_postings"] / wall, 1),
            "skew_ratio": round(m["skew_ratio"], 4),
            "n_shards": m["n_shards"],
            "bytes_per_posting": round(m["bytes_per_posting"], 4),
            "phases": m["phases"]}
        print(json.dumps({"part": "A_build", **rep["build"]}),
              flush=True)
    idx = Index(spark, idx_dir)
    if "build" not in rep:
        st = idx.stats
        rep["build"] = {"wall_sec": st["wall_ms"] / 1000.0,
                        "postings": int(st["total_postings"]),
                        "n_shards": int(st["n_shards"]),
                        "note": "from stats table (build reused)"}
    search(idx, "term00042", 10, "wand", local=False).collect()  # warm
    QA = "term00000 term00003 term00123"
    qs: dict = {}
    for name, fn in [
        ("wand_k10", lambda: search(idx, QA, 10, "wand", local=False)),
        ("daat_k10", lambda: search(idx, QA, 10, "daat", local=False)),
        ("maxscore_k10", lambda: search(idx, QA, 10, "maxscore",
                                        local=False)),
        ("taat_k10", lambda: search(idx, QA, 10, "taat")),
        ("batch_wand_20q", lambda: batch_search(
            idx, {f"q{i}": f"term{i:05d} term{(i*37+11) % 2000:05d}"
                  for i in range(20)}, 10, "wand")),
    ]:
        walls = []
        for _ in range(3):
            sc.setJobDescription(f"scale: {name}")
            t0 = time.monotonic()
            fn().collect()
            walls.append(round(time.monotonic() - t0, 3))
        qs[name] = min(walls)
        print(json.dumps({"part": "A_query", "q": name,
                          "walls": walls}), flush=True)
    rep["queries_10x"] = qs

    # positions + phrase on the 10x corpus
    import pandas as pd
    from irkit_spark.functions.extract import EXTRACTORS
    from irkit_spark.operators.positions import (build_positions,
                                                 phrase_search)
    _ext = EXTRACTORS["frozen"]

    def _extr(it):
        for pdf in it:
            yield pd.DataFrame({"url": pdf["url"],
                                "text": [_ext(h) for h in pdf["html"]]})
    # positions at >2M docs needs more memory headroom than this
    # 128GiB sandbox has with a 48g local-mode JVM (an OOM-killed run
    # is recorded in OPTIMIZATION_r07.md); opt in explicitly
    do_pos = os.environ.get("IRKIT_SCALE_POSITIONS",
                            "1" if n_docs <= 2_000_000 else "0") == "1"
    if do_pos and not os.path.exists(os.path.join(
            idx_dir, "positions", "_SUCCESS")):
        sc.setJobDescription("scale: build positions")
        t0 = time.monotonic()
        build_positions(spark, pages.mapInPandas(
            _extr, "url string, text string"), idx_dir)
        rep["positions_build_sec"] = round(time.monotonic() - t0, 1)
        print(json.dumps({"part": "A_positions",
                          "sec": rep["positions_build_sec"]}),
              flush=True)
    if do_pos:
        walls = []
        for _ in range(3):
            sc.setJobDescription("scale: phrase_k10")
            t0 = time.monotonic()
            phrase_search(idx, "term00001 term00001", 10).collect()
            walls.append(round(time.monotonic() - t0, 3))
        rep["queries_10x"]["phrase_k10"] = min(walls)
        print(json.dumps({"part": "A_query", "q": "phrase_k10",
                          "walls": walls}), flush=True)

    # ---- part B: >= 512 shards — selective/tiered vs plain ----------
    idxb_dir = os.path.join(base, f"idx_many_{n_docs}")
    dps = max(1000, n_docs // 512)
    sc.setJobDescription("scale: build many-shard")
    if not os.path.exists(os.path.join(idxb_dir, "stats", "_SUCCESS")):
        shutil.rmtree(idxb_dir, ignore_errors=True)
        build_index(spark, pages, idxb_dir, text_from_html=True,
                    docs_per_shard=dps)
    idxb = Index(spark, idxb_dir)
    search(idxb, "term00042", 10, "wand", local=False).collect()
    if not os.path.exists(os.path.join(idxb_dir, "shard_stats",
                                       "_SUCCESS")):
        build_shard_stats(spark, idxb_dir)
    if not os.path.exists(os.path.join(idxb_dir, "postings_tier",
                                       "_SUCCESS")):
        build_impact_tier(spark, idxb_dir)
    # a selective-friendly query: one rare term dominates the bound
    QSEL = "term04990 term04800 term00123"
    outs = {}
    for name, fn in [
        ("plain_wand", lambda: (search(idxb, QSEL, 10, "wand",
                                       local=False), None)),
        ("selective", lambda: (lambda st: (selective_search(
            idxb, QSEL, 10, stats=st), st))({})),
        ("tiered", lambda: (lambda st: (tiered_search(
            idxb, QSEL, 10, stats=st), st))({})),
        ("plain_wand_common", lambda: (search(idxb, QA, 10, "wand",
                                              local=False), None)),
        ("selective_common", lambda: (lambda st: (selective_search(
            idxb, QA, 10, stats=st), st))({})),
        ("tiered_common", lambda: (lambda st: (tiered_search(
            idxb, QA, 10, stats=st), st))({})),
    ]:
        walls, st_out, rows_ref = [], None, None
        for _ in range(3):
            sc.setJobDescription(f"scale-many: {name}")
            t0 = time.monotonic()
            df, st = fn()
            rows = [(r["doc_id"], round(r["score"], 9))
                    for r in df.collect()]
            walls.append(round(time.monotonic() - t0, 3))
            st_out, rows_ref = st, rows
        outs[name] = {"min_sec": min(walls), "walls": walls,
                      **({"stats": st_out} if st_out else {}),
                      "rows": rows_ref}
        print(json.dumps({"part": "B", "q": name, "walls": walls,
                          "stats": st_out}), flush=True)
    # exactness: selective/tiered must equal plain wand bit-for-bit
    assert outs["selective"]["rows"] == outs["plain_wand"]["rows"]
    assert outs["tiered"]["rows"] == outs["plain_wand"]["rows"]
    assert outs["selective_common"]["rows"] \
        == outs["plain_wand_common"]["rows"]
    assert outs["tiered_common"]["rows"] \
        == outs["plain_wand_common"]["rows"]
    for o in outs.values():
        o.pop("rows")
    rep["many_shard"] = {"docs_per_shard": dps,
                         "n_shards": -(-n_docs // dps), **outs}

    with open(out_json, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps({"part": "done", "out": out_json}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
