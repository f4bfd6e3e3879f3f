"""Round-7 optimization harness (guide §1): per-query isolation with
job counts + explain capture. NOT the driver contract — bench.py stays
the frozen measurement; this file exists so before/after numbers and
plan shapes for OPTIMIZATION_r07.md come from a controlled, repeatable
instrument.

Usage:
  python bench_extra.py [--reps 3] [--docs 500000] [--plans plans/r07 \
      --suffix before] [--only substr] [--skip-build-bench]

Measures, with spark.sparkContext.setJobGroup per query so the job
count per invocation is exact:
  * the bench query set on a 500k-doc index at local[$SPARK_GRAFT_CPUS]
    (same build shape as bench.py: dps = docs//64)
  * the sf-dir operator benches bench.py times (bm25_taat_top10,
    minhash_lsh_pairs, ...), isolated with a noop-style collect
Writes one JSON line per query to stdout and (optionally) the
.explain("formatted") of each DataFrame-returning query to
<plans>/<name>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--docs", type=int, default=500000)
    ap.add_argument("--plans", default=None,
                    help="dir to write explain('formatted') files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None,
                    help="substring filter on query names")
    ap.add_argument("--base", default="/tmp/irkit_bench_extra")
    args = ap.parse_args()

    from irkit_spark.config import get_spark
    spark = get_spark("bench-extra", CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    os.makedirs(args.base, exist_ok=True)
    if args.plans:
        os.makedirs(os.path.join(HERE, args.plans), exist_ok=True)

    # ---- bench-shaped index (built once per base dir, reused across
    # before/after runs of the SAME code only when --keep) -------------
    idx_dir = os.path.join(args.base, "idx")
    from irkit_spark.operators.build import build_index
    from irkit_spark.sources.pages import pages_df
    gen_dir = os.path.join(args.base, f"pages_{args.docs}_v2")
    if not os.path.exists(os.path.join(gen_dir, "_SUCCESS")):
        pages_df(spark, args.docs).write.mode("overwrite").parquet(gen_dir)
    pages = spark.read.parquet(gen_dir)
    if not os.path.exists(os.path.join(idx_dir, "stats", "_SUCCESS")):
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.monotonic()
        m = build_index(spark, pages, idx_dir, text_from_html=True,
                        docs_per_shard=max(1000, args.docs // 64))
        print(json.dumps({"q": "build_local32_once",
                          "wall": round(time.monotonic() - t0, 3),
                          "pps": round(m["postings_per_sec"], 1)}))

    from irkit_spark.operators.query import (Index, batch_search,
                                             fuzzy_search, prefix_search,
                                             search)
    from irkit_spark.operators.selective import selective_search
    from irkit_spark.operators.tiered import (TIER_NAME,
                                              build_impact_tier,
                                              tiered_search)
    idx = Index(spark, idx_dir)
    # same untimed warmup as bench.py: distributed machinery + caches
    search(idx, "term00042", 10, "wand", local=False).collect()
    if not os.path.exists(os.path.join(idx_dir, TIER_NAME, "_SUCCESS")):
        build_impact_tier(spark, idx_dir)

    QA = "term00000 term00003 term00123"
    qset20 = {f"q{i}": f"term{i:05d} term{(i * 37 + 11) % 2000:05d}"
              for i in range(20)}

    qdefs = {
        "wand_k10": lambda: search(idx, QA, 10, "wand", local=False),
        "wand_k1000": lambda: search(
            idx, "term00002 term00005 term00050", 1000, "wand",
            local=False),
        "daat_k10": lambda: search(idx, QA, 10, "daat", local=False),
        "maxscore_k10": lambda: search(idx, QA, 10, "maxscore",
                                       local=False),
        "taat_k10": lambda: search(idx, QA, 10, "taat"),
        "batch_wand_20q": lambda: batch_search(idx, qset20, 10, "wand"),
        "prefix_wand_k10": lambda: prefix_search(
            idx, "term0000* term00123", 10, "wand", local=False),
        "fuzzy_wand_k10": lambda: fuzzy_search(
            idx, "term00000x~ term00123", 10, "wand", local=False),
        "selective_wand_k10": lambda: selective_search(idx, QA, 10),
        "tiered_wand_k10": lambda: tiered_search(idx, QA, 10),
    }

    # ---- sf-dir operator benches (the bench.py §3 list) --------------
    import __spark_entry__ as entry
    qs = entry.queries()
    for name in ["bm25_taat_top10", "tokenize_tf", "dedup_exact",
                 "minhash_lsh_pairs", "simhash_pairs",
                 "simhash_pairs_blocked", "ann_cosine_top10",
                 "lsh_ann_top10", "quality_scores",
                 "paragraph_dedup", "substring_dedup"]:
        qdefs[name] = (lambda n=name: qs[n](spark, SF_DIR))

    results = {}
    for name, fn in qdefs.items():
        if args.only and args.only not in name:
            continue
        walls, jobs = [], []
        for rep in range(args.reps):
            sc.setJobGroup(f"{name}#{rep}", name)
            t0 = time.monotonic()
            df = fn()
            df.collect()
            walls.append(round(time.monotonic() - t0, 3))
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(
                f"{name}#{rep}")))
            sc.setJobGroup("none", "none")
        if args.plans:
            try:
                plan = fn()._sc is not None and fn().explain  # noqa
                txt = fn()._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted"))
                with open(os.path.join(
                        HERE, args.plans,
                        f"{name}_{args.suffix}.txt"), "w") as f:
                    f.write(txt)
            except Exception as e:     # plan capture is best-effort
                print(f"plan capture failed for {name}: {e}",
                      file=sys.stderr)
        results[name] = {"walls": walls, "min": min(walls),
                         "jobs": jobs}
        print(json.dumps({"q": name, **results[name]}), flush=True)

    out = os.path.join(HERE, f"BENCH_EXTRA_{args.suffix}.json")
    with open(out, "w") as f:
        json.dump({"sf": SF_DIR, "cpus": CPUS, "docs": args.docs,
                   "results": results}, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
