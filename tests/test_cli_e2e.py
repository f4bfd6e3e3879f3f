"""CLI end-to-end walk (VERDICT r5 item 8): one sequence driving every
subcommand (except merge, whose batch prep is a library-level workflow
tested in test_merge_resume) over a tiny synthesized corpus — build ->
build-positions -> query in all its flag shapes -> delete -> compact ->
update -> verify -> evaluate -> mlt/facets/suggest/lookup. One
invariant per step; catches flag drift the per-operator tests can't.

In-process main(argv) is the sandbox stand-in for spark-submit: the
same argparse surface and command functions run, with _session()
resolving to the test session via getOrCreate()."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from irkit_spark.cli import main


def _run(capsys, argv):
    capsys.readouterr()          # drop anything buffered before us
    main(argv)
    return capsys.readouterr().out


def _trec_lines(out):
    rows = []
    for ln in out.strip().splitlines():
        qid, q0, doc, rank, score, tag = ln.split()
        assert q0 == "Q0" and tag == "irkit_spark"
        rows.append((qid, int(doc), int(rank), float(score)))
    return rows


def test_cli_end_to_end(spark, tmp_path, capsys):
    base = str(tmp_path)
    pages, idx = f"{base}/pages", f"{base}/idx"

    # synth: deterministic pages table lands where asked
    out = _run(capsys, ["synth", "--out", pages, "--n-docs", "400"])
    assert json.loads(out)["n_docs"] == 400
    assert spark.read.parquet(pages).count() == 400

    # build (html extraction path)
    out = _run(capsys, ["build", "--pages", pages, "--out", idx,
                        "--from-html", "--docs-per-shard", "200"])
    m = json.loads(out)
    assert m["total_postings"] > 0

    # build-positions: positional artifact appears
    out = _run(capsys, ["build-positions", "--pages", pages,
                        "--index", idx])
    assert json.loads(out)["positions"] > 0
    assert os.path.isdir(os.path.join(idx, "positions"))

    # query, default wand: k lines, ranks 1..k, scores non-increasing
    q = "term00001 term00010"
    out = _run(capsys, ["query", "--index", idx, "--query", q,
                        "--k", "5"])
    base_rows = _trec_lines(out)
    assert [r[2] for r in base_rows] == [1, 2, 3, 4, 5]
    assert all(a[3] >= b[3] for a, b in zip(base_rows, base_rows[1:]))

    # scorer/mode flags: ql under maxscore (r6 bounds) == ql under daat
    ql_daat = _run(capsys, ["query", "--index", idx, "--query", q,
                            "--k", "5", "--mode", "daat",
                            "--scorer", "ql", "--local", "off"])
    ql_ms = _run(capsys, ["query", "--index", idx, "--query", q,
                          "--k", "5", "--mode", "maxscore",
                          "--scorer", "ql", "--local", "off"])
    assert ql_daat == ql_ms and _trec_lines(ql_daat)

    # forced local serving matches the distributed default
    loc = _run(capsys, ["query", "--index", idx, "--query", q,
                        "--k", "5", "--local", "on"])
    assert _trec_lines(loc) == base_rows

    # selective (shard-level selection) is exact: same ranked lines
    sel = _run(capsys, ["query", "--index", idx, "--query", q,
                        "--k", "5", "--selective", "--m0", "1"])
    assert _trec_lines(sel) == base_rows

    # tiered serving is exact too: build the tier, same ranked lines
    _run(capsys, ["build-tier", "--index", idx, "--kappa", "0.7"])
    tr = _run(capsys, ["query", "--index", idx, "--query", q,
                       "--k", "5", "--tiered"])
    assert _trec_lines(tr) == base_rows

    # explain: the zero-decode report sees the tier we just built
    import json as _json
    ex = _json.loads(_run(capsys, ["explain", "--index", idx,
                                   "--query", q]).strip().splitlines()[-1])
    assert ex["route"] in ("local", "distributed")
    assert ex["artifacts"]["postings_tier"] == "fresh"
    assert ex["n_terms"] >= 1

    # wildcard / fuzzy expansion produce ranked output
    assert _trec_lines(_run(capsys, ["query", "--index", idx,
                                     "--query", "term0001*",
                                     "--wildcard", "--k", "5"]))
    assert _trec_lines(_run(capsys, ["query", "--index", idx,
                                     "--query", "term00001~1",
                                     "--fuzzy", "--k", "5"]))
    reg = _run(capsys, ["query", "--index", idx,
                        "--query", "term0000[13]", "--regex",
                        "--k", "5"])
    exp = _run(capsys, ["query", "--index", idx,
                        "--query", "term00001 term00003", "--k", "5"])
    assert reg == exp and _trec_lines(reg)

    # boolean NOT: excluded term's docs are gone
    out = _run(capsys, ["query", "--index", idx, "--query", q,
                        "--k", "400", "--exclude", "term00002",
                        "--local", "off"])
    not_docs = {r[1] for r in _trec_lines(out)}
    with_docs = {r[1] for r in _trec_lines(
        _run(capsys, ["query", "--index", idx, "--query", "term00002",
                      "--k", "400", "--local", "off"]))}
    assert not_docs and with_docs and not (not_docs & with_docs)

    # doc-filter: every hit obeys the predicate
    out = _run(capsys, ["query", "--index", idx, "--query", q,
                        "--k", "400", "--doc-filter", "doc_id < 100"])
    filt = _trec_lines(out)
    assert filt and all(r[1] < 100 for r in filt)

    # phrase (single token == containment; exercises positions)
    out = _run(capsys, ["query", "--index", idx, "--query", "term00001",
                        "--phrase", "--k", "5"])
    assert _trec_lines(out)

    # boolean expression == and-mode equivalent
    bo = _run(capsys, ["query", "--index", idx, "--query",
                       "term00001 AND term00010", "--boolean",
                       "--k", "5"])
    an = _run(capsys, ["query", "--index", idx, "--query",
                       "term00001 term00010", "--mode", "and",
                       "--k", "5"])
    assert bo == an and _trec_lines(bo)

    # unordered NEAR over the same positions artifact
    out = _run(capsys, ["query", "--index", idx,
                        "--query", "term00001 term00010",
                        "--near", "50", "--k", "5"])
    assert _trec_lines(out)

    # PRF: corpus keyed by the index's doc ids
    prf_pages = f"{base}/prf_pages"
    from irkit_spark.operators.query import Index
    ix = Index(spark, idx)
    (ix.docs.select("doc_id", "url")
     .join(spark.read.parquet(pages).select("url", "text"), "url")
     .write.parquet(prf_pages))
    out = _run(capsys, ["query", "--index", idx, "--query", "term00001",
                        "--prf", "--pages", prf_pages, "--k", "5"])
    assert _trec_lines(out)

    # queries-file: one batch pass, TREC run for every qid in order
    qfile = f"{base}/queries.tsv"
    with open(qfile, "w") as f:
        f.write("q1\tterm00001 term00010\nq2\tterm00002\n")
    run_out = _run(capsys, ["query", "--index", idx,
                            "--queries-file", qfile, "--k", "5"])
    run_rows = _trec_lines(run_out)
    assert {r[0] for r in run_rows} == {"q1", "q2"}
    run_file = f"{base}/run.txt"
    with open(run_file, "w") as f:
        f.write(run_out)

    # evaluate: qrels marking each qid's top doc relevant -> MRR 1.0
    qrels = f"{base}/qrels.txt"
    with open(qrels, "w") as f:
        for qid in ("q1", "q2"):
            top = next(r for r in run_rows if r[0] == qid and r[2] == 1)
            f.write(f"{qid} 0 {top[1]} 1\n")
    out = _run(capsys, ["evaluate", "--run", run_file,
                        "--qrels", qrels, "--k", "5"])
    all_line = [ln for ln in out.splitlines() if ln.startswith("all")][0]
    assert "MRR=1.000000" in all_line

    # mlt / facets ride the url-keyed corpus fallback
    seed_doc = base_rows[0][1]
    out = _run(capsys, ["mlt", "--index", idx, "--pages", pages,
                        "--doc-id", str(seed_doc), "--k", "5"])
    assert _trec_lines(out)
    out = _run(capsys, ["facets", "--index", idx, "--pages", pages,
                        "--query", q, "--facet-col", "lang"])
    facet_rows = [ln.split("\t") for ln in out.strip().splitlines()]
    assert facet_rows and all(int(n) > 0 for _, n in facet_rows)

    # suggest: fuzzy did-you-mean and prefix autocomplete
    out = _run(capsys, ["suggest", "--index", idx, "--word",
                        "term00001", "--n", "3"])
    assert out.strip()
    out = _run(capsys, ["suggest", "--index", idx, "--word", "term0000",
                        "--prefix", "--n", "3"])
    assert len(out.strip().splitlines()) == 3

    # lookup: term stats, doc by url, index stats
    out = _run(capsys, ["lookup", "--index", idx, "--term", "term00001"])
    assert json.loads(out)["df"] > 0
    a_url = ix.docs.select("url").first()["url"]
    out = _run(capsys, ["lookup", "--index", idx, "--url", a_url])
    assert json.loads(out)["url"] == a_url
    out = _run(capsys, ["lookup", "--index", idx])
    assert json.loads(out)["n_docs"] == 400

    # delete: tombstoned doc disappears from results
    victim = base_rows[0][1]
    out = _run(capsys, ["delete", "--index", idx, "--ids", str(victim)])
    assert json.loads(out)["n_deleted"] == 1
    out = _run(capsys, ["query", "--index", idx, "--query", q,
                        "--k", "400"])
    assert victim not in {r[1] for r in _trec_lines(out)}

    # verify: invariants hold post-delete (exit 0 = no SystemExit)
    out = _run(capsys, ["verify", "--index", idx])
    assert json.loads(out)["ok"] is True

    # compact: physical removal, same query results as tombstoned view
    idx2 = f"{base}/idx_compact"
    out = _run(capsys, ["compact", "--index", idx, "--out", idx2])
    assert json.loads(out)["n_docs"] == 399
    out = _run(capsys, ["query", "--index", idx2, "--query", q,
                        "--k", "400"])
    assert victim not in {r[1] for r in _trec_lines(out)}

    # update: upsert a batch with a brand-new term, query finds it
    batch = f"{base}/batch"
    (spark.read.parquet(pages).limit(5)
     .withColumn("text", F.concat(F.lit("zzupdatedterm "), F.col("text")))
     .select("url", "text").write.parquet(batch))
    idx3 = f"{base}/idx_updated"
    out = _run(capsys, ["update", "--index", idx2, "--pages", batch,
                        "--out", idx3])
    assert json.loads(out)["n_superseded"] == 5
    out = _run(capsys, ["query", "--index", idx3,
                        "--query", "zzupdatedterm", "--k", "10"])
    assert len(_trec_lines(out)) == 5


def test_cli_curate_and_bpe(spark, tmp_path, capsys):
    base = str(tmp_path)
    docs_path = f"{base}/docs"
    rows = [(i, "en" if i % 3 else "de",
             " ".join(f"w{i}x{j}" for j in range(30)))
            for i in range(40)]
    rows += [(100 + i, "en", rows[i][2]) for i in range(10)]  # exact dups
    rows += [(200, "en", "x"), (201, "de", "y y y")]          # too short
    spark.createDataFrame(rows, "doc_id long, lang string, text string") \
        .write.mode("overwrite").parquet(docs_path)

    out = _run(capsys, ["curate", "--docs", docs_path,
                        "--out", f"{base}/curated",
                        "--min-tokens", "10",
                        "--dedup-exact",
                        "--mixture", "de=2.0",
                        "--mixture-col", "lang",
                        "--split", "100"])
    rep = json.loads(out)
    assert rep["in"] == 52
    assert rep["quality_filter"] == 50        # two short docs dropped
    assert rep["exact_dedup"] == 40           # 10 exact dups dropped
    # mixture: 14 'de' docs doubled, 26 'en' docs once = 54
    assert rep["mixture"] == 54 == rep["out"]
    cur = spark.read.parquet(f"{base}/curated")
    assert set(cur.columns) >= {"doc_id", "lang", "text", "epoch",
                                "split"}
    assert cur.filter("lang = 'de' and epoch = 1").count() == 14
    assert {r.split for r in cur.select("split").distinct().collect()} \
        <= {"train", "val", "test"}

    out = _run(capsys, ["bpe", "--docs", docs_path,
                        "--out", f"{base}/merges", "--merges", "8"])
    assert json.loads(out)["merges"] == 8
    ms = spark.read.parquet(f"{base}/merges").orderBy("step").collect()
    assert [r.step for r in ms] == list(range(8))
    assert all(r.merged == r.lhs + r.rhs for r in ms)
