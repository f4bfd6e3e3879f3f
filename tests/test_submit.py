"""spark-submit --py-files shipping (BASELINE.json: the pipeline
"ships via spark-submit --py-files"): build the dist zip, then drive
synth -> build -> query as REAL spark-submit runs from a directory
that contains only the zip and the entry file — the engine package
must arrive on the driver/executors via --py-files alone."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(tmp_path):
    subprocess.run([sys.executable,
                    os.path.join(HERE, "tools", "make_zip.py")],
                   check=True, capture_output=True)
    shutil.copy(os.path.join(HERE, "dist", "irkit_spark.zip"), tmp_path)
    shutil.copy(os.path.join(HERE, "tools", "submit_main.py"), tmp_path)
    env = {k: v for k, v in os.environ.items()}
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    # PYTHONPATH must NOT leak the repo; the zip is the only source
    env.pop("PYTHONPATH", None)

    def submit(*args):
        r = subprocess.run(
            ["spark-submit", "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=8",
             "--py-files", "irkit_spark.zip", "submit_main.py", *args],
            cwd=tmp_path, env=env, capture_output=True, text=True,
            timeout=420)
        assert r.returncode == 0, r.stderr[-3000:]
        return r.stdout

    out = submit("synth", "--n-docs", "600", "--out", "pages")
    assert json.loads(out.strip().splitlines()[-1])["n_docs"] == 600
    out = submit("build", "--pages", "pages", "--out", "idx",
                 "--from-html", "--docs-per-shard", "300")
    m = json.loads(out.strip().splitlines()[-1])
    assert m["n_docs"] == 600 and m["total_postings"] > 0
    out = submit("query", "--index", "idx",
                 "--query", "term00000 term00007", "--k", "5",
                 "--mode", "maxscore")
    lines = [ln for ln in out.strip().splitlines() if " Q0 " in ln]
    assert len(lines) == 5          # TREC run format, k rows
    ranks = [int(ln.split()[3]) for ln in lines]
    assert ranks == [1, 2, 3, 4, 5]

    # whole-file TREC run (one distributed batch_search pass); the
    # single-query leg above must reappear verbatim under its qid
    (tmp_path / "queries.tsv").write_text(
        "q7\tterm00000 term00007\nq9\tterm00001 term00123\n"
        "\nqoov\tzzznotaterm\n")
    out = submit("query", "--index", "idx",
                 "--queries-file", "queries.tsv", "--k", "5",
                 "--mode", "maxscore")
    blines = [ln for ln in out.strip().splitlines() if " Q0 " in ln]
    got_q7 = [ln.split() for ln in blines if ln.startswith("q7 ")]
    assert [g[2:5] for g in got_q7] == \
        [ln.split()[2:5] for ln in lines]          # same docs/ranks/scores
    assert len([ln for ln in blines if ln.startswith("q9 ")]) == 5
    assert not any(ln.startswith("qoov ") for ln in blines)  # OOV: no rows
