"""Golden TREC-run regression (FIXTURES.md F2): the full 50-query
reference-query-set stand-in, run as block-max WAND over the
deterministic 1000-page fixture, compared byte-for-byte against a
committed golden file.

This catches drift the runtime oracles can't: if the frozen tokenizer
/ extractor / scorer changes, an oracle recomputed with the same
drifted code would still agree — the golden file won't.

Regenerate (ONLY for an intentional frozen-semantics change; explain in
the commit): IRKIT_REGEN_GOLDEN=1 python -m pytest tests/test_golden_run.py
"""

from __future__ import annotations

import os

from irkit_spark.operators.query import search
from irkit_spark.sources.queries import query_set

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "trec_run_pages1000.txt")


def render_run(idx) -> str:
    lines = []
    for q in query_set(50):
        rows = search(idx, q["query"], k=min(q["k"], 20),
                      mode="wand").collect()
        for rank, r in enumerate(rows, 1):
            lines.append(f"{q['query_id']} Q0 {r['doc_id']} {rank} "
                         f"{r['score']:.9f} irkit_spark")
    return "\n".join(lines) + "\n"


def test_golden_trec_run(index_small):
    idx, _ = index_small
    got = render_run(idx)
    if os.environ.get("IRKIT_REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(got)
    assert os.path.exists(GOLDEN), \
        "golden file missing — IRKIT_REGEN_GOLDEN=1 to bootstrap"
    with open(GOLDEN) as f:
        want = f.read()
    assert got == want, "engine output drifted from the frozen golden run"
