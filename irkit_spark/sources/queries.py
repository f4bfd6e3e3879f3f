"""Deterministic reference query set stand-in (FIXTURES.md F2).

/root/reference was an empty mount (SURVEY.md §0), so the "reference
query set" is frozen here: seeded queries over the F1 vocabulary —
head-term-heavy, mid, tail-only, partially and fully OOV.
"""

from __future__ import annotations

import numpy as np

SEED = 42


def query_set(n: int = 50) -> list[dict]:
    rng = np.random.default_rng(SEED)
    ks = [10, 100, 1000]
    out = []
    for qid in range(n):
        r = qid % 10
        nt = int(rng.integers(1, 6))
        if r < 4:        # head-heavy
            terms = [f"term{int(rng.integers(0, 20)):05d}"
                     for _ in range(nt)]
        elif r < 8:      # mid
            terms = [f"term{int(rng.integers(20, 1000)):05d}"
                     for _ in range(nt)]
        elif r == 8:     # tail-only
            terms = [f"term{int(rng.integers(3000, 5000)):05d}"
                     for _ in range(nt)]
        else:            # one OOV term mixed in (or all-OOV every 30th)
            terms = [f"term{int(rng.integers(0, 1000)):05d}"
                     for _ in range(max(1, nt - 1))]
            terms.append("zzoovq" if qid % 30 else "")
            if qid % 30 == 9:
                terms = ["zzoovq", "qqvooz"]       # all-OOV -> empty
        out.append({"query_id": qid, "query": " ".join(t for t in terms
                                                       if t),
                    "k": ks[qid % 3]})
    return out
