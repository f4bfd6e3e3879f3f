"""Query-term boosts (search('jaguar^2 speed')): w scales the term's
contribution linearly in scores AND pruning bounds — verified by
construction from single-term searches, by linearity, and by
cross-mode/path identity; plus parse guards."""

from __future__ import annotations

import pytest

from irkit_spark.operators.build import build_index
from irkit_spark.operators.query import (Index, _parse_boosts,
                                         batch_search, search)

VOCAB = ["red", "fox", "dog", "lazy", "jumps", "quick", "brown",
         "river", "stone", "cloud"]
DOCS = [(d, " ".join(VOCAB[(d * 7 + j * j + (j // 3)) % len(VOCAB)]
                     for j in range(5 + (d * 13) % 40)))
        for d in range(80)]


@pytest.fixture(scope="module")
def widx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("boost") / "idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, out, docs_per_shard=25, doc_id_col="doc_id",
                key_col="doc_id", n_parts=4)
    return Index(spark, out)


def _scores(idx, q, k=80, mode="daat", **kw):
    return {r["doc_id"]: r["score"] for r in
            search(idx, q, k=k, mode=mode, local=False, **kw).collect()}


def _hits(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_parse():
    assert _parse_boosts("red fox") == ("red fox", {})
    assert _parse_boosts("red^2 fox") == ("red fox", {"red": 2.0})
    assert _parse_boosts("red^2.5 fox^1") == ("red fox", {"red": 2.5})
    with pytest.raises(ValueError, match="conflicting"):
        _parse_boosts("red^2 red^3")
    with pytest.raises(ValueError, match="> 0"):
        _parse_boosts("red^0")


def test_boost_one_is_plain(widx):
    a = _hits(search(widx, "red^1 fox^1", k=15, local=False))
    b = _hits(search(widx, "red fox", k=15, local=False))
    assert a == b and a


def test_boost_exact_by_construction(widx):
    """score('red^2 fox') == 2*score('red') + score('fox') per doc
    (boost 2 and the pinned term-order add keep this float-exact)."""
    s_red = _scores(widx, "red")
    s_fox = _scores(widx, "fox")
    got = _scores(widx, "red^2 fox")
    want = {}
    for d in set(s_red) | set(s_fox):
        want[d] = 2.0 * s_red.get(d, 0.0) + s_fox.get(d, 0.0)
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12), d


def test_boost_all_modes_and_local_agree(widx):
    q = "red^3 fox dog^0.5"
    base80 = _hits(search(widx, q, k=80, mode="daat", local=False))
    base = base80[:15]
    for mode in ("taat", "wand", "maxscore", "and"):
        got = _hits(search(widx, q, k=15, mode=mode, local=False))
        if mode == "and":
            all_and = {d for d, _ in
                       _hits(search(widx, "red fox dog", k=80,
                                    mode="and", local=False))}
            assert got == [h for h in base80
                           if h[0] in all_and][:15] and got
        else:
            assert got == base, mode
    assert _hits(search(widx, q, k=15)) == base   # auto-local path
    assert base


def test_boost_changes_ranking(widx):
    plain = [d for d, _ in _hits(search(widx, "red stone", k=80,
                                        mode="daat", local=False))]
    boosted = [d for d, _ in _hits(search(widx, "red stone^9", k=80,
                                          mode="daat", local=False))]
    assert plain != boosted and set(plain) == set(boosted)


def test_boost_batch_matches_single(widx):
    qs = {"a": "red^2 fox", "b": "lazy dog^4"}
    got = {(r["query_id"], r["doc_id"], round(r["score"], 9))
           for r in batch_search(widx, qs, k=8).collect()}
    want = set()
    for qid, q in qs.items():
        want |= {(qid, d, s) for d, s in
                 _hits(search(widx, q, k=8, local=False))}
    assert got == want and got


def test_boost_guards(widx):
    with pytest.raises(ValueError, match="bm25"):
        search(widx, "red^2 fox", scorer="ql", mode="daat")
