"""Fuzzy (edit-distance-1) queries — operators/query.expand_fuzzy,
fuzzy_search, suggest: _lev1 == classic Levenshtein<=1 (the exact
predicate Spark's F.levenshtein and DuckDB's levenshtein implement),
expansion == manual disjunction across every mode, deterministic
(df DESC, term ASC) cap, misses behave like OOV, the driver-dict and
distributed terms-scan paths agree, guards."""

from __future__ import annotations

import itertools

import pytest

from irkit_spark.operators.build import build_index
from irkit_spark.operators.query import (Index, _lev1, expand_fuzzy,
                                         fuzzy_search, search, suggest)

# hash/fast/mast are mutual ED-2 with a shared ED-1 neighbor 'hast';
# join/rain/main share 'jain'/'made-up' neighbors — multi-expansion
# patterns for cap determinism
VOCAB = ["hash", "fast", "mast", "join", "rain", "main",
         "value", "table", "query", "scan"]
DOCS = [(d, " ".join(VOCAB[(d * 7 + j * j + (j // 3)) % len(VOCAB)]
                     for j in range(5 + (d * 13) % 40)))
        for d in range(80)]


@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuz") / "idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, out, docs_per_shard=25, doc_id_col="doc_id",
                key_col="doc_id", n_parts=4)
    return Index(spark, out)


def _hits(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def _lev_ref(a: str, b: str) -> int:
    """Textbook DP Levenshtein (insert/delete/substitute)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev1_matches_reference_exhaustive():
    words = ["".join(w) for n in range(4)
             for w in itertools.product("ab", repeat=n)]
    for a in words:
        for b in words:
            assert _lev1(a, b) == (_lev_ref(a, b) <= 1), (a, b)
    # longer spot checks incl. the transposition trap (= distance 2)
    assert _lev1("hast", "hash") and _lev1("hast", "fast")
    assert _lev1("jon", "join") and _lev1("scann", "scan")
    assert not _lev1("ab", "ba") and not _lev1("join", "rain")


def test_expansion_and_rank_identity(fidx):
    exp, info = expand_fuzzy(fidx, "hast~ value")
    want = sorted(["hash", "fast", "mast"],
                  key=lambda t: (-fidx.term_stats(t)["df"], t))
    assert info == {"hast~": want}
    assert exp.split() == sorted(["value"] + want)
    for mode in ("taat", "wand", "maxscore", "and"):
        a = _hits(fuzzy_search(fidx, "hast~ value", k=20, mode=mode,
                               local=False))
        b = _hits(search(fidx, "hash fast mast value", k=20, mode=mode,
                         local=False))
        assert a == b, mode
        assert a or mode == "and", mode   # no doc holds all 4 terms


def test_expansion_cap_deterministic(fidx):
    dfs = {t: fidx.term_stats(t)["df"] for t in ("join", "rain", "main")}
    ranked = sorted(dfs, key=lambda t: (-dfs[t], t))
    for cap in (1, 2):
        exp, info = expand_fuzzy(fidx, "jain~", max_expansions=cap)
        assert info["jain~"] == ranked[:cap]
        assert _hits(fuzzy_search(fidx, "jain~", k=10,
                                  max_expansions=cap, local=False)) == \
            _hits(search(fidx, " ".join(ranked[:cap]), k=10,
                         local=False))


def test_in_vocab_fuzzy_token_keeps_itself(fidx):
    # distance 0 is within the neighborhood; 'hash' has no ED-1 vocab
    # neighbor (hast is not indexed), so the expansion is exactly itself
    exp, info = expand_fuzzy(fidx, "hash~")
    assert info == {"hash~": ["hash"]} and exp == "hash"
    assert _hits(fuzzy_search(fidx, "hash~ value", k=10, local=False)) \
        == _hits(search(fidx, "hash value", k=10, local=False))


def test_fuzzy_miss_is_oov(fidx):
    assert fuzzy_search(fidx, "zzzz~", k=10).count() == 0
    assert _hits(fuzzy_search(fidx, "zzzz~ scan", k=10, local=False)) \
        == _hits(search(fidx, "scan", k=10, local=False))


def test_distributed_expansion_path_agrees(fidx):
    fidx2 = Index(fidx.spark, fidx.path)
    fidx2._terms_dict = lambda: None     # force the terms-scan branch
    for q, cap in (("hast~ jain~ value", 8), ("jain~", 2), ("zz~", 8)):
        assert expand_fuzzy(fidx, q, cap) == expand_fuzzy(fidx2, q, cap)


def test_suggest_ordering_and_paths(fidx):
    dfs = {t: fidx.term_stats(t)["df"] for t in ("join", "rain", "main")}
    want = [(t, dfs[t]) for t in sorted(dfs, key=lambda t: (-dfs[t], t))]
    got = [(r["term"], r["df"]) for r in suggest(fidx, "jain").collect()]
    assert got == want
    assert [(r["term"], r["df"])
            for r in suggest(fidx, "jain", n=1).collect()] == want[:1]
    fidx2 = Index(fidx.spark, fidx.path)
    fidx2._terms_dict = lambda: None
    assert [(r["term"], r["df"])
            for r in suggest(fidx2, "jain").collect()] == want
    assert suggest(fidx, "zzzz").count() == 0


def test_local_serving_path(fidx):
    a = _hits(fuzzy_search(fidx, "hast~ scan", k=10))        # auto local
    b = _hits(fuzzy_search(fidx, "hast~ scan", k=10, local=False))
    assert a == b and a


def test_guards(fidx):
    with pytest.raises(ValueError, match="bad query token"):
        expand_fuzzy(fidx, "ha~sh")
    with pytest.raises(ValueError, match="bad query token"):
        expand_fuzzy(fidx, "~")
    with pytest.raises(ValueError, match="max_expansions"):
        expand_fuzzy(fidx, "hast~", max_expansions=0)
    with pytest.raises(ValueError, match="bad word"):
        suggest(fidx, "not a word")
    with pytest.raises(ValueError, match="n must be"):
        suggest(fidx, "hash", n=0)


def test_lev_le_matches_reference_exhaustive():
    from irkit_spark.operators.query import _lev_le
    words = ["".join(w) for n in range(5)
             for w in itertools.product("ab", repeat=n)]
    for a in words:
        for b in words:
            for k in (1, 2):
                assert _lev_le(a, b, k) == (_lev_ref(a, b) <= k), \
                    (a, b, k)
    # transpositions are distance 2 classic: reachable at ~2 only
    assert not _lev_le("jion", "join", 1) and _lev_le("jion", "join", 2)
    assert _lev_le("hastt", "fast", 2) and not _lev_le("hastt", "fast", 1)


def test_ed2_expansion_and_written_keys(fidx):
    # 'jion' is a transposition of 'join': invisible at ~1, found at ~2
    exp1, info1 = expand_fuzzy(fidx, "jion~")
    assert info1 == {"jion~": []} and exp1 == ""
    exp2, info2 = expand_fuzzy(fidx, "jion~2 value")
    assert info2 == {"jion~2": ["join"]}
    assert exp2.split() == ["join", "value"]
    assert _hits(fuzzy_search(fidx, "jion~2 value", k=10, local=False)) \
        == _hits(search(fidx, "join value", k=10, local=False))
    # '~1' is the explicit spelling of '~'
    assert expand_fuzzy(fidx, "hast~1")[1]["hast~1"] == \
        expand_fuzzy(fidx, "hast~")[1]["hast~"]


def test_ed2_distributed_path_agrees(fidx):
    fidx2 = Index(fidx.spark, fidx.path)
    fidx2._terms_dict = lambda: None     # force the terms-scan branch
    for q in ("jion~2 hast~ value", "hast~2", "jain~2 jain~"):
        a = expand_fuzzy(fidx, q)
        b = expand_fuzzy(fidx2, q)
        assert a == b, q


def test_suggest_max_edit(fidx):
    dfs = {t: fidx.term_stats(t)["df"] for t in VOCAB}
    want = sorted(((t, dfs[t]) for t in VOCAB
                   if _lev_ref("jion", t) <= 2),
                  key=lambda h: (-h[1], h[0]))
    got = [(r["term"], r["df"])
           for r in suggest(fidx, "jion", max_edit=2).collect()]
    assert got == [(t, int(c)) for t, c in want] and got
    assert suggest(fidx, "jion", max_edit=1).count() == 0
    with pytest.raises(ValueError, match="max_edit"):
        suggest(fidx, "jion", max_edit=3)
