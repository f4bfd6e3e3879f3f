"""Prefix / wildcard queries (operators/query.expand_wildcards +
prefix_search): expansion == manual disjunction, deterministic
(df DESC, term ASC) cap, OOV-like misses, dict and distributed
expansion paths agree, guards."""

from __future__ import annotations

import pytest

from irkit_spark.operators.build import build_index
from irkit_spark.operators.query import (Index, expand_wildcards,
                                         prefix_search, search)

VOCAB = ["red", "fox", "dog", "lazy", "jumps", "quick", "brown",
         "river", "stone", "cloud"]
DOCS = [(d, " ".join(VOCAB[(d * 7 + j * j + (j // 3)) % len(VOCAB)]
                     for j in range(5 + (d * 13) % 40)))
        for d in range(80)]


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pfx") / "idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, out, docs_per_shard=25, doc_id_col="doc_id",
                key_col="doc_id", n_parts=4)
    return Index(spark, out)


def _hits(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_expansion_and_rank_identity(pidx):
    exp, info = expand_wildcards(pidx, "r* cloud")
    assert info == {"r*": sorted(
        ["red", "river"],
        key=lambda t: (-pidx.term_stats(t)["df"], t))}
    assert exp.split() == sorted(["cloud", "red", "river"])
    for mode in ("taat", "wand", "maxscore", "and"):
        a = _hits(prefix_search(pidx, "r* cloud", k=20, mode=mode,
                                local=False))
        b = _hits(search(pidx, "red river cloud", k=20, mode=mode,
                         local=False))
        assert a == b and a, mode


def test_expansion_cap_deterministic(pidx):
    dfs = {t: pidx.term_stats(t)["df"] for t in ("red", "river")}
    top = sorted(dfs, key=lambda t: (-dfs[t], t))[0]
    exp, info = expand_wildcards(pidx, "r*", max_expansions=1)
    assert info["r*"] == [top] and exp == top
    assert _hits(prefix_search(pidx, "r*", k=10, max_expansions=1,
                               local=False)) == \
        _hits(search(pidx, top, k=10, local=False))


def test_wildcard_miss_is_oov(pidx):
    assert prefix_search(pidx, "zz*", k=10).count() == 0
    assert _hits(prefix_search(pidx, "zz* fox", k=10, local=False)) \
        == _hits(search(pidx, "fox", k=10, local=False))


def test_distributed_expansion_path_agrees(pidx):
    exp_dict, _ = expand_wildcards(pidx, "s* j* red")
    pidx2 = Index(pidx.spark, pidx.path)
    pidx2._terms_dict = lambda: None     # force the terms-scan branch
    exp_scan, _ = expand_wildcards(pidx2, "s* j* red")
    assert exp_dict == exp_scan
    assert "stone" in exp_dict and "jumps" in exp_dict


def test_local_serving_path(pidx):
    a = _hits(prefix_search(pidx, "c* fox", k=10))          # auto local
    b = _hits(prefix_search(pidx, "c* fox", k=10, local=False))
    assert a == b and a


def test_guards(pidx):
    with pytest.raises(ValueError, match="entire lexicon"):
        expand_wildcards(pidx, "* fox")
    with pytest.raises(ValueError, match="bad query token"):
        expand_wildcards(pidx, "re*d")
    with pytest.raises(ValueError, match="max_expansions"):
        expand_wildcards(pidx, "r*", max_expansions=0)
    assert expand_wildcards(pidx, "") == ("", {})
