"""Boolean NOT (search(exclude_terms=)): selection-only exclusion —
docs containing any excluded term drop, survivors score identically —
verified against a brute-force subset on every mode and path (kernel
distributed, kernel local, TAAT anti-join), plus combination with
doc_filter and wildcard exclusion via prefix_search."""

from __future__ import annotations

import pytest

from irkit_spark.functions.tokenize import tokenize
from irkit_spark.operators.build import build_index
from irkit_spark.operators.query import Index, prefix_search, search

VOCAB = ["red", "fox", "dog", "lazy", "jumps", "quick", "brown",
         "river", "stone", "cloud"]
DOCS = [(d, " ".join(VOCAB[(d * 7 + j * j + (j // 3)) % len(VOCAB)]
                     for j in range(5 + (d * 13) % 40)))
        for d in range(80)]
EXCL = "stone cloud"
EXCL_DOCS = {d for d, t in DOCS
             if set(tokenize(EXCL)) & set(tokenize(t))}


@pytest.fixture(scope="module")
def bidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bool") / "idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, out, docs_per_shard=25, doc_id_col="doc_id",
                key_col="doc_id", n_parts=4)
    return Index(spark, out)


def _hits(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_not_equals_bruteforce_subset_all_modes(bidx):
    """Excluded == full ranking minus EXCL_DOCS, scores unchanged —
    on every mode, and all kernel modes agree with each other."""
    q = "red fox jumps"
    full = _hits(search(bidx, q, k=80, mode="daat", local=False))
    expect = [(d, s) for d, s in full if d not in EXCL_DOCS][:15]
    assert expect and len(expect) < len(full)
    for mode in ("taat", "daat", "wand", "maxscore"):
        got = _hits(search(bidx, q, k=15, mode=mode, local=False,
                           exclude_terms=EXCL))
        assert got == expect, mode
    got_and = _hits(search(bidx, q, k=80, mode="and", local=False,
                           exclude_terms=EXCL))
    full_and = _hits(search(bidx, q, k=80, mode="and", local=False))
    assert got_and == [(d, s) for d, s in full_and
                       if d not in EXCL_DOCS] and got_and


def test_not_local_serving_identical(bidx):
    q = "lazy dog"
    a = _hits(search(bidx, q, k=12, exclude_terms=EXCL))  # auto local
    b = _hits(search(bidx, q, k=12, local=False, exclude_terms=EXCL))
    assert a == b and a
    assert not {d for d, _ in a} & EXCL_DOCS


def test_not_with_doc_filter(bidx):
    q = "red river"
    got = _hits(search(bidx, q, k=40, local=False,
                       doc_filter="doc_id % 2 = 0",
                       exclude_terms=EXCL))
    full = _hits(search(bidx, q, k=80, mode="daat", local=False))
    expect = [(d, s) for d, s in full
              if d % 2 == 0 and d not in EXCL_DOCS][:40]
    assert got == expect and got


def test_not_oov_is_noop_and_conflicts_raise(bidx):
    q = "quick brown"
    assert _hits(search(bidx, q, k=10, local=False,
                        exclude_terms="zzz")) == \
        _hits(search(bidx, q, k=10, local=False))
    with pytest.raises(ValueError, match="both query"):
        search(bidx, q, exclude_terms="brown stone")
    with pytest.raises(ValueError, match="prefix_search"):
        search(bidx, q, exclude_terms="sto*")


def test_not_everything_excluded_empty(bidx):
    # every doc contains at least one of the ten vocab words; exclude
    # the query term itself is illegal, so exclude all OTHER terms and
    # query a term whose docs all carry another vocab word
    got = search(bidx, "red", k=10, local=False,
                 exclude_terms=" ".join(v for v in VOCAB if v != "red"))
    red_only = {d for d, t in DOCS
                if set(tokenize(t)) == {"red"}}
    assert {r["doc_id"] for r in got.collect()} == red_only


def test_prefix_search_wildcard_exclusion(bidx):
    got = _hits(prefix_search(bidx, "red fox", k=15, local=False,
                              exclude_terms="st* cloud"))
    want = _hits(search(bidx, "red fox", k=15, local=False,
                        exclude_terms="stone cloud"))
    assert got == want and got
