"""Round-6 corpus-curation tier: deterministic sampling, URL
canonicalization/dedup/caps, LM quality, Gopher signals, PII scrub,
benchmark contamination. Cross-engine value equality is the oracle
gate's job (__spark_entry__); these pin the operator semantics and
the properties the oracles can't see (partitioning invariance,
split disjointness, canonicalizer branch cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [Row(doc_id=i, text=f"alpha beta w{i % 7} gamma " * 3)
            for i in range(200)]
    return spark.createDataFrame(rows)


def test_hash_sample_deterministic_and_partition_invariant(spark, docs):
    from irkit_spark.pipeline.sampling import hash_sample
    a = sorted(r.doc_id for r in
               hash_sample(docs.repartition(3), 1, 5).collect())
    b = sorted(r.doc_id for r in
               hash_sample(docs.repartition(17), 1, 5).collect())
    assert a == b and 0 < len(a) < 200
    # monotone nesting: a 2/5 sample contains the 1/5 sample
    c = sorted(r.doc_id for r in hash_sample(docs, 2, 5).collect())
    assert set(a) <= set(c)


def test_mixture_sample_weights(spark):
    from irkit_spark.pipeline.sampling import hash_key, mixture_sample
    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, dom string")
    out = mixture_sample(
        docs, {"a": 2.0, "b": 0.5, "c": 3.25, "d": 0.0},
        domain_col="dom").collect()
    by = {}
    for r in out:
        by.setdefault(r.dom, []).append((r.doc_id, r.epoch))
    # integer weight: every 'a' row exactly twice, epochs 0 and 1
    assert sorted(e for _, e in by["a"]) == [0] * 100 + [1] * 100
    # w=0 drops the domain entirely
    assert "d" not in by
    # downsample: strict subset at epoch 0 only
    assert 0 < len(by["b"]) < 100
    assert all(e == 0 for _, e in by["b"])
    # fractional upsample: all rows at epochs 0-2, a subset at epoch 3
    e3 = [d for d, e in by["c"] if e == 3]
    assert sorted(e for _, e in by["c"] if e < 3) == \
        sorted([0] * 100 + [1] * 100 + [2] * 100)
    assert 0 < len(e3) < 100
    # the fractional subset is the SAME residue set hash_sample uses
    want = {r.doc_id for r in docs.filter(
        (F.col("dom") == "c")
        & (F.pmod(hash_key(F.col("doc_id")), F.lit(1_000_000))
           < F.lit(250_000))).collect()}
    assert set(e3) == want


def test_mixture_sample_default_weight_and_invariance(spark):
    from irkit_spark.pipeline.sampling import mixture_sample
    docs = spark.createDataFrame(
        [(i, "x" if i % 2 else None) for i in range(100)],
        "doc_id long, dom string")
    # unlisted and NULL domains get default_weight (here: keep-all)
    out = mixture_sample(docs, {}, domain_col="dom").collect()
    assert sorted(r.doc_id for r in out) == list(range(100))
    assert all(r.epoch == 0 for r in out)
    # partitioning invariance of the fractional pick
    half = mixture_sample(docs, {}, domain_col="dom",
                          default_weight=0.5)
    a = sorted(r.doc_id for r in half.collect())
    b = sorted(r.doc_id
               for r in mixture_sample(docs.repartition(13), {},
                                       domain_col="dom",
                                       default_weight=0.5).collect())
    assert a == b and 0 < len(a) < 100
    with pytest.raises(ValueError):
        mixture_sample(docs, {"x": -1.0}, domain_col="dom")


def test_hash_split_disjoint_total(spark, docs):
    from irkit_spark.pipeline.sampling import hash_split
    out = hash_split(docs, 100).select("doc_id", "split").collect()
    assert len(out) == 200                       # every row labeled
    assert {r.split for r in out} <= {"train", "val", "test"}
    counts = {}
    for r in out:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert counts["train"] > counts.get("val", 0)


@pytest.mark.parametrize("raw,want", [
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "https://example.com/a/b?a=1&b=2"),
    ("http://user:pw@site.example.com:80/a//",
     "http://site.example.com/a"),
    ("site.example.com/x?gclid=1&z=9", "http://site.example.com/x?z=9"),
    ("https://site.example.com", "https://site.example.com/"),
    ("http://h.co:8080/p", "http://h.co:8080/p"),   # non-default port
    ("https://h.co:80/p", "https://h.co:80/p"),     # :80 not https dflt
])
def test_canonicalize_url_cases(spark, raw, want):
    from irkit_spark.pipeline.urls import canonicalize_url
    got = (spark.createDataFrame([Row(url=raw)])
           .select(canonicalize_url(F.col("url")).alias("c"))
           .collect()[0]["c"])
    assert got == want, raw


def test_dedup_url_keep_first(spark):
    from irkit_spark.pipeline.urls import dedup_url_keep_first
    rows = [Row(doc_id=0, url="http://A.com/x?utm_source=1"),
            Row(doc_id=1, url="http://a.com/x"),
            Row(doc_id=2, url="https://a.com/x"),   # scheme differs
            Row(doc_id=3, url="http://www.a.com/x/")]
    out = {r.doc_id: r.canon_url for r in
           dedup_url_keep_first(spark.createDataFrame(rows)).collect()}
    # 0,1,3 canonicalize identically -> doc 0 wins; 2 is distinct
    assert set(out) == {0, 2}
    assert out[0] == "http://a.com/x"


def test_domain_caps(spark):
    from irkit_spark.pipeline.urls import domain_caps
    rows = [Row(doc_id=i, url=f"https://s{i % 2}.d.com/p{i}")
            for i in range(20)]
    out = domain_caps(spark.createDataFrame(rows), 3).collect()
    assert len(out) == 3                 # both hosts share domain d.com
    assert sorted(r.doc_id for r in out) == [0, 1, 2]
    assert {r.domain for r in out} == {"d.com"}


def test_lm_quality_orders_fluency(spark):
    from irkit_spark.pipeline.textstats import lm_quality
    rows = ([Row(doc_id=i, text="the cat sat on the mat")
             for i in range(20)]
            + [Row(doc_id=100, text="qzx jvw kpf qzx")])
    out = {r.doc_id: r.avg_logprob for r in
           lm_quality(spark.createDataFrame(rows)).collect()}
    assert out[0] > out[100]     # common-token doc scores higher
    assert all(v < 0 for v in out.values())


def test_lm_bigram_orders_transitions(spark):
    # word-salad with PLAUSIBLE unigrams but implausible transitions:
    # the unigram LM cannot separate doc 100 from the fluent docs
    # (same token multiset), the bigram LM must
    from irkit_spark.pipeline.textstats import (lm_quality,
                                                lm_quality_bigram)
    rows = ([Row(doc_id=i, text="the cat sat on the mat")
             for i in range(20)]
            + [Row(doc_id=100, text="mat the on cat the sat")]
            + [Row(doc_id=101, text="solo")])     # < 2 tokens
    df = spark.createDataFrame(rows)
    bi = {r.doc_id: r for r in lm_quality_bigram(df).collect()}
    uni = {r.doc_id: r.avg_logprob for r in lm_quality(df).collect()}
    assert 101 not in bi                    # no transitions -> dropped
    assert uni[0] == uni[100]               # unigram LM is blind here
    assert bi[0].avg_logprob > bi[100].avg_logprob
    assert bi[0].n_bigrams == 5
    assert all(r.avg_logprob < 0 for r in bi.values())


def test_top_terms_ranks_rare_over_common(spark):
    # "the" appears in every doc (df == n_docs -> idf ~ 0) so even
    # tf=3 must lose to the doc-unique keyword; tie-break = term asc
    from irkit_spark.pipeline.textstats import top_terms
    rows = ([Row(doc_id=i, text="the filler common words")
             for i in range(9)]
            + [Row(doc_id=100,
                   text="the the the zebra quark quark")])
    df = spark.createDataFrame(rows)
    out = {(r.doc_id, r.rank): r for r in
           top_terms(df, m=3).collect()}
    # doc 100: quark (tf=2, df=1) > zebra (tf=1, df=1) > the (tf=3,
    # df=10, idf = ln(11/11) = 0)
    assert out[(100, 1)].term == "quark"
    assert out[(100, 2)].term == "zebra"
    assert out[(100, 3)].term == "the"
    assert out[(100, 3)].tfidf == 0.0
    # doc 0: common/filler/words all tf=1 df=9 -> equal tfidf, term
    # ascending breaks the tie
    assert [out[(0, r)].term for r in (1, 2, 3)] == [
        "common", "filler", "words"]
    # every doc emits at most m rows and ranks are 1..j contiguous
    by_doc: dict = {}
    for (d, r) in out:
        by_doc.setdefault(d, []).append(r)
    for d, rs in by_doc.items():
        assert sorted(rs) == list(range(1, len(rs) + 1)), d


def test_gopher_signals(spark):
    from irkit_spark.pipeline.textstats import gopher_signals
    rows = [Row(doc_id=0, text="spam spam spam spam"),
            Row(doc_id=1, text="a b c d e f 1 2"),
            Row(doc_id=2, text="")]
    out = {r.doc_id: r for r in
           gopher_signals(spark.createDataFrame(rows)).collect()}
    assert 2 not in out                       # empty doc dropped
    assert out[0].top_token_frac == 1.0
    assert out[0].dup_bigram_frac == pytest.approx(1 - 1 / 3)
    assert out[1].frac_numeric == 0.25
    assert out[1].dup_bigram_frac == 0.0


def test_pii_scrub(spark):
    from irkit_spark.pipeline.textstats import pii_scrub
    rows = [Row(doc_id=0, text="Mail a.b@x.org or c@d.io, "
                               "ip 10.0.0.1, call +1 (202) 555-0100!"),
            Row(doc_id=1, text="clean text only")]
    out = {r.doc_id: r for r in
           pii_scrub(spark.createDataFrame(rows)).collect()}
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (2, 1, 1)
    for tok in ("a.b@x.org", "10.0.0.1", "555"):
        assert tok not in out[0].clean_text
    assert out[0].clean_text.count("<EMAIL>") == 2
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (0, 0, 0)
    assert out[1].clean_text == "clean text only"


def test_contamination(spark):
    from irkit_spark.pipeline.contamination import contamination
    bench_text = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    rows = [Row(doc_id=0, text=bench_text),               # benchmark
            Row(doc_id=1, text="x " + bench_text),        # contains it
            Row(doc_id=2, text="clean doc " + " ".join(
                f"w{i}" for i in range(12))),             # clean
            Row(doc_id=3, text="b0 b1 b2 b3 b4 b5 b6")]   # only 7-gram
    docs = spark.createDataFrame(rows)
    out = {r.doc_id: r.n_hits for r in
           contamination(docs, docs.filter("doc_id = 0"), 8).collect()}
    assert 0 in out and 1 in out        # benchmark + superstring hit
    assert 2 not in out and 3 not in out
    assert out[1] == 3                  # 3 shared 8-grams of 10 tokens


def test_contamination_partition_invariant(spark, docs):
    from irkit_spark.pipeline.contamination import contamination
    bench = docs.filter("doc_id % 50 = 0")
    a = sorted((r.doc_id, r.n_hits) for r in
               contamination(docs.repartition(2), bench).collect())
    b = sorted((r.doc_id, r.n_hits) for r in
               contamination(docs.repartition(13), bench).collect())
    assert a == b and a


def test_cross_dedup_pairs_and_apply(spark):
    from pyspark.sql import Row
    from irkit_spark.pipeline.dedup import cross_dup_pairs, dedup_against
    old = spark.createDataFrame(
        [Row(doc_id=i, text=f"shared common words doc {i} "
                            + "alpha beta gamma delta " * 3)
         for i in range(10)])
    new = spark.createDataFrame(
        # 100 = near-copy of old doc 3; 101 = genuinely new
        [Row(doc_id=100, text="shared common words doc 3 "
                              + "alpha beta gamma delta " * 3),
         Row(doc_id=101, text="entirely different content about "
                              "completely other topics qqq www eee "
                              "rrr ttt yyy uuu iii")])
    pairs = cross_dup_pairs(new, old).collect()
    assert any(r.new_id == 100 and r.old_id == 3 and r.jac == 1.0
               for r in pairs)
    assert not any(r.new_id == 101 for r in pairs)
    kept = [r.doc_id for r in dedup_against(new, old).collect()]
    assert kept == [101]
