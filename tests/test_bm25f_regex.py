"""Round-6 search features: BM25F field-weighted scoring and
regex-expanded retrieval (Lucene RegexpQuery analog). Cross-engine
value equality lives in the oracle gate; these pin the semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from irkit_spark.operators.query import regex_search, search
from irkit_spark.operators.sqlpath import bm25_topk_text, bm25f_topk_text


def test_regex_search_equals_explicit_disjunction(index_small):
    idx, _ = index_small
    a = [(r.doc_id, r.score) for r in
         regex_search(idx, "term00010|term00003", 10,
                      local=False).collect()]
    b = [(r.doc_id, r.score) for r in
         search(idx, "term00003 term00010", 10, local=False).collect()]
    assert a == b and a


def test_regex_search_driver_and_filter_paths_agree(
        spark, index_small, monkeypatch):
    from irkit_spark import config as cfg
    from irkit_spark.operators.query import Index
    idx, _ = index_small
    path = idx.path
    a = [(r.doc_id, round(r.score, 9)) for r in
         regex_search(idx, "term0001[0-9]", 10, local=False).collect()]
    # force the over-gate terms-table rlike path
    monkeypatch.setattr(cfg, "BROADCAST_VOCAB_MAX", 0)
    import irkit_spark.operators.query as qmod
    monkeypatch.setattr(qmod.config, "BROADCAST_VOCAB_MAX", 0)
    idx2 = Index(spark, path)
    b = [(r.doc_id, round(r.score, 9)) for r in
         regex_search(idx2, "term0001[0-9]", 10, local=False).collect()]
    assert a == b and a


def test_regex_search_guards(index_small):
    idx, _ = index_small
    with pytest.raises(ValueError, match="entire lexicon"):
        regex_search(idx, ".*")
    with pytest.raises(Exception):          # bad regex syntax
        regex_search(idx, "te[rm")
    # matching nothing -> empty, like an all-OOV query
    assert regex_search(idx, "zzz[0-9]{4}qq").count() == 0


@pytest.fixture(scope="module")
def fielded(spark):
    rows = [
        # doc 0: query term in TITLE; doc 1: same term in BODY only
        Row(doc_id=0, title="apple pie", body="filler words here now"),
        Row(doc_id=1, title="other things", body="apple tart recipe x"),
        Row(doc_id=2, title="unrelated", body="nothing to see here"),
    ]
    return spark.createDataFrame(rows)


def test_bm25f_title_weight_beats_body(spark, fielded):
    out = [(r.doc_id, r.score) for r in
           bm25f_topk_text(fielded, "apple",
                           {"title": 3.0, "body": 1.0}, 10).collect()]
    assert [d for d, _ in out] == [0, 1]     # title hit outranks body
    assert out[0][1] > out[1][1] > 0


def test_bm25f_equal_single_field_matches_bm25(spark, fielded):
    """One field at weight 1.0 reduces BM25F to plain BM25 over that
    field: idf * (tf/norm)/(k1 + tf/norm) == idf * tf/(tf + k1*norm).
    Algebraically identical, different float expression order — so
    approx, not bit, equality."""
    a = [(r.doc_id, r.score) for r in
         bm25f_topk_text(fielded, "apple", {"body": 1.0}, 10,
                         round_dp=None).collect()]
    b = [(r.doc_id, r.score) for r in
         bm25_topk_text(fielded.select(
             "doc_id", F.col("body").alias("text")), "apple", 10,
             round_dp=None).collect()]
    assert [d for d, _ in a] == [d for d, _ in b] and a
    for (_, sa), (_, sb) in zip(a, b):
        assert sa == pytest.approx(sb, rel=1e-12)


def test_bm25f_requires_fields(spark, fielded):
    with pytest.raises(ValueError):
        bm25f_topk_text(fielded, "apple", {}, 10)
