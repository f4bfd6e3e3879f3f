"""Boolean query language (operators/boolean.py): parser/DNF unit
pins + execution equivalence against the engine's own primitives."""

from __future__ import annotations

import pytest

from irkit_spark.operators.boolean import boolean_search, parse_boolean
from irkit_spark.operators.query import search


def _c(pos, neg=()):
    return (frozenset(pos), frozenset(neg))


def test_parse_dnf_shapes():
    assert parse_boolean("a AND b") == [_c({"a", "b"})]
    assert sorted(parse_boolean("a OR b")) == sorted(
        [_c({"a"}), _c({"b"})])
    assert parse_boolean("a NOT b") == [_c({"a"}, {"b"})]
    # distribution + De Morgan: a AND NOT (b OR c) -> one clause
    assert parse_boolean("a AND NOT (b OR c)") == [_c({"a"}, {"b", "c"})]
    # (a OR b) AND c -> two clauses
    assert sorted(parse_boolean("(a OR b) AND c")) == sorted(
        [_c({"a", "c"}), _c({"b", "c"})])
    # double negation
    assert parse_boolean("a AND NOT NOT b") == [_c({"a", "b"})]


def test_parse_errors():
    for bad in ("a b",              # adjacency without operator
                "NOT a",            # pure negative
                "a AND",            # dangling operator
                "(a OR b",          # unbalanced parens
                "a && b"):          # bad characters
        with pytest.raises(ValueError):
            parse_boolean(bad)
    with pytest.raises(ValueError):       # contradiction-only
        parse_boolean("a NOT a")


def test_boolean_and_matches_and_mode(index_small):
    idx, _ = index_small
    a = [(r.doc_id, r.score) for r in
         boolean_search(idx, "term00000 AND term00003", 10).collect()]
    b = [(r.doc_id, r.score) for r in
         search(idx, "term00000 term00003", 10, "and").collect()]
    assert a == b and a


def test_boolean_not_matches_exclude(index_small):
    idx, _ = index_small
    a = [(r.doc_id, r.score) for r in
         boolean_search(idx, "term00000 NOT term00003", 10).collect()]
    b = [(r.doc_id, r.score) for r in
         search(idx, "term00000", 10, "and",
                exclude_terms="term00003").collect()]
    assert a == b and a


def test_boolean_demorgan_execution(index_small):
    idx, _ = index_small
    a = [(r.doc_id, r.score) for r in
         boolean_search(idx, "term00000 AND NOT (term00003 OR "
                             "term00150)", 10).collect()]
    b = [(r.doc_id, r.score) for r in
         search(idx, "term00000", 10, "and",
                exclude_terms="term00003 term00150").collect()]
    assert a == b and a


def test_boolean_or_max_merge(index_small):
    """OR of clauses == max-merge over the full per-clause score sets
    (the losslessness claim for the per-clause top-k merge)."""
    idx, _ = index_small
    q = "(term00000 AND term00003) OR term00150"
    got = [(r.doc_id, round(r.score, 9)) for r in
           boolean_search(idx, q, 10).collect()]
    full = {}
    for clause_q, clause_mode in (("term00000 term00003", "and"),
                                  ("term00150", "and")):
        for r in search(idx, clause_q, 5000, clause_mode).collect():
            s = round(r.score, 9)
            if s > full.get(r.doc_id, float("-inf")):
                full[r.doc_id] = s
    want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want and got


def test_batch_search_ql_jm_pruned_matches_per_query(index_small):
    """batch_search with ql/jm under wand (gate lifted r6) == the
    per-query results, per qid."""
    from irkit_spark.operators.query import batch_search
    idx, _ = index_small
    queries = {"a": "term00000 term00003", "b": "term00150"}
    for scorer in ("ql", "jm"):
        rows = batch_search(idx, queries, k=5, mode="wand",
                            scorer=scorer).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["score"]))
        for qid, q in queries.items():
            want = [(r["doc_id"], r["score"]) for r in
                    search(idx, q, 5, "wand", scorer=scorer,
                           local=False).collect()]
            got = sorted(by_q[qid], key=lambda x: (-x[1], x[0]))
            assert got == want, (scorer, qid)
