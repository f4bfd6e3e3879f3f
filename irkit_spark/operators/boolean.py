"""Boolean query language over the index (SURVEY.md §2.7 set ops,
generalized): `(join AND hash) OR (merge NOT window)` — the classic
fulltext boolean surface, executed as a rewrite onto the engine's
existing exact primitives instead of a new kernel.

Semantics (frozen):
  - grammar: OR-of-ANDs with parentheses; precedence NOT > AND > OR;
    bare adjacency is NOT implicit AND (refused — ambiguity trap)
  - the expression is normalized to DNF (negations pushed to words by
    De Morgan); each clause is (positive terms, negated terms)
  - a doc matches a clause iff it contains ALL positives and NONE of
    the negatives; its clause score is conjunctive BM25/QL/JM over the
    clause's positive terms; its final score is the MAX over matching
    clauses — so the global top-k is exactly the (score, doc_id)-merge
    of per-clause top-ks, each served by search(mode="and",
    exclude_terms=...) with its lossless kernel path
  - pure-negative clauses (and bare `NOT x`) are refused: an
    unbounded complement scan is never what a caller wants at scale

Scale shape: one mode="and" kernel pass per DNF clause (clause count
capped — DNF of a hostile expression explodes) and a k*clauses-row
driver-side merge. No new shuffles beyond what search() already does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CLAUSES = 64
_TOKEN = re.compile(r"\(|\)|[A-Za-z0-9]+")


# ------------------------------------------------------------- parsing

@dataclass(frozen=True)
class _Node:
    op: str                      # 'word' | 'and' | 'or' | 'not'
    word: str | None = None
    kids: tuple = ()


def _lex(query: str) -> list[str]:
    toks = _TOKEN.findall(query)
    if "".join(toks).replace("(", "").replace(")", "") != \
            re.sub(r"[\s()]+", "", query):
        raise ValueError(f"bad boolean query {query!r}: words are "
                         "[a-z0-9]+ plus AND/OR/NOT and parentheses")
    return toks


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks, self.i = toks, 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self, want=None):
        t = self.peek()
        if t is None or (want is not None and t != want):
            raise ValueError(f"bad boolean query: expected "
                             f"{want or 'a token'}, got {t!r}")
        self.i += 1
        return t

    def expr(self):                        # OR level
        left = self.term()
        while self.peek() == "OR":
            self.eat("OR")
            left = _Node("or", kids=(left, self.term()))
        return left

    def term(self):                        # AND level; infix NOT is
        left = self.factor()               # Lucene-style AND-NOT sugar
        while self.peek() in ("AND", "NOT"):
            if self.eat() == "AND":
                right = self.factor()
            else:
                right = _Node("not", kids=(self.factor(),))
            left = _Node("and", kids=(left, right))
        if self.peek() not in (None, ")", "OR"):
            raise ValueError(
                f"bad boolean query: adjacent terms need an explicit "
                f"AND/OR/NOT (got {self.peek()!r})")
        return left

    def factor(self):
        t = self.peek()
        if t == "NOT":
            self.eat("NOT")
            return _Node("not", kids=(self.factor(),))
        if t == "(":
            self.eat("(")
            e = self.expr()
            self.eat(")")
            return e
        if t in (None, ")", "AND", "OR"):
            raise ValueError(f"bad boolean query: expected a term, "
                             f"got {t!r}")
        return _Node("word", word=self.eat().lower())


def _dnf(node: _Node, neg: bool) -> list[tuple[frozenset, frozenset]]:
    """Clauses as (positives, negatives); `neg` pushes De Morgan."""
    if node.op == "word":
        return [(frozenset(() if neg else (node.word,)),
                 frozenset((node.word,) if neg else ()))]
    if node.op == "not":
        return _dnf(node.kids[0], not neg)
    op = node.op if not neg else ("or" if node.op == "and" else "and")
    a, b = (_dnf(k, neg) for k in node.kids)
    if op == "or":
        out = a + b
    else:
        out = [(pa | pb, na | nb) for pa, na in a for pb, nb in b]
    if len(out) > MAX_CLAUSES:
        raise ValueError(f"boolean query expands to > {MAX_CLAUSES} "
                         "DNF clauses — simplify it")
    return out


def parse_boolean(query: str) -> list[tuple[frozenset, frozenset]]:
    """DNF clause list [(positive terms, negated terms)], validated:
    every clause needs >= 1 positive and no term on both sides."""
    p = _Parser(_lex(query))
    ast = p.expr()
    if p.peek() is not None:
        raise ValueError(f"bad boolean query: trailing {p.peek()!r}")
    clauses = []
    for pos, neg in _dnf(ast, False):
        if pos & neg:
            continue            # contradiction: matches nothing
        if not pos:
            raise ValueError(
                "pure-negative clause (e.g. bare NOT x): an unbounded "
                "complement scan is refused — add a positive term")
        clauses.append((pos, neg))
    # dedup + drop clauses subsumed by a weaker one (A subsumes B when
    # A.pos <= B.pos and A.neg <= B.neg: every B-match is an A-match
    # and A's score uses fewer-or-equal terms... scores differ, so only
    # drop EXACT duplicates)
    seen, out = set(), []
    for c in clauses:
        if c not in seen:
            seen.add(c)
            out.append(c)
    if not out:
        raise ValueError("boolean query is a contradiction — it can "
                         "match nothing")
    return out


# ------------------------------------------------------------ execution

def boolean_search(index, query: str, k: int = 10,
                   scorer: str = "bm25",
                   local: bool | None = None,
                   doc_filter: str | None = None) -> DataFrame:
    """Top-k (doc_id, score) for a boolean expression (module doc).
    Each DNF clause runs as search(mode="and", exclude_terms=...);
    per-doc score = max over matching clauses; ties break on doc_id.
    Lossless by the max-merge argument in the module doc."""
    from irkit_spark.operators.query import search
    clauses = parse_boolean(query)
    parts: list[DataFrame] = []
    for pos, neg in sorted(clauses,
                           key=lambda c: (sorted(c[0]), sorted(c[1]))):
        df = search(index, " ".join(sorted(pos)), k=k, mode="and",
                    scorer=scorer, local=local, doc_filter=doc_filter,
                    exclude_terms=" ".join(sorted(neg)) or None)
        parts.append(df)
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    if len(parts) == 1:
        return allp
    return (allp.groupBy("doc_id").agg(F.max("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
