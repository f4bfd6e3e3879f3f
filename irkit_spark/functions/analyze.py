"""Opt-in analyzer chain: stopword removal + S-stemming, applied as a
PROJECTION over the corpus before build (and to query strings at
query time) — the Lucene Analyzer analog, Spark-first: the index
machinery and its frozen tokenizer stay untouched, because analyzed
tokens are still `[a-z0-9]+` and `analyze_docs` simply rewrites the
text column as space-joined analyzed tokens. Build over the analyzed
table, query through `analyze_query`, and plural/singular forms fold
together.

The stemmer is the FROZEN S-removal stemmer (Harman 1991, "How
effective is suffixing?"), chosen over Porter because its three rules
are exactly expressible in ANSI SQL — the DuckDB oracle reproduces
the whole chain verbatim (a Porter/Snowball twin would need the fts
extension, absent in this sandbox):

    1. len >= 4, ends 'ies', not ('eies','aies')  -> drop 'ies', add 'y'
    2. len >= 3, ends 'es',  not ('aes','ees','oes') -> drop 's'
    3. len >= 3, ends 's',   not ('us','ss')      -> drop 's'
    else unchanged. First matching rule wins; rules apply once.

All three forms below (python / Spark Column / SQL text) implement
the rules identically — rank identity across the index path, the TAAT
SQL path, and the oracle depends on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE
from irkit_spark.functions.tokenize import tokenize

# frozen default stopword list (matches textstats.STOPWORDS["en"])
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "for")


def s_stem(word: str) -> str:
    """Scalar S-stemmer (query side, tests)."""
    if len(word) >= 4 and word.endswith("ies") and \
            not word.endswith(("eies", "aies")):
        return word[:-3] + "y"
    if len(word) >= 3 and word.endswith("es") and \
            not word.endswith(("aes", "ees", "oes")):
        return word[:-1]
    if len(word) >= 3 and word.endswith("s") and \
            not word.endswith(("us", "ss")):
        return word[:-1]
    return word


def s_stem_col(t: Column) -> Column:
    """The same rules as a Spark column expression (codegen'd)."""
    n = F.length(t)
    return (
        F.when((n >= 4) & t.endswith("ies")
               & ~t.endswith("eies") & ~t.endswith("aies"),
               F.concat(F.substring(t, 1, n - 3), F.lit("y")))
        .when((n >= 3) & t.endswith("es")
              & ~t.endswith("aes") & ~t.endswith("ees")
              & ~t.endswith("oes"),
              F.substring(t, 1, n - 1))
        .when((n >= 3) & t.endswith("s")
              & ~t.endswith("us") & ~t.endswith("ss"),
              F.substring(t, 1, n - 1))
        .otherwise(t))


def s_stem_sql(t: str) -> str:
    """The same rules as SQL text (DuckDB oracle form)."""
    return f"""(CASE
 WHEN length({t}) >= 4 AND {t} LIKE '%ies'
      AND NOT ({t} LIKE '%eies' OR {t} LIKE '%aies')
      THEN substr({t}, 1, length({t}) - 3) || 'y'
 WHEN length({t}) >= 3 AND {t} LIKE '%es'
      AND NOT ({t} LIKE '%aes' OR {t} LIKE '%ees' OR {t} LIKE '%oes')
      THEN substr({t}, 1, length({t}) - 1)
 WHEN length({t}) >= 3 AND {t} LIKE '%s'
      AND NOT ({t} LIKE '%us' OR {t} LIKE '%ss')
      THEN substr({t}, 1, length({t}) - 1)
 ELSE {t} END)"""


def analyze_docs(docs: DataFrame, text_col: str = "text",
                 stem: bool = True,
                 stopwords: tuple[str, ...] | None = STOPWORDS_EN
                 ) -> DataFrame:
    """Rewrite `text_col` as the space-joined analyzed token stream
    (tokenize -> drop stopwords -> S-stem). One codegen'd projection,
    no UDF, no shuffle; every other column passes through. Build the
    index over the result and use analyze_query (same options) on the
    query side."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_RE), 0)
    if stopwords:
        arr = F.array(*[F.lit(s) for s in stopwords])
        toks = F.filter(toks, lambda x: ~F.array_contains(arr, x))
    if stem:
        toks = F.transform(toks, s_stem_col)
    return docs.withColumn(text_col, F.array_join(toks, " "))


def analyze_query(query: str, stem: bool = True,
                  stopwords: tuple[str, ...] | None = STOPWORDS_EN
                  ) -> str:
    """The query-side twin of analyze_docs — MUST use the same
    options the index was built with."""
    toks = tokenize(query)
    if stopwords:
        sw = set(stopwords)
        toks = [t for t in toks if t not in sw]
    if stem:
        toks = [s_stem(t) for t in toks]
    return " ".join(toks)
