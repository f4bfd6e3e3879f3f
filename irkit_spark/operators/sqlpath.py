"""Pure-DataFrame (Catalyst-only, JVM-side) forms of the engine's
SQL-expressible operators (SURVEY.md §5.7) — these are the DuckDB-oracle
counterparts wired into __spark_entry__.py, and the TAAT-over-raw-text
BM25 used as the brute-force oracle for the index paths.

Everything here is whole-stage-codegen friendly: tokenization uses the
built-in regexp_extract_all (same frozen TOKEN_RE as the Arrow kernels),
no Python UDFs at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from irkit_spark.config import BM25_B, BM25_K1, QL_MU, TOKEN_RE
from irkit_spark.functions.tokenize import tokenize


def tokens_df(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, term) exploded token stream — oracle form of T1."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)).alias("term"))


def term_freqs(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — oracle form of A1."""
    return (tokens_df(docs).groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf")))


def term_stats(docs: DataFrame) -> DataFrame:
    """(term, df, cf) — A2."""
    return (term_freqs(docs).groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))


def doc_lengths(docs: DataFrame) -> DataFrame:
    """(doc_id, doc_len) over ALL docs (0 for token-less docs) — A3."""
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(TOKEN_RE), 0)).alias("doc_len"))


def collection_stats(docs: DataFrame) -> DataFrame:
    """(n_docs, avg_doc_len, coll_len, vocab) — stats table shape."""
    dl = doc_lengths(docs)
    vocab = term_stats(docs).agg(F.count("*").alias("vocab"))
    base = dl.agg(F.count("*").alias("n_docs"),
                  F.avg("doc_len").alias("avg_doc_len"),
                  F.sum("doc_len").alias("coll_len"))
    return base.crossJoin(vocab)


def lexicon(docs: DataFrame) -> DataFrame:
    """(term_id, term, df, cf): dense ids by sorted term — T3 oracle form
    (single window is fine at oracle scale; the engine uses the bucketed
    two-pass scheme in plans/dense_ids.py)."""
    w = Window.orderBy("term")
    return (term_stats(docs)
            .withColumn("term_id", F.row_number().over(w) - 1)
            .select("term_id", "term", "df", "cf"))


def _query_terms_df(spark, query: str):
    toks = sorted(set(tokenize(query)))
    return spark.createDataFrame([(t,) for t in toks], "term string")


def _query_term_freqs(docs: DataFrame, q: DataFrame) -> DataFrame:
    """(doc_id, term, tf) restricted to the query's terms, with the
    term filter applied to the token stream BEFORE any aggregation
    (guide §2.3: shuffle fewer bytes). Value-identical to
    `term_freqs(docs).join(broadcast(q), "term")` — a (doc, term)
    occurrence count is unchanged by dropping other terms first — but
    the corpus-wide groupBy over the full vocabulary never runs: only
    query-term token rows reach the exchange."""
    return (tokens_df(docs).join(F.broadcast(q), "term")
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf")))


def bm25_topk_text(docs: DataFrame, query: str, k: int = 10,
                   round_dp: int | None = 6) -> DataFrame:
    """Brute-force TAAT BM25 over raw text — pure groupBy/agg (A4+O3).

    This is the engine's SQL-oracle flagship: rank-identical to the
    index-backed TAAT/DAAT/WAND paths (tested in
    tests/test_query_identity.py).

    Plan shape (round 7, guide §2.3): the query-term filter sits below
    every aggregate — tf comes from _query_term_freqs and df/n_docs
    ride a per-term re-aggregation of the same exchange (Catalyst
    reuses it), so no full-vocabulary groupBy ever runs. Values are
    identical: tf/df per (doc, query term) do not depend on the other
    terms' rows."""
    spark = docs.sparkSession
    dl = doc_lengths(docs)
    # n_docs/avgdl ride a broadcast 1-row frame instead of a separate
    # collect: the whole query is ONE action (the old scalar collect
    # paid its own 2-job round trip per call). Values are identical —
    # count is exact and avg produces the same double the collect
    # returned.
    stats = dl.agg(F.count("*").cast("double").alias("n_docs"),
                   F.avg("doc_len").alias("avgdl"))
    q = _query_terms_df(spark, query)
    tf = _query_term_freqs(docs, q)
    qdf = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf.join(F.broadcast(qdf), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .withColumn(
                  "partial",
                  F.log1p((F.col("n_docs") - F.col("df") + 0.5)
                          / (F.col("df") + 0.5))
                  * F.col("tf")
                  / (F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B
                                              * F.col("doc_len")
                                              / F.col("avgdl")))))
    out = (scored.groupBy("doc_id")
           .agg(F.sum("partial").alias("score")))
    if round_dp is not None:
        out = out.withColumn("score", F.round("score", round_dp))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def ql_topk_text(docs: DataFrame, query: str, k: int = 10,
                 round_dp: int | None = 6) -> DataFrame:
    """Dirichlet query-likelihood top-k (Q2) — only docs containing at
    least one query term are ranked (matches irkit's OR traversal), but
    each ranked doc is scored over ALL query terms incl. zero-tf ones."""
    spark = docs.sparkSession
    dl = doc_lengths(docs)
    # collection length rides a broadcast 1-row frame: one action for
    # the whole query, no separate scalar collect (same double value)
    coll = dl.agg(F.sum("doc_len").cast("double").alias("coll"))
    q = _query_terms_df(spark, query)
    tf = _query_term_freqs(docs, q)
    # cf per query term from the SAME filtered exchange (identical to
    # term_stats' value: a term's corpus tf sum ignores other terms)
    qstats = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    cand = tf.select("doc_id").distinct()
    grid = cand.crossJoin(F.broadcast(qstats))
    scored = (grid
              .join(tf, ["doc_id", "term"], "left").fillna(0, ["tf"])
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(coll))
              .withColumn("partial",
                          F.log((F.col("tf") + QL_MU * F.col("cf")
                                 / F.col("coll"))
                                / (F.col("doc_len") + QL_MU))))
    out = scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))
    if round_dp is not None:
        out = out.withColumn("score", F.round("score", round_dp))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def jm_topk_text(docs: DataFrame, query: str, k: int = 10,
                 round_dp: int | None = 6) -> DataFrame:
    """Jelinek-Mercer query-likelihood top-k over raw text, in the
    rank-equivalent per-matched-posting decomposition
    (functions/scoring.ql_jm): unmatched query terms contribute
    exactly 0, so no zero-tf grid is needed — one tf join, one
    doc-length join, one group-sum."""
    from irkit_spark.config import JM_LAMBDA
    spark = docs.sparkSession
    dl = doc_lengths(docs)
    # one action: coll rides a broadcast 1-row frame (same double)
    coll = dl.agg(F.sum("doc_len").cast("double").alias("coll"))
    q = _query_terms_df(spark, query)
    tf = _query_term_freqs(docs, q)
    qstats = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    c = (1.0 - JM_LAMBDA) / JM_LAMBDA
    scored = (tf.join(F.broadcast(qstats), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(coll))
              .withColumn("partial",
                          F.log1p(c * F.col("tf")
                                  / (F.col("doc_len")
                                     * (F.col("cf") / F.col("coll"))))))
    out = scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))
    if round_dp is not None:
        out = out.withColumn("score", F.round("score", round_dp))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_conjunctive_topk_text(docs: DataFrame, query: str, k: int = 10,
                               round_dp: int | None = 6) -> DataFrame:
    """BM25 top-k over docs containing ALL query terms (J1 + Q1): the
    oracle for the index kernel's conjunctive mode."""
    spark = docs.sparkSession
    q = _query_terms_df(spark, query)
    tf = _query_term_freqs(docs, q)
    # OOV terms are dropped before traversal (P3), same as the kernel;
    # a query term is in-vocab iff it has >= 1 (doc, term) row. The
    # in-vocab count rides a broadcast 1-row frame: one action total.
    nv = tf.agg(F.count_distinct(F.col("term")).alias("nv"))
    cand = (tf.groupBy("doc_id").agg(F.count("*").alias("n"))
            .crossJoin(F.broadcast(nv))
            .filter(F.col("n") == F.col("nv"))
            .select("doc_id"))
    full = bm25_topk_text(docs, query, k=1 << 30, round_dp=round_dp)
    return (full.join(cand, "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def conjunctive_docs(docs: DataFrame, query: str) -> DataFrame:
    """Docs containing ALL query terms (J1 oracle form: k-way semi-join
    == GROUP BY doc HAVING count(distinct matched term) = |q|)."""
    spark = docs.sparkSession
    toks = sorted(set(tokenize(query)))
    q = _query_terms_df(spark, query)
    return (_query_term_freqs(docs, q)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_terms"),
                 F.sum("tf").alias("sum_tf"))
            .filter(F.col("n_terms") == len(toks))
            .select("doc_id", "sum_tf")
            .orderBy("doc_id"))


def disjunctive_docs(docs: DataFrame, query: str) -> DataFrame:
    """Docs containing ANY query term, with match count + summed tf
    (J2 oracle form: union merge)."""
    q = _query_terms_df(docs.sparkSession, query)
    return (_query_term_freqs(docs, q)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_terms"),
                 F.sum("tf").alias("sum_tf"))
            .orderBy("doc_id"))


def bm25f_topk_text(docs: DataFrame, query: str,
                    fields: dict[str, float], k: int = 10,
                    round_dp: int | None = 6) -> DataFrame:
    """BM25F top-k (Zaragoza et al., CIKM 2004) over a docs frame with
    one text column per field: per-field length-normalized tfs are
    combined with field weights BEFORE saturation,

        wtf(d,t) = sum_f w_f * tf_f / (1 - b + b * len_f(d)/avglen_f)
        score    = sum_t idf(t) * wtf / (k1 + wtf)

    with idf over the document frequency in ANY field — weighting a
    title hit stronger than a body hit without double-counting the
    saturation the way a naive per-field BM25 sum would.

    Scale shape: one union of per-field token streams -> one groupBy
    (doc, field, term) pruned to query terms at the scan, per-field
    lengths in a single projection, scalar avgs collected once; then
    one groupBy(doc, term) + one groupBy(doc). All JVM-side.
    """
    if not fields:
        raise ValueError("fields must map >= 1 text column to a "
                         "weight")
    spark = docs.sparkSession
    q = _query_terms_df(spark, query)
    parts = [docs.select("doc_id",
                         F.explode(F.regexp_extract_all(
                             F.lower(F.col(fname)), F.lit(TOKEN_RE),
                             0)).alias("term"),
                         F.lit(fname).alias("fld"))
             for fname in fields]
    toks = parts[0]
    for p in parts[1:]:
        toks = toks.unionByName(p)
    qtoks = toks.join(F.broadcast(q), "term")
    tf = (qtoks.groupBy("doc_id", "fld", "term")
          .agg(F.count("*").alias("tf")))
    lens = docs.select(
        "doc_id",
        *[F.size(F.regexp_extract_all(F.lower(F.col(fname)),
                                      F.lit(TOKEN_RE), 0))
          .alias(f"len_{fname}") for fname in fields])
    avgr = lens.agg(
        F.count("*").alias("n_docs"),
        *[F.avg(f"len_{fname}").alias(f"avg_{fname}")
          for fname in fields]).collect()[0]
    n_docs = float(avgr["n_docs"])
    # df over ANY field, query terms only
    dfq = (qtoks.select("doc_id", "term").distinct()
           .groupBy("term").agg(F.count("*").alias("df")))
    norm = None
    for fname, w in fields.items():
        term_norm = (F.lit(float(w)) * F.col("tf")
                     / (1.0 - BM25_B + BM25_B
                        * F.col(f"len_{fname}")
                        / float(avgr[f"avg_{fname}"])))
        branch = F.when(F.col("fld") == fname, term_norm)
        norm = branch if norm is None else norm.when(
            F.col("fld") == fname, term_norm)
    wtf = (tf.join(lens, "doc_id")
           .withColumn("part", norm)
           .groupBy("doc_id", "term")
           .agg(F.sum("part").alias("wtf")))
    scored = (wtf.join(F.broadcast(dfq), "term")
              .withColumn(
                  "partial",
                  F.log1p((F.lit(n_docs) - F.col("df") + 0.5)
                          / (F.col("df") + 0.5))
                  * F.col("wtf") / (BM25_K1 + F.col("wtf"))))
    out = scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))
    if round_dp is not None:
        out = out.withColumn("score", F.round("score", round_dp))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
