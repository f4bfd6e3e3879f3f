"""Driver contract for the spark-graft builder (PySpark target).

Every SQL-expressible operator from SURVEY.md §2 (and the training-data
pipeline ops) has a queries() entry + a matching oracle_sql() DuckDB
string; non-SQL-expressible ops (MinHash-LSH, SimHash, LSH-ANN, full
feature vectors) are rows-only entries. The index-backed entries
(index_taat/daat/wand) build a real compressed inverted index over the
`documents` table and are oracled against the *same* brute-force BM25
SQL — that equivalence IS the engine's rank-identity claim
(BASELINE.json:14).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irkit_spark.config import BM25_B, BM25_K1, QL_MU, TOKEN_RE

# ---------------------------------------------------------------- helpers

Q_BM25_A = "join hash merge"
Q_BM25_B = "spark window customer"
Q_AND = "scan filter merge"
Q_OR = "spark window"
Q_PHRASE = "spark window"        # ~30 adjacency hits at sf0.01
Q_PHRASE3 = "value table part"   # trigram: exercises m>2 adjacency
SYN_GROUPS = [["join", "merge"], ["hash"], ["scan", "filter"]]

_IDX_CACHE: dict[str, str] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _plain_urls(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic URLs over the documents table (the
    testdata carries no url column): 5 pages per source domain, shared
    across docs — input for the url-dedup / domain-cap entries. The
    oracle builds the identical strings."""
    return docs.select(
        "doc_id",
        F.concat(F.lit("https://www."), F.col("source"),
                 F.lit(".com/page"),
                 (F.col("doc_id") % 5).cast("string")).alias("url"))


def _messy_urls(docs: DataFrame) -> DataFrame:
    """Four deterministic mess variants exercising every canonicalizer
    branch: casing + default port + tracking params + fragment;
    userinfo + :80 + trailing slashes; schemeless; bare host."""
    k = (F.col("doc_id") % 7).cast("string")
    v = F.col("doc_id") % 4
    url = (F.when(v == 0, F.concat(
                F.lit("HTTPS://WWW.Site"), k,
                F.lit(".Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag")))
           .when(v == 1, F.concat(
                F.lit("http://user:pw@site"), k,
                F.lit(".example.com:80/a//")))
           .when(v == 2, F.concat(
                F.lit("site"), k, F.lit(".example.com/x?gclid=1&z=9")))
           .otherwise(F.concat(
                F.lit("https://site"), k, F.lit(".example.com"))))
    return docs.select("doc_id", url.alias("url"))


def _pii_docs(docs: DataFrame) -> DataFrame:
    """Append deterministic synthetic PII (the corpus is clean by
    construction); the oracle concatenates the identical strings."""
    em = (F.when(F.col("doc_id") % 3 == 0,
                 F.concat(F.lit(" contact user"),
                          F.col("doc_id").cast("string"),
                          F.lit("@example.com")))
          .otherwise(F.lit("")))
    ip = (F.when(F.col("doc_id") % 5 == 0,
                 F.concat(F.lit(" host 10."),
                          (F.col("doc_id") % 256).cast("string"),
                          F.lit(".0.1")))
          .otherwise(F.lit("")))
    ph = (F.when(F.col("doc_id") % 7 == 0,
                 F.lit(" call +1 555 0100 42"))
          .otherwise(F.lit("")))
    return docs.select("doc_id",
                       F.concat(F.col("text"), em, ip, ph).alias("text"))


def _multiline_docs(docs: DataFrame) -> DataFrame:
    """Deterministic multi-line docs (the corpus is single-line by
    construction): a per-doc content line plus planted boilerplate
    chrome at C4-ish frequencies — a footer in 1/3 of docs, a banner in
    1/4, a whitespace-only line in 1/10 (must never be removed), and a
    sub-threshold 'rare' line in 1/97. The oracle builds the same."""
    return docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.when(F.col("doc_id") % 4 == 0,
                   F.lit("\nSubscribe to our newsletter")).otherwise(""),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("\nall rights reserved 2026")).otherwise(""),
            F.when(F.col("doc_id") % 10 == 0, F.lit("\n   "))
            .otherwise(""),
            F.when(F.col("doc_id") % 97 == 0,
                   F.lit("\nrare promo line")).otherwise(""),
        ).alias("text"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _query_vec(spark: SparkSession, sf_dir: str):
    row = _emb(spark, sf_dir).filter(F.col("vec_id") == 0).collect()[0]
    return [float(x) for x in row["embedding"]]


def _index_for(spark: SparkSession, sf_dir: str,
               quantize: bool = False) -> str:
    """Build (once per process per sf_dir) a real compressed index over
    the documents table; doc_id is already dense so assignment is
    skipped (doc_id_col)."""
    key = sf_dir + ("#q" if quantize else "")
    if key not in _IDX_CACHE:
        from irkit_spark.operators.build import build_index
        out = os.path.join(tempfile.gettempdir(),
                           "irkit_entry_idx_" +
                           ("q_" if quantize else "") +
                           sf_dir.strip("/").replace("/", "_"))
        shutil.rmtree(out, ignore_errors=True)
        # n_parts pinned: the driver's session may default to 200
        # shuffle partitions, absurd for a 500-doc gate corpus
        build_index(spark, _docs(spark, sf_dir), out,
                    docs_per_shard=200, doc_id_col="doc_id",
                    key_col="doc_id", n_parts=16, quantize=quantize)
        _IDX_CACHE[key] = out
    return _IDX_CACHE[key]


def _tiered_index_for(spark, sf_dir: str) -> str:
    """Ensure the cached index for sf_dir also carries the impact-tier
    artifact (operators/tiered.build_impact_tier, built once per
    process; kappa=0.7 default — the tier only sets the threshold, so
    any kappa yields identical results)."""
    path = _index_for(spark, sf_dir)
    key = path + "#tier"
    if key not in _IDX_CACHE:
        from irkit_spark.operators.tiered import build_impact_tier
        build_impact_tier(spark, path)
        _IDX_CACHE[key] = path
    return _IDX_CACHE[key]


def _stemmed_index_for(spark, sf_dir: str) -> str:
    """Cached index over the ANALYZED documents table (stopwords
    dropped, S-stemmed — functions/analyze.analyze_docs): the Lucene
    Analyzer flow, with the core build untouched (analysis is a
    projection; analyzed tokens are still [a-z0-9]+)."""
    key = sf_dir + "#stem"
    if key not in _IDX_CACHE:
        from irkit_spark.functions.analyze import analyze_docs
        from irkit_spark.operators.build import build_index
        out = os.path.join(tempfile.gettempdir(),
                           "irkit_entry_idx_stem_" +
                           sf_dir.strip("/").replace("/", "_"))
        shutil.rmtree(out, ignore_errors=True)
        build_index(spark, analyze_docs(_docs(spark, sf_dir)), out,
                    docs_per_shard=200, doc_id_col="doc_id",
                    key_col="doc_id", n_parts=16)
        _IDX_CACHE[key] = out
    return _IDX_CACHE[key]


def _positions_for(spark, sf_dir: str) -> str:
    """Ensure the cached index for sf_dir also carries the positions
    artifact (built once per process from the same documents table —
    the doc_id_col path, so ids line up by construction)."""
    path = _index_for(spark, sf_dir)
    key = path + "#pos"
    if key not in _IDX_CACHE:
        from irkit_spark.operators.positions import build_positions
        build_positions(spark, _docs(spark, sf_dir), path,
                        doc_id_col="doc_id")
        _IDX_CACHE[key] = path
    return path


DEL_PRED = "doc_id % 7 = 3"     # deterministic tombstone set


def _tombstoned_for(spark, sf_dir: str) -> str:
    """Copy of the cached index with doc_id%7==3 tombstoned
    (operators/delete.py) — selection-only semantics."""
    base = _index_for(spark, sf_dir)
    key = base + "#del"
    if key not in _IDX_CACHE:
        from irkit_spark.operators.delete import delete_docs
        out = base + "_del"
        shutil.rmtree(out, ignore_errors=True)
        shutil.copytree(base, out)
        delete_docs(spark, out, predicate=DEL_PRED)
        _IDX_CACHE[key] = out
    return _IDX_CACHE[key]


def _compacted_for(spark, sf_dir: str) -> str:
    """Compaction of the tombstoned copy (operators/compact.py) —
    deleted docs physically removed, collection stats recomputed."""
    src = _tombstoned_for(spark, sf_dir)
    key = src + "#cmp"
    if key not in _IDX_CACHE:
        from irkit_spark.operators.compact import compact_index
        out = src + "_cmp"
        shutil.rmtree(out, ignore_errors=True)
        compact_index(spark, src, out)
        _IDX_CACHE[key] = out
    return _IDX_CACHE[key]


UPD_PRED = "doc_id % 13 = 5"   # deterministic update set
UPD_SUFFIX = " join merge refreshed"
NEW_TEXT_A = "join hash merge join hash merge refreshed"
NEW_TEXT_B = "spark window refreshed basin"


def _updated_for(spark, sf_dir: str) -> str:
    """Upsert (operators/update.py) over the cached index: every
    doc_id%13==5 doc replaced by an appended version (same url, new
    id = old + max_id + 1, text + UPD_SUFFIX) plus two brand-new docs
    at 2*(max_id+1)(+1). update_index never mutates in_dir, so the
    shared cached index stays pristine."""
    base = _index_for(spark, sf_dir)
    key = base + "#upd"
    if key not in _IDX_CACHE:
        from irkit_spark.operators.update import update_index
        docs = _docs(spark, sf_dir)
        mx = int(docs.agg(F.max("doc_id")).collect()[0][0])
        upd = (docs.filter(UPD_PRED).select(
            (F.col("doc_id") + mx + 1).alias("new_id"),
            F.col("doc_id").cast("string").alias("url"),
            F.concat(F.col("text"), F.lit(UPD_SUFFIX)).alias("text")))
        extra = spark.createDataFrame(
            [(2 * (mx + 1), str(2 * (mx + 1)), NEW_TEXT_A),
             (2 * (mx + 1) + 1, str(2 * (mx + 1) + 1), NEW_TEXT_B)],
            "new_id long, url string, text string")
        out = base + "_upd"
        shutil.rmtree(out, ignore_errors=True)
        update_index(spark, base, upd.unionByName(extra), out,
                     doc_id_col="new_id")
        _IDX_CACHE[key] = out
    return _IDX_CACHE[key]


def _segments_for(spark, sf_dir: str) -> list[str]:
    """Two batch indexes over a doc-id split of the documents table,
    built the ingest way (shared lexicon from the cached full index,
    running global stats) — operators/segments.SegmentedIndex serves
    them unmerged, value-identical to the full index."""
    base = _index_for(spark, sf_dir)
    key = base + "#seg"
    if key not in _IDX_CACHE:
        from irkit_spark.operators.build import build_index
        from irkit_spark.operators.query import Index
        docs = _docs(spark, sf_dir)
        mx = int(docs.agg(F.max("doc_id")).collect()[0][0])
        cut = (mx + 1) // 2
        lex = Index(spark, base).terms.select("term", "term_id")
        dirs = []
        for i, (lo, hi) in enumerate(((0, cut), (cut, mx + 1))):
            sofar = docs.filter(f"doc_id < {hi}")
            g = sofar.agg(
                F.count("*").alias("n"),
                F.avg(F.size(F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_RE), 0))).alias("a")
            ).collect()[0]
            d = base + f"_seg{i}"
            shutil.rmtree(d, ignore_errors=True)
            build_index(spark,
                        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}"),
                        d, docs_per_shard=200, doc_id_col="doc_id",
                        key_col="doc_id", n_parts=8,
                        shared_lexicon=lex,
                        global_stats=(int(g["n"]), float(g["a"])))
            dirs.append(d)
        _IDX_CACHE[key] = dirs
    return _IDX_CACHE[key]


def _index_search(spark, sf_dir, query, k, mode,
                  scorer="bm25", quantize: bool = False,
                  local: bool | None = False,
                  doc_filter: str | None = None) -> DataFrame:
    # local=False pins the distributed path: the correctness gate
    # should keep verifying the cluster-shape engine; the driver-side
    # serving kernel gets its own oracled entry (index_wand_local_*)
    from irkit_spark.operators.query import Index, search
    idx = Index(spark, _index_for(spark, sf_dir, quantize))
    out = search(idx, query, k=k, mode=mode, scorer=scorer, local=local,
                 doc_filter=doc_filter)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: block-max WAND BM25 top-10 from a real compressed
    inverted index built over /root/testdata/sf0.001 documents."""
    return _index_search(spark, "/root/testdata/sf0.001", Q_BM25_A, 10,
                         "wand")


# ---------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from irkit_spark.operators import sqlpath as sp
    from irkit_spark.pipeline import dedup as dd
    from irkit_spark.pipeline import multimodal as mm
    from irkit_spark.pipeline import similarity as sim
    from irkit_spark.pipeline import textstats as ts

    def q_tokenize_tf(spark, sf):
        return sp.term_freqs(_docs(spark, sf))

    def q_term_stats(spark, sf):
        return sp.term_stats(_docs(spark, sf))

    def q_doc_lengths(spark, sf):
        return sp.doc_lengths(_docs(spark, sf)) \
            .select("doc_id", F.col("doc_len").cast("long").alias("doc_len"))

    def q_collection_stats(spark, sf):
        return sp.collection_stats(_docs(spark, sf)).select(
            "n_docs", F.round("avg_doc_len", 6).alias("avg_doc_len"),
            "coll_len", "vocab")

    def q_lexicon(spark, sf):
        return sp.lexicon(_docs(spark, sf)) \
            .select(F.col("term_id").cast("long").alias("term_id"),
                    "term", "df", "cf")

    def q_bm25_taat_top10(spark, sf):
        return sp.bm25_topk_text(_docs(spark, sf), Q_BM25_A, 10)

    def q_bm25_taat_top100(spark, sf):
        return sp.bm25_topk_text(_docs(spark, sf), Q_BM25_B, 100)

    def q_ql_top10(spark, sf):
        return sp.ql_topk_text(_docs(spark, sf), Q_BM25_A, 10)

    def q_jm_taat_top10(spark, sf):
        # Jelinek-Mercer QL over raw text (sqlpath.jm_topk_text)
        return sp.jm_topk_text(_docs(spark, sf), Q_BM25_A, 10)

    def q_index_jm_top10(spark, sf):
        # index-backed JM: per-matched-posting decomposition in the
        # DAAT kernel (functions/scoring.ql_jm)
        return _index_search(spark, sf, Q_BM25_A, 10, "daat",
                             scorer="jm")

    def q_and(spark, sf):
        return sp.conjunctive_docs(_docs(spark, sf), Q_AND)

    def q_or(spark, sf):
        return sp.disjunctive_docs(_docs(spark, sf), Q_OR)

    def q_index_taat(spark, sf):
        return _index_search(spark, sf, Q_BM25_A, 10, "taat")

    def q_index_daat(spark, sf):
        return _index_search(spark, sf, Q_BM25_A, 10, "daat")

    def q_index_wand(spark, sf):
        return _index_search(spark, sf, Q_BM25_A, 10, "wand")

    def q_index_wand_top100(spark, sf):
        return _index_search(spark, sf, Q_BM25_B, 100, "wand")

    def q_index_selective_top10(spark, sf):
        # selective search (operators/selective.py): shard-level
        # upper-bound selection + theta-carrying escalation — exact
        # by construction, so it shares the plain BM25 oracle
        from irkit_spark.operators.query import Index
        from irkit_spark.operators.selective import selective_search
        idx = Index(spark, _index_for(spark, sf))
        out = selective_search(idx, Q_BM25_B, 10, m0=2)
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def q_index_tiered_wand_top10(spark, sf):
        # tiered serving (operators/tiered.py): impact tier bootstraps
        # theta, full index re-run with it carried — exact by
        # construction, so it shares the plain BM25 oracle
        from irkit_spark.operators.query import Index
        from irkit_spark.operators.tiered import tiered_search
        idx = Index(spark, _tiered_index_for(spark, sf))
        out = tiered_search(idx, Q_BM25_A, 10)
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def q_index_maxscore_top10(spark, sf):
        # Turtle-Flood max-score pruning (SURVEY Q5's other half):
        # lossless, so the full-BM25 SQL oracle applies unchanged
        return _index_search(spark, sf, Q_BM25_B, 10, "maxscore")

    def q_index_wand_filtered_top10(spark, sf):
        # FILTERED retrieval (training-data-pipeline shape: top-k
        # within a doc slice): selection restricted to the predicate,
        # scores keep global collection stats — oracled by the same
        # BM25 SQL with the predicate on the selection CTE only
        return _index_search(spark, sf, Q_BM25_A, 10, "wand",
                             doc_filter="doc_id % 3 = 0")

    def q_index_wand_top1000(spark, sf):
        return _index_search(spark, sf, Q_OR, 1000, "wand")

    def q_index_wand_quantized(spark, sf):
        # 7-bit impact quantization: the surrogate score
        # idf * floor(127*tf_norm)/127 is SQL-expressible, so this is
        # fully oracled (_bm25_quant_sql); pytest (tests/
        # test_quantized.py) additionally bounds its error vs exact
        return _index_search(spark, sf, Q_BM25_A, 10, "wand",
                             quantize=True)

    def q_index_wand_quantized_bound(spark, sf):
        """Driver-visible quantization error bound (VERDICT r2 item 7):
        for every doc in the exact OR quantized top-10, the 7-bit
        surrogate must sit within sum_t(idf_t)/127 of the exact BM25
        score (each term's tf_norm in [0,1] is floored to q/127, so
        per-term error < idf/127). The entry RAISES on any violation;
        its rows carry (doc_id, exact, quantized, abs_err, bound,
        within_bound) so the driver also records the evidence."""
        from irkit_spark.operators.query import Index
        exact = _index_search(spark, sf, Q_BM25_A, 10, "wand") \
            .withColumnRenamed("score", "exact_score")
        quant = _index_search(spark, sf, Q_BM25_A, 10, "wand",
                              quantize=True) \
            .withColumnRenamed("score", "quant_score")
        idx = Index(spark, _index_for(spark, sf))
        qmeta = idx.lookup_query(Q_BM25_A)
        bound = sum(m["idf"] for m in qmeta) / 127.0
        out = (exact.join(quant, "doc_id", "full")
               .fillna(0.0)
               .withColumn("abs_err", F.round(
                   F.abs(F.col("exact_score") - F.col("quant_score")), 6))
               .withColumn("bound", F.round(F.lit(bound), 6))
               .withColumn("within_bound",
                           F.col("abs_err") <= F.col("bound")))
        # full-outer rows where one side is missing (rank flips near the
        # k boundary) carry a 0.0 placeholder — the bound check only
        # applies to docs present in BOTH top-k lists
        both = out.filter((F.col("exact_score") > 0)
                          & (F.col("quant_score") > 0))
        bad = both.filter(~F.col("within_bound")).count()
        if bad:
            raise AssertionError(
                f"{bad} docs exceed the quantization error bound "
                f"{bound:.6f}")
        return both.orderBy("doc_id")

    def q_index_wand_local_top10(spark, sf):
        # driver-side serving kernel (operators/query._search_local):
        # same numpy WAND kernel, posting blocks from the driver cache,
        # zero Spark jobs once warm — oracled against the same BM25 SQL
        # as the distributed path (they are bit-identical; also pinned
        # by tests/test_query_identity.py::test_local_path_identity)
        return _index_search(spark, sf, Q_BM25_A, 10, "wand", local=True)

    def q_index_batch_wand_top10(spark, sf):
        # batch/TREC-run shape: a whole query set in ONE distributed
        # pass (all queries' terms prune one postings scan; each shard
        # task scores every query; one k-per-query window). Oracled
        # against the union of the per-query BM25 SQL.
        from irkit_spark.operators.query import Index, batch_search
        idx = Index(spark, _index_for(spark, sf))
        out = batch_search(idx, {"qa": Q_BM25_A, "qb": Q_BM25_B,
                                 "qo": Q_OR}, k=10, mode="wand")
        return out.select("query_id", "doc_id",
                          F.round("score", 6).alias("score"))

    def q_index_ql_top10(spark, sf):
        return _index_search(spark, sf, Q_BM25_A, 10, "daat", scorer="ql")

    def q_index_and_top10(spark, sf):
        return _index_search(spark, sf, Q_AND, 10, "and")

    def q_dedup_exact(spark, sf):
        return dd.exact_dup_groups(_docs(spark, sf))

    def q_dedup_keep_first(spark, sf):
        return dd.dedup_keep_first(_docs(spark, sf)) \
            .select("doc_id", "lang", "source", "n_chars")

    def q_token_jaccard(spark, sf):
        return dd.token_jaccard_pairs(_docs(spark, sf), "source", 0.5)

    def q_shingle_jaccard(spark, sf):
        return dd.shingle_jaccard_pairs(_docs(spark, sf), 3, 0.1)

    def q_containment(spark, sf):
        # asymmetric near-dup (pipeline/dedup.containment_pairs)
        return dd.containment_pairs(_docs(spark, sf), 3, 0.3)

    def q_token_counts(spark, sf):
        return ts.token_counts(_docs(spark, sf))

    def q_quality(spark, sf):
        return ts.quality_scores(_docs(spark, sf))

    def q_lang_id(spark, sf):
        return ts.lang_id(_docs(spark, sf))

    def q_fingerprints(spark, sf):
        return ts.fingerprints(_docs(spark, sf))

    def q_ann_cosine(spark, sf):
        emb = _emb(spark, sf).filter(F.col("vec_id") != 0)
        return sim.cosine_topk(emb, _query_vec(spark, sf), 10)

    def q_cosine_pairs(spark, sf):
        return sim.cosine_pairs(_emb(spark, sf), 0.3)

    def q_media_metadata(spark, sf):
        return mm.media_table(_docs(spark, sf)) \
            .select("doc_id", "n_bytes", "digest")

    def q_bigram_pmi(spark, sf):
        # collocations (pipeline/textstats.bigram_pmi): adjacent-pair
        # PMI with the min-count guard — phrase-mining primitive
        return ts.bigram_pmi(_docs(spark, sf), min_count=5)

    def q_event_window_counts(spark, sf):
        # query-log analytics (pipeline/events.window_counts):
        # tumbling-hour event counts + value sums; window start
        # emitted as epoch micros (type-stable across engines)
        from irkit_spark.pipeline.events import epoch_us, window_counts
        return (window_counts(_events(spark, sf), "1 hour")
                .select(epoch_us("window_start")
                        .alias("window_start_us"),
                        "event_type", "n_events", "sum_value"))

    def q_event_sessions(spark, sf):
        # gap-based sessionization (pipeline/events.sessionize): the
        # standard 30-minute search-session segmentation
        from irkit_spark.pipeline.events import epoch_us, sessionize
        return (sessionize(_events(spark, sf), 30)
                .select("user_id", "session_seq", "n_events",
                        epoch_us("session_start").alias("start_us"),
                        "duration_us"))

    # ---- round-6 corpus-curation tier -------------------------------
    def q_hash_sample(spark, sf):
        # deterministic 1/5 sample via portable 31-bit mix
        # (pipeline/sampling.hash_sample) — reproducible across reruns,
        # partitionings, and engines
        from irkit_spark.pipeline.sampling import hash_sample
        return hash_sample(_docs(spark, sf), 1, 5).select("doc_id")

    def q_mixture_sample(spark, sf):
        # pretraining mixture construction: per-lang epoch weights
        # (pipeline/sampling.mixture_sample) — en downsampled, zh 2
        # full epochs, fr 1 epoch + deterministic quarter
        from irkit_spark.pipeline.sampling import mixture_sample
        return (mixture_sample(_docs(spark, sf),
                               {"en": 0.5, "zh": 2.0, "fr": 1.25},
                               domain_col="lang")
                .select("doc_id", "lang", "epoch"))

    def q_hash_split_counts(spark, sf):
        # 98/1/1 train/val/test labeling (pipeline/sampling.hash_split):
        # the counts prove disjoint total coverage
        from irkit_spark.pipeline.sampling import hash_split
        return (hash_split(_docs(spark, sf), 100)
                .groupBy("split").agg(F.count("*").alias("n")))

    def q_lm_quality(spark, sf):
        return ts.lm_quality(_docs(spark, sf))

    def q_lm_bigram(spark, sf):
        # interpolated bigram corpus LM (textstats.lm_quality_bigram)
        return ts.lm_quality_bigram(_docs(spark, sf))

    def q_top_terms(spark, sf):
        # TF-IDF keyword extraction (textstats.top_terms)
        return ts.top_terms(_docs(spark, sf), m=5)

    def q_paragraph_dedup(spark, sf):
        # corpus-global paragraph keep-first dedup
        # (pipeline/boilerplate.dedup_paragraphs)
        from irkit_spark.pipeline.boilerplate import dedup_paragraphs
        d = _docs(spark, sf).select("doc_id", "text")
        return dedup_paragraphs(d).select("doc_id", "text",
                                          "n_removed")

    def q_substring_dedup(spark, sf):
        # exact-substring duplicate-span removal, Lee et al. 2022
        # (pipeline/substring.dedup_substrings); fp = md5 of the
        # surviving token stream so values hash compactly
        from irkit_spark.pipeline.substring import dedup_substrings
        d = _docs(spark, sf).select("doc_id", "text")
        return (dedup_substrings(d, n=8)
                .select("doc_id", F.md5("text").alias("fp"),
                        "n_removed"))

    def q_topical_ids(spark, sf):
        # topic-shard ID assignment (plans/dense_ids.topical_dense_ids
        # — Kulkarni-Callan topic shards as a dense, parallelism-
        # invariant id order; portable KR-31 label bucket)
        from irkit_spark.plans.dense_ids import topical_dense_ids
        d = _docs(spark, sf).select("doc_id", "lang")
        out = topical_dense_ids(d, "lang", "doc_id",
                                id_col="topical_id", n_buckets=8)
        return out.select("doc_id", "lang", "topical_id")

    def q_gopher_signals(spark, sf):
        return ts.gopher_signals(_docs(spark, sf))

    def q_pii_scrub(spark, sf):
        # synthetic PII appended deterministically (the corpus text is
        # clean by construction); the oracle builds the same text
        return ts.pii_scrub(_pii_docs(_docs(spark, sf)))

    def q_url_canonicalize(spark, sf):
        from irkit_spark.pipeline.urls import canonicalize_url
        return (_messy_urls(_docs(spark, sf))
                .select("doc_id",
                        canonicalize_url(F.col("url"))
                        .alias("canon_url")))

    def q_dedup_url_keep_first(spark, sf):
        from irkit_spark.pipeline.urls import dedup_url_keep_first
        return (dedup_url_keep_first(_plain_urls(_docs(spark, sf)))
                .select("doc_id", "canon_url"))

    def q_domain_caps(spark, sf):
        from irkit_spark.pipeline.urls import domain_caps
        return (domain_caps(_plain_urls(_docs(spark, sf)), 3)
                .select("doc_id", "domain"))

    def q_line_dedup(spark, sf):
        # C4-style boilerplate-line removal over deterministic
        # multi-line docs; whitespace-only and sub-threshold lines stay
        from irkit_spark.pipeline.boilerplate import remove_boilerplate
        return (remove_boilerplate(_multiline_docs(_docs(spark, sf)),
                                   min_docs=50)
                .select("doc_id", F.col("text").alias("text_clean"),
                        "n_removed"))

    def q_pack_windows(spark, sf):
        # GPT-style concat-and-chunk packing plan; distributed prefix
        # sum (bucketed two-pass), invariant to the bucket count
        from irkit_spark.pipeline.packing import pack_plan
        return pack_plan(_docs(spark, sf), window_size=256,
                         docs_per_bucket=64)

    def q_pack_materialize(spark, sf):
        # assembled training windows; fingerprint instead of the raw
        # token array to keep the compared result compact
        from irkit_spark.pipeline.packing import pack_materialize
        w = pack_materialize(_docs(spark, sf), window_size=256,
                             docs_per_bucket=64)
        return w.select("window_id", "n_tokens", "n_docs",
                        F.md5(F.concat_ws(" ", "tokens")).alias("fp"))

    def q_curation_report(spark, sf):
        # end-to-end curation composite: quality filter -> exact dedup
        # keep-first -> deterministic split; per-split token budget
        from irkit_spark.pipeline.curate import curation_report
        return curation_report(_docs(spark, sf))

    def q_contamination(spark, sf):
        # decontamination scan: docs sharing an 8-token-gram with the
        # benchmark slice (doc_id % 89 == 0) — portable rolling hash
        from irkit_spark.pipeline.contamination import contamination
        d = _docs(spark, sf)
        return contamination(d, d.filter(F.col("doc_id") % 89 == 0))

    def q_bm25f_title_body(spark, sf):
        # BM25F (Zaragoza 2004): fields synthesized deterministically
        # from the token stream (title = first 8 tokens, body = rest;
        # the testdata has no field columns) — weights 2.5/1.0
        d = _docs(spark, sf)
        tcol = F.regexp_extract_all(F.lower(F.col("text")),
                                    F.lit(TOKEN_RE), 0)
        fielded = d.select(
            "doc_id",
            F.array_join(F.slice(tcol, 1, 8), " ").alias("title"),
            F.array_join(
                F.when(F.size(tcol) > 8,
                       F.slice(tcol, 9, F.size(tcol) - 8))
                .otherwise(F.array().cast("array<string>")),
                " ").alias("body"))
        return sp.bm25f_topk_text(fielded, Q_BM25_A,
                                  {"title": 2.5, "body": 1.0}, 10)

    def q_index_regex_wand_top10(spark, sf):
        # Lucene RegexpQuery analog: anchored lexicon expansion by
        # (df DESC, term), standard disjunctive BM25 WAND over the
        # expansion set
        from irkit_spark.operators.query import Index, regex_search
        idx = Index(spark, _index_for(spark, sf))
        return (regex_search(idx, "(va|cu)[a-z]{2,}", 10, "wand",
                             local=False)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_index_boolean_top10(spark, sf):
        # boolean query language (operators/boolean.py): DNF rewrite
        # onto mode="and" + exclude_terms; doc score = max over
        # matching clauses (round commutes with max — monotone)
        from irkit_spark.operators.boolean import boolean_search
        from irkit_spark.operators.query import Index
        idx = Index(spark, _index_for(spark, sf))
        return (boolean_search(idx,
                               "(join AND hash) OR (merge NOT window)",
                               10)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_facet_range_nchars(spark, sf):
        # numeric-range faceting (operators/facets.facet_ranges):
        # match-set histogram over n_chars, cut at 200/400/800
        from irkit_spark.operators.facets import facet_ranges
        from irkit_spark.operators.query import Index
        idx = Index(spark, _index_for(spark, sf))
        return facet_ranges(idx, Q_OR, _docs(spark, sf), "n_chars",
                            [200.0, 400.0, 800.0])

    def q_cross_dedup_pairs(spark, sf):
        # incremental-ingest dedup (pipeline/dedup.cross_dup_pairs):
        # a "new batch" of 300 docs (ids shifted +100000, same texts)
        # against the full corpus — every new doc must link back to
        # its original, plus any genuine near-dups
        d = _docs(spark, sf)
        new = (d.filter(F.col("doc_id") < 300)
               .select((F.col("doc_id") + 100000).alias("doc_id"),
                       "text"))
        return dd.cross_dup_pairs(new, d).select(
            "new_id", "old_id", "jac")

    def q_index_near_top10(spark, sf):
        # unordered proximity (operators/positions.near_search —
        # SpanNearQuery inOrder=false): both terms within 5 positions,
        # either order, BM25-ranked
        from irkit_spark.operators.positions import near_search
        from irkit_spark.operators.query import Index
        idx = Index(spark, _positions_for(spark, sf))
        return (near_search(idx, Q_PHRASE, window=5, k=10)
                .select("doc_id", "near_tf",
                        F.round("score", 6).alias("score")))

    def q_index_stemmed_top10(spark, sf):
        # analyzer chain (functions/analyze.py): index built over the
        # stopword-dropped, S-stemmed projection; the query goes
        # through the same chain ("tables queries the" -> "table
        # query") — the Lucene Analyzer flow with the core build
        # untouched
        from irkit_spark.functions.analyze import analyze_query
        from irkit_spark.operators.query import Index, search
        idx = Index(spark, _stemmed_index_for(spark, sf))
        q = analyze_query("tables queries the")
        return (search(idx, q, 10, "wand", local=False)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_quality_filter(spark, sf):
        return ts.quality_filter(_docs(spark, sf)) \
            .select("doc_id", "lang", "source", "n_chars")

    def q_bpe_token_counts(spark, sf):
        return ts.bpe_token_counts(_docs(spark, sf))

    def q_sample_frames(spark, sf):
        return mm.sample_frames(mm.media_table(_docs(spark, sf)))

    def q_resize_images(spark, sf):
        return mm.resize_images(mm.media_table(_docs(spark, sf)))

    def q_dedup_near(spark, sf):
        # applied near-dup dedup (LSH pairs -> connected components ->
        # keep canonical): fully oracled — the LSH pair set is now
        # deterministic portable arithmetic (_minhash_ctes) and the CC
        # + keep-min step is a recursive closure in SQL (_dedup_near_sql)
        return dd.dedup_near_keep_first(_docs(spark, sf), 3, 0.5) \
            .select("doc_id", "lang", "source", "n_chars")

    def q_winnow(spark, sf):
        # winnowing fingerprints (MOSS): the portable double Karp-Rabin
        # k-gram hash makes this fully oracleable — the DuckDB SQL
        # below reproduces hash, window-min and dedup bit-for-bit;
        # pytest additionally pins the winnowing guarantees
        return ts.winnow_fingerprints(_docs(spark, sf))

    def q_minhash_lsh(spark, sf):
        # fully oracled since the MinHash tier moved to portable 31-bit
        # Karp-Rabin arithmetic: _minhash_sql reproduces token hash ->
        # shingles -> 128 permutations -> banding -> candidate join ->
        # exact-Jaccard verify bit-for-bit in DuckDB
        return dd.minhash_lsh_pairs(_docs(spark, sf), 3, 0.5)

    def q_simhash(spark, sf):
        # fully oracled: the 62-bit simhash is portable integer
        # arithmetic and the chunk scheme is complete at hamming <= 6,
        # so _simhash_sql(6)'s brute-force hamming join is an exact
        # oracle (completeness itself is what the oracle checks)
        return dd.simhash_pairs(_docs(spark, sf), 6)

    def q_simhash_blocked(spark, sf):
        # scale path: Manku block-permutation candidate keys at the
        # default contract (hamming <= 4: C(8,4)=70 tables, 32-bit
        # keys); k=6 is opt-in at 3x the fan-out. Fully oracled against
        # _simhash_sql(4)'s brute-force hamming join; pair-set parity
        # with the chunk path at BOTH contracts is additionally pinned
        # by pytest (test_simhash_blocked_matches_chunked).
        return dd.simhash_pairs_blocked(_docs(spark, sf))

    # --- embedding tier: FULLY ORACLED since round 5 — candidate
    # selection (quantization, integer hyperplane signatures,
    # fixed-point k-means IVF) is exact integer/floor arithmetic and
    # the cosine rerank is an ordered fold, so the DuckDB oracles
    # (_lsh_ann_sql/_ivf_ann_sql/_lsh_pairs_sql/_dedup_embedding_sql)
    # reproduce every row bit-for-bit; recall-vs-bruteforce quality is
    # additionally pytest-pinned --------------------------------------
    def q_lsh_ann(spark, sf):
        emb = _emb(spark, sf).filter(F.col("vec_id") != 0)
        return sim.lsh_topk(emb, _query_vec(spark, sf), 10)

    def q_ivf_ann(spark, sf):
        emb = _emb(spark, sf).filter(F.col("vec_id") != 0)
        return sim.ivf_topk(emb, _query_vec(spark, sf), 10)

    def q_lsh_cosine_pairs(spark, sf):
        # 0.45 because the synthetic embeddings top out at cos ~0.51
        return sim.lsh_cosine_pairs(_emb(spark, sf), 0.45)

    def q_dedup_embedding(spark, sf):
        # applied embedding-cosine near-dup dedup: banded-LSH pairs ->
        # connected components -> keep min vec_id. Oracle closes the
        # pair set with a recursive CTE. 0.45: see q_lsh_cosine_pairs
        return sim.dedup_embedding_keep_first(_emb(spark, sf), 0.45) \
            .select("vec_id").orderBy("vec_id")

    def q_ann_index(spark, sf):
        # persisted ANN index: partition-pruned cluster scan; same
        # oracle as ivf_ann_top10 (the index materializes the same
        # portable assignment)
        out = os.path.join(tempfile.gettempdir(),
                           "irkit_entry_ann_" +
                           sf.strip("/").replace("/", "_"))
        emb = _emb(spark, sf).filter(F.col("vec_id") != 0)
        if out not in _IDX_CACHE:
            shutil.rmtree(out, ignore_errors=True)
            sim.build_ann_index(emb, out)
            _IDX_CACHE[out] = out
        return sim.ann_index_topk(spark, out, _query_vec(spark, sf), 10)

    def q_media_features(spark, sf):
        # feat is array<float>; the driver's canonicalizer sorts pandas
        # frames, which cannot hash a list column — emit the vector as
        # its exact byte values (round(x*255) inverts the /255.0 in the
        # deterministic stub; 6dp float formatting would diverge between
        # float32 and the oracle's float64 for 3 of 256 byte values)
        out = mm.extract_features(mm.media_table(_docs(spark, sf)))
        return out.select(
            "doc_id", "n_bytes", "digest",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            F.concat_ws(",", F.transform(
                "feat",
                lambda x: F.round(x * 255).cast("int").cast("string")))
            .alias("feat_bytes"))

    def q_index_phrase_top10(spark, sf):
        # exact-phrase retrieval from the positional artifact
        # (operators/positions.py): adjacency-verified docs ranked by
        # the same frozen BM25 over the phrase's unique terms
        from irkit_spark.operators.positions import phrase_search
        from irkit_spark.operators.query import Index
        idx = Index(spark, _positions_for(spark, sf))
        return (phrase_search(idx, Q_PHRASE, 10)
                .select("doc_id", "phrase_tf",
                        F.round("score", 6).alias("score")))

    def q_index_phrase3_top10(spark, sf):
        from irkit_spark.operators.positions import phrase_search
        from irkit_spark.operators.query import Index
        idx = Index(spark, _positions_for(spark, sf))
        return (phrase_search(idx, Q_PHRASE3, 10)
                .select("doc_id", "phrase_tf",
                        F.round("score", 6).alias("score")))

    def q_index_phrase_slop_top10(spark, sf):
        # ordered proximity: consecutive tokens within 1+slop positions
        from irkit_spark.operators.positions import phrase_search
        from irkit_spark.operators.query import Index
        idx = Index(spark, _positions_for(spark, sf))
        return (phrase_search(idx, Q_PHRASE, 10, slop=1)
                .select("doc_id", "phrase_tf",
                        F.round("score", 6).alias("score")))

    def q_index_snippets_top10(spark, sf):
        # best keyword-in-context window per top-k doc, from the
        # positions artifact (operators/snippets.py)
        from irkit_spark.operators.query import Index
        from irkit_spark.operators.snippets import snippets
        idx = Index(spark, _positions_for(spark, sf))
        return (snippets(idx, Q_BM25_A, _docs(spark, sf), k=10,
                         window=30)
                .select("doc_id", "win_start", "n_distinct", "n_occ",
                        "snippet", F.round("score", 6).alias("score")))

    def q_index_snippets_w5(spark, sf):
        # tight window forces the distinct-vs-count-vs-start tie-break
        from irkit_spark.operators.query import Index
        from irkit_spark.operators.snippets import snippets
        idx = Index(spark, _positions_for(spark, sf))
        return (snippets(idx, Q_OR, _docs(spark, sf), k=10, window=5)
                .select("doc_id", "win_start", "n_distinct", "n_occ",
                        "snippet", F.round("score", 6).alias("score")))

    def q_index_deleted_wand_top10(spark, sf):
        # tombstoned retrieval (operators/delete.py): deleted docs
        # excluded from selection, global stats frozen at build
        from irkit_spark.operators.query import Index, search
        idx = Index(spark, _tombstoned_for(spark, sf))
        return (search(idx, Q_BM25_A, k=10, mode="wand", local=False)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_index_compacted_wand_top10(spark, sf):
        # compacted retrieval (operators/compact.py): deleted docs
        # physically removed, stats RECOMPUTED over the survivors
        from irkit_spark.operators.query import Index, search
        idx = Index(spark, _compacted_for(spark, sf))
        return (search(idx, Q_BM25_A, k=10, mode="wand", local=False)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_index_prf_wand_top10(spark, sf):
        # pseudo-relevance feedback (operators/prf.py): two-pass
        # retrieval — BM25 top-5 feedback docs, top-3 integer-tf
        # expansion terms at beta*tf/max_tf, weighted requery
        from irkit_spark.operators.prf import prf_search
        from irkit_spark.operators.query import Index
        idx = Index(spark, _index_for(spark, sf))
        return (prf_search(idx, Q_BM25_B, _docs(spark, sf), k=10,
                           fb_docs=5, fb_terms=3, beta=0.5,
                           local=False)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_index_boost_wand_top10(spark, sf):
        # term boosts (search('term^2 ...')): w scales the term's
        # contribution in scores AND pruning bounds (lossless)
        from irkit_spark.operators.query import Index, search
        idx = Index(spark, _index_for(spark, sf))
        return (search(idx, "join^2 hash merge^0.5", k=10,
                       mode="wand", local=False)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_index_segments_wand_top10(spark, sf):
        # multi-segment (NRT) serving: two unmerged batch indexes,
        # federated stats == full-corpus stats, so results equal the
        # single-index build — and the same brute-force BM25 oracle
        from irkit_spark.operators.query import search
        from irkit_spark.operators.segments import SegmentedIndex
        idx = SegmentedIndex(spark, _segments_for(spark, sf))
        return (search(idx, Q_BM25_B, k=10, mode="wand", local=False)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_index_not_wand_top10(spark, sf):
        # boolean NOT (search(exclude_terms=)): docs containing any
        # excluded term dropped shard-locally, survivors' scores
        # untouched (global stats)
        from irkit_spark.operators.query import Index, search
        idx = Index(spark, _index_for(spark, sf))
        return (search(idx, Q_BM25_A, k=10, mode="wand", local=False,
                       exclude_terms="window customer")
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_index_prefix_wand_top10(spark, sf):
        # prefix/wildcard retrieval (operators/query.prefix_search):
        # 's*' expands to the top-4 matching terms by (df DESC, term),
        # then standard disjunctive BM25 over expansion + plain terms
        from irkit_spark.operators.query import Index, prefix_search
        idx = Index(spark, _index_for(spark, sf))
        return (prefix_search(idx, "s* value", k=10, mode="wand",
                              local=False, max_expansions=4)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_index_fuzzy_wand_top10(spark, sf):
        # fuzzy retrieval (operators/query.fuzzy_search): each 'tok~'
        # expands to the lexicon terms within Levenshtein distance 1,
        # capped at 4 by (df DESC, term) — 'hast~' -> {fast, hash},
        # 'jon~' -> {join} — then standard disjunctive BM25 over the
        # expansion + plain terms
        from irkit_spark.operators.query import Index, fuzzy_search
        idx = Index(spark, _index_for(spark, sf))
        return (fuzzy_search(idx, "hast~ jon~ value", k=10, mode="wand",
                             local=False, max_expansions=4)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_index_fuzzy2_wand_top10(spark, sf):
        # explicit-distance fuzzy (Lucene 'term~2'): 'jion' is a
        # transposition of 'join' — classic Levenshtein 2, invisible
        # at ~1, found at ~2
        from irkit_spark.operators.query import Index, fuzzy_search
        idx = Index(spark, _index_for(spark, sf))
        return (fuzzy_search(idx, "jion~2 value", k=10, mode="wand",
                             local=False, max_expansions=4)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_fuzzy_suggest(spark, sf):
        # did-you-mean (operators/query.suggest): lexicon terms within
        # edit distance 1 of 'hast', most-frequent first
        from irkit_spark.operators.query import Index, suggest
        idx = Index(spark, _index_for(spark, sf))
        return suggest(idx, "hast", n=4)

    def q_index_mlt_wand_top10(spark, sf):
        # more-like-this (operators/mlt.py): mine doc 7's top-5 terms
        # by tf*idf (tie -> term), standard WAND over them, self
        # excluded
        from irkit_spark.operators.mlt import mlt_search
        from irkit_spark.operators.query import Index
        idx = Index(spark, _index_for(spark, sf))
        return (mlt_search(idx, 7, _docs(spark, sf), k=10, mode="wand",
                           max_terms=5, local=False)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_hybrid_rrf_top10(spark, sf):
        # hybrid lexical+dense retrieval (operators/hybrid.py):
        # RRF fusion of the BM25 top-20 and the cosine top-20
        # (query vector = embedding 0, excluded from the corpus side —
        # the ann_cosine convention)
        from irkit_spark.operators.hybrid import hybrid_search
        from irkit_spark.operators.query import Index
        idx = Index(spark, _index_for(spark, sf))
        emb = _emb(spark, sf).filter(F.col("vec_id") != 0)
        return hybrid_search(idx, Q_BM25_A, emb,
                             _query_vec(spark, sf), k=10, depth=20)

    def q_index_synonyms_top10(spark, sf):
        # Lucene SynonymQuery analog (operators/synonyms.py): groups
        # score as one pseudo-term — summed tf, exact union df
        from irkit_spark.operators.query import Index
        from irkit_spark.operators.synonyms import search_synonyms
        idx = Index(spark, _index_for(spark, sf))
        return (search_synonyms(idx, SYN_GROUPS, k=10)
                .select("doc_id", F.round("score", 6).alias("score")))

    def q_score_explain(spark, sf):
        # per-doc BM25 explanation (operators/explain.explain_score):
        # summing `contribution` reproduces search()'s score exactly
        from irkit_spark.operators.explain import explain_score
        from irkit_spark.operators.query import Index
        idx = Index(spark, _index_for(spark, sf))
        return (explain_score(idx, Q_BM25_A, 42)
                .select("term", "tf", "df",
                        F.round("idf", 6).alias("idf"),
                        F.round("tf_norm", 6).alias("tf_norm"),
                        F.round("contribution", 6).alias("contribution")))

    def q_event_funnel(spark, sf):
        # ordered funnel (pipeline/events.funnel): strict-after
        # qualification, earliest valid timestamp per stage
        from irkit_spark.pipeline.events import funnel
        ev = spark.read.parquet(f"{sf}/events.parquet")
        return funnel(ev, ["view", "click", "purchase"])

    def q_event_retention(spark, sf):
        # cohort retention triangle (pipeline/events.retention)
        from irkit_spark.pipeline.events import retention
        ev = spark.read.parquet(f"{sf}/events.parquet")
        return retention(ev)

    def q_event_props_stats(spark, sf):
        # JSON props extraction aggregate (pipeline/events.props_stats)
        from irkit_spark.pipeline.events import props_stats
        ev = spark.read.parquet(f"{sf}/events.parquet")
        return props_stats(ev)

    def q_bpe_pair_counts(spark, sf):
        # top-20 adjacent-symbol pairs over the word-type table — the
        # step-0 argmax input of BPE merge learning (pipeline/bpe.py;
        # the iterative learner itself is pytest-pinned vs a classic
        # Sennrich reference, driver==distributed identity)
        from irkit_spark.pipeline.bpe import pair_counts, word_types
        return (pair_counts(word_types(_docs(spark, sf)))
                .orderBy(F.desc("n"), "lhs", "rhs").limit(20))

    def q_facet_lang_counts(spark, sf):
        # faceting (operators/facets.py): the OR-query's match set
        # counted per documents.lang — pruned postings scan, one join,
        # one groupBy
        from irkit_spark.operators.facets import facet_counts
        from irkit_spark.operators.query import Index
        idx = Index(spark, _index_for(spark, sf))
        return facet_counts(idx, Q_OR, _docs(spark, sf), "lang")

    def q_autocomplete_top(spark, sf):
        # search-box completion (operators/query.autocomplete):
        # top-5 's...' lexicon terms by (df DESC, term)
        from irkit_spark.operators.query import Index, autocomplete
        idx = Index(spark, _index_for(spark, sf))
        return autocomplete(idx, "s", n=5)

    def q_eval_metrics(spark, sf):
        # retrieval-effectiveness evaluation (operators/evaluate.py):
        # the engine's own two-query WAND run scored against graded
        # qrels (rel = how many of the query's terms a doc contains),
        # trec_eval definitions at depth 10
        from irkit_spark.operators.evaluate import evaluate_run
        from irkit_spark.operators.query import Index, batch_search
        idx = Index(spark, _index_for(spark, sf))
        queries = {"qa": Q_BM25_A, "qb": Q_BM25_B}
        run = (batch_search(idx, queries, k=10, mode="wand")
               .select(F.col("query_id").alias("qid"), "doc_id",
                       "score"))
        tf = sp.term_freqs(_docs(spark, sf))
        parts = [
            tf.filter(F.col("term").isin(sorted(set(q.split()))))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").cast("double").alias("rel"))
            .withColumn("qid", F.lit(qid))
            .select("qid", "doc_id", "rel")
            for qid, q in sorted(queries.items())]
        return evaluate_run(run, parts[0].unionByName(parts[1]), k=10)

    def q_index_updated_wand_top10(spark, sf):
        # upserted retrieval (operators/update.py): superseded docs
        # tombstoned, replacements + adds appended under fresh ids;
        # stats frozen over ALL versions until compact
        from irkit_spark.operators.query import Index, search
        idx = Index(spark, _updated_for(spark, sf))
        return (search(idx, Q_BM25_A, k=10, mode="wand", local=False)
                .select("doc_id", F.round("score", 6).alias("score")))

    # ORDERING CONTRACT: the driver's correctness gate verifies only
    # the FIRST 50 entries of this dict (confirmed r5). Rotation
    # schedule (r7, per the r6 verdict): positions 1-11 are the 11
    # entries NO driver window has ever checked (incl. round-6's
    # containment_pairs); 12-50 backfill with the least-recently-
    # driver-checked entries (last green r1-r5, rotated out of the
    # r6 window). Entries past 50 are exactly the 50 the r6 driver
    # window verified (CORRECTNESS_r06.json) plus redundant
    # parameter variants of in-window entries; every out-of-window
    # entry still runs through tools/check_oracles.py each round
    # (this round: 110/110 PASS at sf0.01 and sf0.001 — see
    # OPTIMIZATION_r07.md). After this round every one of the 110
    # entries has appeared in some round's driver window.
    return {
        # --- never driver-checked before r7: lead the window ---
        "containment_pairs": q_containment,
        "eval_metrics": q_eval_metrics,
        "autocomplete_top": q_autocomplete_top,
        "fuzzy_suggest": q_fuzzy_suggest,
        "facet_lang_counts": q_facet_lang_counts,
        "hash_sample": q_hash_sample,
        "hash_split_counts": q_hash_split_counts,
        "url_canonicalize": q_url_canonicalize,
        "index_fuzzy2_wand_top10": q_index_fuzzy2_wand_top10,
        "index_phrase3_top10": q_index_phrase3_top10,
        "index_snippets_w5": q_index_snippets_w5,
        # --- least-recently-driver-checked (green r1-r5) ---
        "tokenize_tf": q_tokenize_tf,
        "lexicon": q_lexicon,
        "bm25_taat_top10": q_bm25_taat_top10,
        "index_jm_top10": q_index_jm_top10,
        "index_taat_top10": q_index_taat,
        "index_daat_top10": q_index_daat,
        "index_wand_top10": q_index_wand,
        "index_maxscore_top10": q_index_maxscore_top10,
        "minhash_lsh_pairs": q_minhash_lsh,
        "index_ql_top10": q_index_ql_top10,
        "dedup_exact": q_dedup_exact,
        "event_window_counts": q_event_window_counts,
        "collection_stats": q_collection_stats,
        "term_stats": q_term_stats,
        "doc_lengths": q_doc_lengths,
        "ql_top10": q_ql_top10,
        "jm_taat_top10": q_jm_taat_top10,
        "and_conjunctive": q_and,
        "or_disjunctive": q_or,
        "index_wand_filtered_top10": q_index_wand_filtered_top10,
        "index_batch_wand_top10": q_index_batch_wand_top10,
        "index_wand_local_top10": q_index_wand_local_top10,
        "index_wand_quantized_top10": q_index_wand_quantized,
        "index_and_top10": q_index_and_top10,
        "token_jaccard_pairs": q_token_jaccard,
        "shingle_jaccard_pairs": q_shingle_jaccard,
        "token_counts": q_token_counts,
        "quality_scores": q_quality,
        "bigram_pmi": q_bigram_pmi,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "ann_cosine_top10": q_ann_cosine,
        "media_metadata": q_media_metadata,
        "winnow_fingerprints": q_winnow,
        "dedup_near_keep_first": q_dedup_near,
        "simhash_pairs": q_simhash,
        "simhash_pairs_blocked": q_simhash_blocked,
        "lsh_ann_top10": q_lsh_ann,
        "ivf_ann_top10": q_ivf_ann,
        # --- past the driver window: parameter variants of
        # in-window entries, then the r6-verified 50 ---
        "bm25_taat_top100": q_bm25_taat_top100,
        "index_wand_top100": q_index_wand_top100,
        "index_wand_top1000": q_index_wand_top1000,
        "index_wand_quantized_bound": q_index_wand_quantized_bound,
        "dedup_keep_first": q_dedup_keep_first,
        "quality_filter": q_quality_filter,
        "cosine_pairs": q_cosine_pairs,
        "sample_frames": q_sample_frames,
        "resize_images": q_resize_images,
        "bpe_token_counts": q_bpe_token_counts,
        "index_phrase_top10": q_index_phrase_top10,
        "index_phrase_slop_top10": q_index_phrase_slop_top10,
        "index_snippets_top10": q_index_snippets_top10,
        "index_deleted_wand_top10": q_index_deleted_wand_top10,
        "index_compacted_wand_top10": q_index_compacted_wand_top10,
        "index_updated_wand_top10": q_index_updated_wand_top10,
        "index_prefix_wand_top10": q_index_prefix_wand_top10,
        "index_fuzzy_wand_top10": q_index_fuzzy_wand_top10,
        "event_funnel": q_event_funnel,
        "index_mlt_wand_top10": q_index_mlt_wand_top10,
        "bpe_pair_counts": q_bpe_pair_counts,
        "hybrid_rrf_top10": q_hybrid_rrf_top10,
        "event_props_stats": q_event_props_stats,
        "event_retention": q_event_retention,
        "index_not_wand_top10": q_index_not_wand_top10,
        "index_segments_wand_top10": q_index_segments_wand_top10,
        "index_boost_wand_top10": q_index_boost_wand_top10,
        "index_prf_wand_top10": q_index_prf_wand_top10,
        "lsh_cosine_pairs": q_lsh_cosine_pairs,
        "dedup_embedding_keep_first": q_dedup_embedding,
        "ann_index_top10": q_ann_index,
        "media_features": q_media_features,
        "event_sessions": q_event_sessions,
        "mixture_sample": q_mixture_sample,
        "index_synonyms_top10": q_index_synonyms_top10,
        "lm_quality": q_lm_quality,
        "gopher_signals": q_gopher_signals,
        "pii_scrub": q_pii_scrub,
        "score_explain": q_score_explain,
        "dedup_url_keep_first": q_dedup_url_keep_first,
        "domain_caps": q_domain_caps,
        "contamination_8gram": q_contamination,
        "bm25f_title_body_top10": q_bm25f_title_body,
        "index_regex_wand_top10": q_index_regex_wand_top10,
        "index_boolean_top10": q_index_boolean_top10,
        "facet_range_nchars": q_facet_range_nchars,
        "cross_dedup_pairs": q_cross_dedup_pairs,
        "index_near_top10": q_index_near_top10,
        "index_stemmed_top10": q_index_stemmed_top10,
        "line_dedup": q_line_dedup,
        "pack_windows": q_pack_windows,
        "pack_materialize": q_pack_materialize,
        "curation_pipeline": q_curation_report,
        "index_selective_top10": q_index_selective_top10,
        "index_tiered_wand_top10": q_index_tiered_wand_top10,
        "lm_bigram_quality": q_lm_bigram,
        "top_terms": q_top_terms,
        "topical_ids": q_topical_ids,
        "paragraph_dedup": q_paragraph_dedup,
        "substring_dedup": q_substring_dedup,
    }


# ------------------------------------------------------------- oracle SQL

_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
_TOK = (f"SELECT doc_id, unnest({_TOKS}) AS term FROM documents")
_TF = f"SELECT doc_id, term, count(*) AS tf FROM ({_TOK}) t GROUP BY 1, 2"
_DL = f"SELECT doc_id, len({_TOKS}) AS dl FROM documents"

# round-6 corpus-curation oracle inputs (synthetic url/PII builders —
# the SQL twins of _plain_urls/_messy_urls/_pii_docs above) and the
# portable sampling mix
from irkit_spark.functions.analyze import (  # noqa: E402
    STOPWORDS_EN, analyze_query, s_stem_sql)
from irkit_spark.pipeline.sampling import hash_key_sql  # noqa: E402
from irkit_spark.pipeline.textstats import (  # noqa: E402
    PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE)
from irkit_spark.pipeline.urls import (  # noqa: E402
    canonicalize_url_sql, url_domain_sql)

_HASH_MIX = hash_key_sql("doc_id")
_PLAIN_URL_SQL = ("('https://www.' || source || '.com/page' || "
                  "CAST(doc_id % 5 AS VARCHAR))")
_MESSY_URL_SQL = """(CASE doc_id % 4
 WHEN 0 THEN 'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
             || '.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag'
 WHEN 1 THEN 'http://user:pw@site' || CAST(doc_id % 7 AS VARCHAR)
             || '.example.com:80/a//'
 WHEN 2 THEN 'site' || CAST(doc_id % 7 AS VARCHAR)
             || '.example.com/x?gclid=1&z=9'
 ELSE 'https://site' || CAST(doc_id % 7 AS VARCHAR)
      || '.example.com' END)"""
_PII_TEXT_SQL = """lower(text ||
 CASE WHEN doc_id % 3 = 0 THEN ' contact user'
      || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
 CASE WHEN doc_id % 5 = 0 THEN ' host 10.'
      || CAST(doc_id % 256 AS VARCHAR) || '.0.1' ELSE '' END ||
 CASE WHEN doc_id % 7 = 0 THEN ' call +1 555 0100 42' ELSE '' END)"""
# the SQL twin of _multiline_docs (planted boilerplate chrome)
_ML_TEXT_SQL = """substr(text, 1, 40)
 || CASE WHEN doc_id % 4 = 0
         THEN chr(10) || 'Subscribe to our newsletter' ELSE '' END
 || CASE WHEN doc_id % 3 = 0
         THEN chr(10) || 'all rights reserved 2026' ELSE '' END
 || CASE WHEN doc_id % 10 = 0 THEN chr(10) || '   ' ELSE '' END
 || CASE WHEN doc_id % 97 = 0
         THEN chr(10) || 'rare promo line' ELSE '' END"""
# CAST(sum() AS BIGINT) everywhere: DuckDB's sum(BIGINT) is HUGEINT
# (int128), which value-hash-diverges from Spark's BIGINT in the
# driver's type-aware canonicalizer even when the values are equal
_TSTATS = (f"SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf "
           f"FROM ({_TF}) tf GROUP BY 1")


_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_EN)


def _values(terms: list[str]) -> str:
    return ", ".join(f"('{t}')" for t in sorted(set(terms)))


def _bm25_sql(query: str, k: int, conjunctive: bool = False,
              doc_where: str | None = None,
              not_terms: list[str] | None = None,
              weights: dict[str, float] | None = None) -> str:
    terms = sorted(set(query.lower().split()))
    conj = ""
    if conjunctive:
        conj = """
  HAVING count(*) = (SELECT count(*) FROM ts JOIN q USING (term))"""
    # doc_where (filtered retrieval) and not_terms (boolean NOT,
    # search(exclude_terms=)): both restrict SELECTION only — the
    # collection stats st/ts stay global, matching the engine
    conds = []
    if doc_where:
        conds.append(f"({doc_where})")
    if not_terms:
        nt = ", ".join(f"'{t}'" for t in sorted(set(not_terms)))
        conds.append(f"tf.doc_id NOT IN (SELECT doc_id FROM tf "
                     f"WHERE term IN ({nt}))")
    where = ("\n  WHERE " + " AND ".join(conds)) if conds else ""
    # weights (term boosts, search('term^2 ...')): w scales the
    # term's contribution linearly — same formula the engine folds
    # into idf
    if weights:
        qvals = ", ".join(f"('{t}', {float(weights.get(t, 1.0))!r})"
                          for t in terms)
        qrel, wmul = f"q(term, w) AS (VALUES {qvals})", "q.w * "
    else:
        qrel, wmul = f"q(term) AS (VALUES {_values(terms)})", ""
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
{qrel},
sc AS (
  SELECT tf.doc_id,
         sum({wmul}ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st{where}
  GROUP BY 1{conj})
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}"""


def _synonyms_sql(groups, k: int) -> str:
    """SynonymQuery oracle (operators/synonyms.py): per group, tf is
    SUMMED over members and df is the exact union (count of docs with
    any member) — then the standard BM25 with the group as one term."""
    vals = ", ".join(f"('{t}', {gi})"
                     for gi, g in enumerate(groups) for t in sorted(g))
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
g(term, gid) AS (VALUES {vals}),
gt AS (SELECT tf.doc_id, g.gid, sum(tf.tf) AS tfg
       FROM tf JOIN g USING (term) GROUP BY 1, 2),
gd AS (SELECT gid, count(*) AS df FROM gt GROUP BY 1),
sc AS (SELECT gt.doc_id,
              sum(ln(1 + (st.n_docs - gd.df + 0.5) / (gd.df + 0.5))
                  * gt.tfg / (gt.tfg + {BM25_K1} * (1.0 - {BM25_B}
                              + {BM25_B} * dl.dl / st.avgdl))) AS s
       FROM gt JOIN gd USING (gid) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}"""


def _phrase_sql(phrase: str, k: int, slop: int = 0) -> str:
    """Phrase / proximity top-k oracle (operators/
    positions.phrase_search): slop=0 counts exact adjacency via a
    list_filter over 1-indexed token offsets (DuckDB range(a, b) is
    empty when b <= a, so short docs fall out); slop>0 counts chain
    ENDINGS — final-token positions with an ordered predecessor chain
    where each consecutive pair sits within 1+slop positions (nested
    list_filter closures, one level per phrase token — the kernel's
    searchsorted-window sweep re-expressed recursively). Then the
    standard BM25 over the phrase's UNIQUE terms restricted to
    matching docs — selection changes, scoring doesn't."""
    ws = phrase.lower().split()
    m = len(ws)
    if slop == 0:
        cond = " AND ".join(f"toks[i + {j}] = '{w}'"
                            for j, w in enumerate(ws))
        ptf = (f"len(list_filter(range(1, len(toks) - {m} + 2), "
               f"i -> {cond}))")
    else:
        def chain(i: int) -> str:
            if i == 0:
                return f"toks[i0] = '{ws[0]}'"
            return (f"toks[i{i}] = '{ws[i]}' AND len(list_filter("
                    f"range(greatest(1, i{i} - {1 + slop}), i{i}), "
                    f"i{i - 1} -> {chain(i - 1)})) > 0")
        ptf = (f"len(list_filter(range(1, len(toks) + 1), "
               f"i{m - 1} -> {chain(m - 1)}))")
    terms = sorted(set(ws))
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {_values(terms)}),
ph AS (
  SELECT doc_id, CAST({ptf} AS BIGINT) AS phrase_tf
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
cand AS (SELECT doc_id, phrase_tf FROM ph WHERE phrase_tf > 0),
sc AS (
  SELECT tf.doc_id, cand.phrase_tf,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) JOIN cand USING (doc_id) CROSS JOIN st
  GROUP BY 1, 2)
SELECT doc_id, phrase_tf, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}"""


def _bm25_compact_sql(query: str, k: int, keep_where: str) -> str:
    """Compacted-index oracle (operators/compact.py): BM25 over ONLY
    the surviving docs with collection stats RECOMPUTED over them —
    unlike the tombstone oracle (_bm25_sql doc_where=...), where stats
    stay global. Every CTE reads from the filtered docs relation."""
    terms = sorted(set(query.lower().split()))
    return f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE {keep_where}),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM d) t
       GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_TOKS}) AS dl FROM d),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {_values(terms)}),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}"""


def _bm25_updated_sql(query: str, k: int) -> str:
    """Upserted-index oracle (operators/update.py): the corpus is ALL
    versions (originals + appended replacements + adds — frozen-stats
    delete contract, so st/ts read the full corpus), while SELECTION
    excludes the superseded originals (doc_id matches UPD_PRED and is
    an original, i.e. <= max old id; an appended id can satisfy the
    modulus too, hence the <= m guard)."""
    terms = sorted(set(query.lower().split()))
    return f"""
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + m + 1 AS doc_id, text || '{UPD_SUFFIX}' AS text
  FROM documents, mx WHERE {UPD_PRED}
  UNION ALL SELECT 2 * (m + 1), '{NEW_TEXT_A}' FROM mx
  UNION ALL SELECT 2 * (m + 1) + 1, '{NEW_TEXT_B}' FROM mx),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM corpus) t
       GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_TOKS}) AS dl FROM corpus),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {_values(terms)}),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  WHERE NOT (tf.doc_id % 13 = 5
             AND tf.doc_id <= (SELECT m FROM mx))
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}"""


def _prf_sql(query: str, k: int, fb_docs: int, fb_terms: int,
             beta: float) -> str:
    """PRF oracle (operators/prf.py): the whole two-pass loop in one
    CTE chain — first-pass BM25 top-fb_docs (ties on doc_id),
    candidate terms ranked by INTEGER total tf over the feedback docs
    (bit-reproducible selection), expansion weight beta * tf / max_tf
    (pure IEEE int division — identical floats in any engine),
    weighted second pass."""
    terms = sorted(set(query.lower().split()))
    bm25 = (f"ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))"
            f" * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + "
            f"{BM25_B} * dl.dl / st.avgdl))")
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q0(term) AS (VALUES {_values(terms)}),
sc0 AS (
  SELECT tf.doc_id, sum({bm25}) AS s
  FROM tf JOIN q0 USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1),
fb AS (SELECT doc_id FROM sc0 ORDER BY s DESC, doc_id
       LIMIT {fb_docs}),
cand AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS c
  FROM tf JOIN fb USING (doc_id)
  WHERE term NOT IN (SELECT term FROM q0)
  GROUP BY 1),
mxc AS (SELECT max(c) AS m FROM cand),
expd AS (SELECT term, {beta} * c / m AS w FROM cand, mxc
         ORDER BY c DESC, term LIMIT {fb_terms}),
q AS (SELECT term, 1.0 AS w FROM q0
      UNION ALL SELECT term, w FROM expd),
sc AS (
  SELECT tf.doc_id, sum(q.w * {bm25}) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}"""


def _snippet_sql(query: str, k: int, window: int) -> str:
    """Best-snippet-window oracle (operators/snippets.py): top-k BM25
    docs (the engine's rank identity), then per doc every candidate
    window STARTING at a query-term occurrence, scored by (distinct
    query terms DESC, total occurrences DESC, smallest start) via an
    occurrence self-join; snippet text = the window's frozen-tokenizer
    tokens joined by single spaces. DuckDB list slices are 1-based
    END-INCLUSIVE, so toks[s+1 : s+window] is exactly the window
    tokens from 0-based start s (truncated at doc end, like Spark's
    slice(toks, s+1, window))."""
    terms = sorted(set(query.lower().split()))
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {_values(terms)}),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1),
top AS (SELECT doc_id, round(s, 6) AS score FROM sc
        ORDER BY s DESC, doc_id LIMIT {k}),
tk AS (SELECT d.doc_id, {_TOKS} AS toks, top.score
       FROM documents d JOIN top ON d.doc_id = top.doc_id),
occ AS (SELECT * FROM (
          SELECT doc_id, unnest(toks) AS term,
                 unnest(range(len(toks))) AS pos FROM tk)
        WHERE term IN ({tlist})),
win AS (SELECT a.doc_id, a.pos AS win_start,
               count(DISTINCT b.term) AS nd, count(*) AS no
        FROM occ a JOIN occ b ON a.doc_id = b.doc_id
         AND b.pos >= a.pos AND b.pos < a.pos + {window}
        GROUP BY 1, 2),
best AS (SELECT doc_id, win_start, nd, no,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY nd DESC, no DESC, win_start ASC) AS rn
         FROM win)
SELECT b.doc_id, CAST(b.win_start AS BIGINT) AS win_start,
       CAST(b.nd AS INTEGER) AS n_distinct,
       CAST(b.no AS BIGINT) AS n_occ,
       array_to_string(tk.toks[CAST(b.win_start + 1 AS INT):
                               CAST(b.win_start + {window} AS INT)],
                       ' ') AS snippet,
       tk.score AS score
FROM best b JOIN tk ON b.doc_id = tk.doc_id
WHERE b.rn = 1
ORDER BY tk.score DESC, b.doc_id"""


def _bm25_quant_sql(query: str, k: int) -> str:
    """7-bit impact-quantized BM25 (operators/build.py quantize=True):
    score = sum_t idf_t * floor(127 * tf_norm) / 127. The floor is
    written in the kernel's exact op order ((tf/denom) * 127) so the
    double arithmetic reproduces numpy bit-for-bit."""
    terms = sorted(set(query.lower().split()))
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs,
              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {_values(terms)}),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * floor((tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * dl.dl / st.avgdl))) * 127.0)
             / 127.0) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}"""


def _quant_bound_sql(query: str, k: int) -> str:
    """Oracle for index_wand_quantized_bound: inner-join of the exact
    and quantized top-k (the Spark entry's full-outer + both>0 filter
    is an inner join for positive scores) with the per-query error
    bound sum_t(idf_t)/127."""
    terms = sorted(set(query.lower().split()))
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs,
              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {_values(terms)}),
e AS (SELECT doc_id, round(s, 6) AS exact_score FROM (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1) x ORDER BY exact_score DESC, doc_id LIMIT {k}),
qq AS (SELECT doc_id, round(s, 6) AS quant_score FROM (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * floor((tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * dl.dl / st.avgdl))) * 127.0)
             / 127.0) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1) x ORDER BY quant_score DESC, doc_id LIMIT {k}),
b AS (SELECT sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5)))
             / 127.0 AS bound
      FROM ts JOIN q USING (term) CROSS JOIN st)
SELECT e.doc_id, exact_score, quant_score,
       round(abs(exact_score - quant_score), 6) AS abs_err,
       round(b.bound, 6) AS bound,
       round(abs(exact_score - quant_score), 6) <= round(b.bound, 6)
           AS within_bound
FROM e JOIN qq ON e.doc_id = qq.doc_id CROSS JOIN b
ORDER BY e.doc_id"""


def _ql_sql(query: str, k: int) -> str:
    terms = sorted(set(query.lower().split()))
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
coll AS (SELECT sum(dl) AS c FROM dl),
q(term) AS (VALUES {_values(terms)}),
qs AS (SELECT ts.term, ts.cf FROM ({_TSTATS}) ts JOIN q USING (term)),
cand AS (SELECT DISTINCT doc_id FROM tf JOIN q USING (term)),
grid AS (SELECT cand.doc_id, qs.term, qs.cf FROM cand CROSS JOIN qs),
sc AS (
  SELECT g.doc_id,
         sum(ln((coalesce(tf.tf, 0) + {QL_MU} * g.cf / coll.c)
                / (dl.dl + {QL_MU}))) AS s
  FROM grid g
  LEFT JOIN tf ON tf.doc_id = g.doc_id AND tf.term = g.term
  JOIN dl ON dl.doc_id = g.doc_id CROSS JOIN coll
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}"""


_COS_DOUBLE = ("list_aggregate(list_transform(list_zip({a}, {b}), "
               "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
               " / (sqrt(list_aggregate(list_transform({a}, "
               "x -> CAST(x AS DOUBLE) * x), 'sum')) * "
               "sqrt(list_aggregate(list_transform({b}, "
               "x -> CAST(x AS DOUBLE) * x), 'sum')))")


def _jm_sql(query: str, k: int) -> str:
    from irkit_spark.config import JM_LAMBDA
    c = (1.0 - JM_LAMBDA) / JM_LAMBDA
    terms = sorted(set(query.lower().split()))
    return f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
coll AS (SELECT sum(dl) AS c FROM dl),
q(term) AS (VALUES {_values(terms)}),
qs AS (SELECT ts.term, ts.cf FROM ({_TSTATS}) ts JOIN q USING (term)),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + {c!r} * tf.tf / (dl.dl * (qs.cf / coll.c)))) AS s
  FROM tf JOIN qs USING (term) JOIN dl USING (doc_id) CROSS JOIN coll
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}"""


def _minhash_sql(threshold: float = 0.5) -> str:
    """DuckDB reproduction of the ENTIRE MinHash-LSH pipeline, bit-for-
    bit: the portable 31-bit Karp-Rabin token hash (base 257 mod
    2^31-1), base-263 3-token shingle fold, the 128 frozen universal-
    hash permutations (constants inlined from pipeline.dedup), the
    16x8 banding with the packed 62-bit double band fold, the band-
    bucket candidate equi-join, and the candidate-local exact-Jaccard
    verify — same arithmetic as irkit_spark.pipeline.dedup (every
    intermediate fits BIGINT by construction)."""
    return f"""
WITH {_minhash_ctes()}
SELECT doc_a, doc_b,
       round(CAST(inter AS DOUBLE)/(na+nb-inter), 6) AS jac
FROM v WHERE round(CAST(inter AS DOUBLE)/(na+nb-inter), 6) >= {threshold}
ORDER BY doc_a, doc_b"""


def _minhash_ctes(src: str = "documents") -> str:
    """The shared CTE chain for the MinHash-LSH oracles (see
    _minhash_sql): ends at `v` = candidate pairs with exact-Jaccard
    ingredients. `src` = the (doc_id, text) relation to hash — the
    cross-corpus oracle passes a combined UNION view.

    Case-fold caveat: the Spark side lowercases via Python str.lower()
    and hashes UTF-32 code points (ord); the oracle uses DuckDB
    lower() + unicode(substr(...)). These agree on ASCII — which the
    driver's synthetic `documents` fixtures are by construction — but
    locale-sensitive folds (İ, ß, Σ-final) can differ between the two
    lower() implementations, so the bit-for-bit claim is scoped to
    ASCII corpora. Non-ASCII production text would need a shared
    normalization pass (e.g. restrict to [a-z0-9]+ BEFORE folding,
    which the frozen tokenizer already does for the index path)."""
    from irkit_spark.pipeline.dedup import _KR_B1, _KR_B2, _KR_P
    from irkit_spark.pipeline.dedup import _MH_A, _MH_B
    P, PK = _KR_P, _KR_P + 1
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(shs, h -> (h*{int(a)}+{int(b)}) % {P}))"
        for a, b in zip(_MH_A, _MH_B))
    return f"""tok AS (SELECT doc_id, {_TOKS} AS toks FROM {src}),
th AS (
  SELECT doc_id, list_transform(toks, t ->
    list_reduce(list_transform(range(1, length(t)+1), j ->
      CAST(unicode(substr(t, CAST(j AS INT), 1)) AS BIGINT)),
      (a, b) -> (a*{_KR_B1}+b) % {P})) AS ths
  FROM tok WHERE len(toks) > 0),
sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(ths) >= 3
    THEN list_transform(range(1, len(ths)-3+2), i ->
      list_reduce(ths[CAST(i AS INT):CAST(i+2 AS INT)],
        (a, b) -> (a*{_KR_B2}+b) % {P}))
    ELSE [list_reduce(ths, (a, b) -> (a*{_KR_B2}+b) % {P})] END) AS shs
  FROM th),
sg AS (SELECT doc_id, [{sig_exprs}] AS sigs FROM sh),
bands AS (
  SELECT doc_id, CAST(b AS INT) AS band,
     list_reduce(sigs[CAST(b*8+1 AS INT):CAST(b*8+8 AS INT)],
                 (a, c) -> (a*{_KR_B1}+c) % {P}) * {PK}
   + list_reduce(sigs[CAST(b*8+1 AS INT):CAST(b*8+8 AS INT)],
                 (a, c) -> (a*{_KR_B2}+c) % {P}) AS band_hash
  FROM sg, range(0, 16) t(b)),
cand AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band = r.band
   AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
  GROUP BY 1, 2),
v AS (
  SELECT doc_a, doc_b, len(list_intersect(sa.shs, sb.shs)) AS inter,
         len(sa.shs) AS na, len(sb.shs) AS nb
  FROM cand JOIN sh sa ON sa.doc_id = doc_a
            JOIN sh sb ON sb.doc_id = doc_b)"""


def _dedup_near_sql(threshold: float = 0.5) -> str:
    """Oracle for the APPLIED near-dup dedup: the _minhash_ctes pair
    set -> connected components via a recursive transitive-closure CTE
    (dup clusters are tiny at oracle scale, so the closure stays small)
    -> drop every doc that can reach a smaller doc_id. Matches
    dedup_near_keep_first's LSH -> CC -> keep-min semantics exactly."""
    return f"""
WITH RECURSIVE {_minhash_ctes()},
pairs AS (
  SELECT doc_a, doc_b FROM v
  WHERE round(CAST(inter AS DOUBLE)/(na+nb-inter), 6) >= {threshold}),
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
losers AS (
  SELECT src AS doc_id FROM reach GROUP BY src HAVING min(dst) < src)
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY doc_id"""


def _simhash_sql(k: int) -> str:
    """Oracle for the simhash pair entries: both the chunk scheme
    (simhash_pairs, complete at hamming <= n_chunks-1) and the Manku
    block-permutation scheme (simhash_pairs_blocked, complete at its
    max_hamming) return EXACTLY the set of pairs within hamming <= k,
    so the oracle is the portable 62-bit simhash (two Karp-Rabin
    planes + the squaring mix, identical integer arithmetic to
    pipeline.dedup._kr_token_hashes62) + a brute-force hamming join —
    completeness of the candidate schemes is what's being checked."""
    from irkit_spark.pipeline.dedup import (_KR_B1, _KR_B2, _KR_P,
                                            N_SIMHASH_BITS)
    P, PK = _KR_P, _KR_P + 1
    sums = ",\n    ".join(
        f"SUM(tf*(2*((th>>{j})&1)-1)) AS s{j}"
        for j in range(N_SIMHASH_BITS))
    hexpr = "\n     + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_SIMHASH_BITS))
    kr = (lambda b: f"""list_reduce(list_transform(
        range(1, length(term)+1), j ->
        CAST(unicode(substr(term, CAST(j AS INT), 1)) AS BIGINT)),
        (a, b) -> (a*{b}+b) % {P})""")
    return f"""
WITH tf AS ({_TF}),
kr2 AS (
  SELECT term, {kr(_KR_B1)} AS h1, {kr(_KR_B2)} AS h2
  FROM (SELECT DISTINCT term FROM tf) t),
tmix AS (
  SELECT term, ((h1*h1 + h2) % {P}) * {PK} + ((h2*h2 + h1) % {P}) AS th
  FROM kr2),
j AS (SELECT doc_id, tf, th FROM tf JOIN tmix USING (term)),
sums AS (SELECT doc_id,
    {sums}
  FROM j GROUP BY doc_id),
hv0 AS (SELECT doc_id,
       {hexpr} AS h
  FROM sums),
hv AS (SELECT d.doc_id, coalesce(hv0.h, 0) AS h
       FROM documents d LEFT JOIN hv0 USING (doc_id))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
FROM hv a JOIN hv b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= {k}
ORDER BY doc_a, doc_b"""


# ---- portable embedding-tier oracles (round 5) -------------------------
# The candidate-selection math in pipeline/similarity.py is integer /
# floor arithmetic by design (floor-quantized vectors, integer
# hyperplanes, fixed-point k-means), so these CTEs reproduce every
# signature bit, cluster assignment and probe choice exactly; the final
# cosine re-score reuses _COS_DOUBLE (ordered left fold — already
# proven bit-identical between F.aggregate and DuckDB's list fold).


def _emb_sig_ctes() -> str:
    """CTE chain qe -> dots -> sig: quantized vectors, exact integer
    hyperplane projections (plane coeff(j,i) = ((h1^2+h2) mod p) mod
    1025 - 512 with affine h over u = j*4096+i), packed 32-bit
    signatures — identical arithmetic to similarity._int_planes /
    _sig_of."""
    from irkit_spark.pipeline.similarity import (N_PLANES, _P31, _PA1,
                                                 _PA2, _PB1, _PB2,
                                                 _PLANE_STRIDE, _QSCALE)
    u = f"(j*{_PLANE_STRIDE} + i - 1)"
    h1 = f"(({_PA1}*{u} + {_PB1}) % {_P31})"
    h2 = f"(({_PA2}*{u} + {_PB2}) % {_P31})"
    coeff = f"((({h1}*{h1} + {h2}) % {_P31}) % 1025 - 512)"
    return f"""qe AS (
  SELECT vec_id, embedding,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {_QSCALE}.0) AS BIGINT)) AS q
  FROM embeddings),
dots AS (
  SELECT vec_id, CAST(j AS INT) AS j,
    list_aggregate(list_transform(range(1, len(q)+1), i ->
      q[CAST(i AS INT)] * {coeff}), 'sum') AS dot
  FROM qe, range(0, {N_PLANES}) t(j)),
sig AS (
  SELECT vec_id,
    CAST(sum(CASE WHEN dot >= 0
             THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS s
  FROM dots GROUP BY vec_id)"""


def _lsh_ann_sql(k: int = 10, probe_hamming: int = 10) -> str:
    """Oracle for lsh_ann_top10: candidates = signatures within
    `probe_hamming` bits of the query's (vec_id 0), exact-cosine
    rerank — similarity.lsh_topk bit-for-bit."""
    cosq = _COS_DOUBLE.format(a="a.embedding", b="q.e")
    return f"""
WITH {_emb_sig_ctes()},
qs AS (SELECT s AS qsig FROM sig WHERE vec_id = 0),
cand AS (
  SELECT vec_id FROM sig, qs
  WHERE vec_id <> 0 AND bit_count(xor(s, qsig)) <= {probe_hamming}),
q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
SELECT a.vec_id, round({cosq}, 6) AS cos
FROM embeddings a JOIN cand USING (vec_id) CROSS JOIN q
ORDER BY cos DESC, a.vec_id LIMIT {k}"""


def _emb_pair_ctes(threshold: float, band_bits: int = 4) -> str:
    """bnd -> cand -> pv: banded signature blocking keys, candidate
    equi-join on (band, bsig), exact-cosine verify >= threshold —
    similarity.lsh_cosine_pairs bit-for-bit."""
    cosab = _COS_DOUBLE.format(a="a.embedding", b="b.embedding")
    return f"""{_emb_sig_ctes()},
bnd AS (
  SELECT vec_id, CAST(j // {band_bits} AS INT) AS band,
    CAST(sum(CASE WHEN dot >= 0
             THEN (CAST(1 AS BIGINT) << (j % {band_bits}))
             ELSE 0 END) AS BIGINT) AS bsig
  FROM dots GROUP BY 1, 2),
cand AS (
  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM bnd l JOIN bnd r
    ON l.band = r.band AND l.bsig = r.bsig AND l.vec_id < r.vec_id
  GROUP BY 1, 2),
pv AS (
  SELECT c.vec_a, c.vec_b, round({cosab}, 6) AS cos
  FROM cand c JOIN embeddings a ON a.vec_id = c.vec_a
              JOIN embeddings b ON b.vec_id = c.vec_b
  WHERE round({cosab}, 6) >= {threshold})"""


def _lsh_pairs_sql(threshold: float) -> str:
    return f"""
WITH {_emb_pair_ctes(threshold)}
SELECT vec_a, vec_b, cos FROM pv ORDER BY vec_a, vec_b"""


def _dedup_embedding_sql(threshold: float) -> str:
    """Oracle for the APPLIED embedding dedup: banded-LSH pair set ->
    connected components via a recursive transitive-closure CTE ->
    drop every vec that can reach a smaller vec_id (same pattern as
    _dedup_near_sql)."""
    return f"""
WITH RECURSIVE {_emb_pair_ctes(threshold)},
e AS (SELECT vec_a AS src, vec_b AS dst FROM pv
      UNION ALL SELECT vec_b, vec_a FROM pv),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
losers AS (
  SELECT src AS vec_id FROM reach GROUP BY src HAVING min(dst) < src)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM losers)
ORDER BY vec_id"""


def _ivf_ann_sql(k: int = 10, n_clusters: int = 16,
                 n_probe: int = 4) -> str:
    """Oracle for ivf_ann_top10 AND ann_index_top10 (the persisted
    index materializes the identical assignment): fixed-point k-means
    — hash-ordered bounded sample, seeds = first n_clusters, then
    _IVF_ITERS Lloyd rounds of integer-L2 argmin assignment +
    floor(sum/count) centroid update — then full integer assignment,
    n_probe nearest cells to the quantized query, exact-cosine rerank.
    Reproduces similarity.train_centroids_q / ivf_assign /
    _probe_clusters bit-for-bit (floor(CAST(sum AS DOUBLE)/cnt) is
    exact: |sum| <= n_train*2^21 << 2^53)."""
    from irkit_spark.pipeline.similarity import (_IVF_ITERS, _IVF_TRAIN,
                                                 _MA, _MB, _P31, _QSCALE)
    d2 = ("list_aggregate(list_transform(list_zip({a}, {b}), "
          "x -> (x[1]-x[2])*(x[1]-x[2])), 'sum')")
    cosq = _COS_DOUBLE.format(a="a.embedding", b="q.e")
    lloyd = []
    for t in range(1, _IVF_ITERS + 1):
        prev = f"cent{t-1}"
        lloyd.append(f"""a{t} AS (
  SELECT s.rn, s.q, c.cluster,
    row_number() OVER (PARTITION BY s.rn
      ORDER BY {d2.format(a='s.q', b='c.q')}, c.cluster) AS rnk
  FROM samp s CROSS JOIN {prev} c),
u{t} AS (
  SELECT cluster, i,
    CAST(floor(CAST(sum(q[CAST(i AS INT)]) AS DOUBLE) / count(*))
         AS BIGINT) AS v
  FROM a{t}, range(1, 4097) t(i)
  WHERE rnk = 1 AND i <= (SELECT max(len(embedding)) FROM embeddings)
  GROUP BY cluster, i),
cent{t} AS (
  SELECT c.cluster, coalesce(u.nq, c.q) AS q
  FROM {prev} c LEFT JOIN
    (SELECT cluster, list(v ORDER BY i) AS nq
     FROM u{t} GROUP BY cluster) u USING (cluster))""")
    last = f"cent{_IVF_ITERS}"
    return f"""
WITH qe AS (
  SELECT vec_id, embedding,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {_QSCALE}.0) AS BIGINT)) AS q
  FROM embeddings),
samp AS (
  SELECT vec_id, q,
    row_number() OVER (
      ORDER BY ({_MA}*(vec_id+1) + {_MB}) % {_P31}, vec_id) AS rn
  FROM qe WHERE vec_id <> 0
  QUALIFY rn <= {_IVF_TRAIN}),
cent0 AS (SELECT CAST(rn - 1 AS INT) AS cluster, q
          FROM samp WHERE rn <= {n_clusters}),
{','.join(lloyd)},
assign AS (
  SELECT e.vec_id, c.cluster,
    row_number() OVER (PARTITION BY e.vec_id
      ORDER BY {d2.format(a='e.q', b='c.q')}, c.cluster) AS rnk
  FROM qe e CROSS JOIN {last} c WHERE e.vec_id <> 0),
qprobe AS (
  SELECT c.cluster,
    row_number() OVER (
      ORDER BY {d2.format(a='qq.q', b='c.q')}, c.cluster) AS rnk
  FROM {last} c, (SELECT q FROM qe WHERE vec_id = 0) qq),
cand AS (
  SELECT a.vec_id FROM assign a JOIN qprobe p ON a.cluster = p.cluster
  WHERE a.rnk = 1 AND p.rnk <= {n_probe}),
q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
SELECT a.vec_id, round({cosq}, 6) AS cos
FROM embeddings a JOIN cand USING (vec_id) CROSS JOIN q
ORDER BY cos DESC, a.vec_id LIMIT {k}"""


def _hxb(i: int) -> str:
    """DuckDB expr for byte i (0-based) of the md5 hex string `hx` —
    lets the oracle reproduce multimodal._fake_decode exactly."""
    hexd = "'0123456789abcdef'"
    return (f"((strpos({hexd}, substr(hx, {2 * i + 1}, 1)) - 1) * 16"
            f" + strpos({hexd}, substr(hx, {2 * i + 2}, 1)) - 1)")


def _media_features_sql() -> str:
    feat = ", ".join(f"CAST({_hxb(8 + i)} AS VARCHAR)" for i in range(8))
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS hx,
                  octet_length(CAST(text AS BLOB)) AS n_bytes
           FROM documents)
SELECT doc_id, n_bytes, hx AS digest,
       CAST(16 + {_hxb(0)} % 240 AS BIGINT) AS width,
       CAST(16 + {_hxb(1)} % 240 AS BIGINT) AS height,
       concat_ws(',', {feat}) AS feat_bytes
FROM m"""


def oracle_sql() -> dict[str, str]:
    stop = {lg: ", ".join(f"'{w}'" for w in ws) for lg, ws in {
        "en": ["the", "a", "of", "and", "to", "in", "is", "for"],
        "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
        "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
        "es": ["el", "los", "las", "y", "es", "un", "una", "en"],
    }.items()}
    hit = {lg: (f"len(list_filter({_TOKS}, x -> x IN ({ws})))")
           for lg, ws in stop.items()}
    cosq = _COS_DOUBLE.format(a="a.embedding", b="q.e")
    cosp = _COS_DOUBLE.format(a="a.embedding", b="b.embedding")
    and_terms = sorted(set(Q_AND.split()))
    return {
        "tokenize_tf": _TF,
        "term_stats": _TSTATS,
        "doc_lengths": f"SELECT doc_id, len({_TOKS}) AS doc_len "
                       f"FROM documents",
        "collection_stats": f"""
WITH dl AS ({_DL}), ts AS ({_TSTATS})
SELECT (SELECT count(*) FROM dl) AS n_docs,
       (SELECT round(avg(dl), 6) FROM dl) AS avg_doc_len,
       (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS coll_len,
       (SELECT count(*) FROM ts) AS vocab""",
        "lexicon": f"""
SELECT row_number() OVER (ORDER BY term) - 1 AS term_id, term, df, cf
FROM ({_TSTATS}) ts""",
        "bm25_taat_top10": _bm25_sql(Q_BM25_A, 10),
        "bm25_taat_top100": _bm25_sql(Q_BM25_B, 100),
        "ql_top10": _ql_sql(Q_BM25_A, 10),
        "jm_taat_top10": _jm_sql(Q_BM25_A, 10),
        "and_conjunctive": f"""
WITH tf AS ({_TF}), q(term) AS (VALUES {_values(and_terms)})
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS sum_tf
FROM tf JOIN q USING (term)
GROUP BY doc_id HAVING count(*) = {len(and_terms)}
ORDER BY doc_id""",
        "or_disjunctive": f"""
WITH tf AS ({_TF}), q(term) AS (VALUES {_values(Q_OR.split())})
SELECT doc_id, count(*) AS n_terms, CAST(sum(tf) AS BIGINT) AS sum_tf
FROM tf JOIN q USING (term) GROUP BY doc_id ORDER BY doc_id""",
        "index_taat_top10": _bm25_sql(Q_BM25_A, 10),
        "index_synonyms_top10": _synonyms_sql(SYN_GROUPS, 10),
        # per-doc explanation: same frozen idf/tf_norm text, doc 42
        "score_explain": f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {_values(sorted(set(Q_BM25_A.split())))}),
d AS (SELECT dl FROM dl WHERE doc_id = 42)
SELECT tf.term, CAST(tf.tf AS BIGINT) AS tf,
       CAST(ts.df AS BIGINT) AS df,
       round(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5)), 6)
           AS idf,
       round(tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
             * d.dl / st.avgdl)), 6) AS tf_norm,
       round(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
               * d.dl / st.avgdl)), 6) AS contribution
FROM tf JOIN q USING (term) JOIN ts USING (term)
     CROSS JOIN st CROSS JOIN d
WHERE tf.doc_id = 42""",
        "index_daat_top10": _bm25_sql(Q_BM25_A, 10),
        "index_wand_top10": _bm25_sql(Q_BM25_A, 10),
        "index_wand_top100": _bm25_sql(Q_BM25_B, 100),
        "index_selective_top10": _bm25_sql(Q_BM25_B, 10),
        "index_tiered_wand_top10": _bm25_sql(Q_BM25_A, 10),
        "index_maxscore_top10": _bm25_sql(Q_BM25_B, 10),
        "index_wand_filtered_top10": _bm25_sql(
            Q_BM25_A, 10, doc_where="doc_id % 3 = 0"),
        "index_wand_top1000": _bm25_sql(Q_OR, 1000),
        "index_ql_top10": _ql_sql(Q_BM25_A, 10),
        "index_jm_top10": _jm_sql(Q_BM25_A, 10),
        "index_and_top10": _bm25_sql(Q_AND, 10, conjunctive=True),
        "index_batch_wand_top10": "\nUNION ALL\n".join(
            f"SELECT '{qid}' AS query_id, doc_id, score FROM "
            f"({_bm25_sql(q, 10)}\n) b_{qid}"
            for qid, q in (("qa", Q_BM25_A), ("qb", Q_BM25_B),
                           ("qo", Q_OR))),
        "index_wand_local_top10": _bm25_sql(Q_BM25_A, 10),
        "index_wand_quantized_top10": _bm25_quant_sql(Q_BM25_A, 10),
        "index_wand_quantized_bound": _quant_bound_sql(Q_BM25_A, 10),
        "dedup_exact": """
SELECT md5(text) AS h, min(doc_id) AS rep_doc, count(*) AS n_copies
FROM documents GROUP BY 1""",
        "dedup_keep_first": """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))""",
        "token_jaccard_pairs": f"""
WITH base AS (SELECT doc_id, source,
                     list_distinct({_TOKS}) AS toks FROM documents),
tok AS (SELECT doc_id, source, unnest(toks) AS term FROM base),
sizes AS (SELECT doc_id, len(toks) AS n FROM base),
pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
          FROM tok x JOIN tok y ON x.term = y.term
               AND x.source = y.source AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jac
FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
     JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.5""",
        "shingle_jaccard_pairs": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, generate_subscripts(toks, 1) AS pos,
               unnest(toks) AS term FROM base),
sh AS (SELECT DISTINCT a.doc_id,
              a.term || ' ' || b.term || ' ' || c.term AS sh
       FROM tok a
       JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
          FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jac
FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
     JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.1""",
        "containment_pairs": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, generate_subscripts(toks, 1) AS pos,
               unnest(toks) AS term FROM base),
sh AS (SELECT DISTINCT a.doc_id,
              a.term || ' ' || b.term || ' ' || c.term AS sh
       FROM tok a
       JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
          FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(inter * 1.0 / sa.n, 6) AS c_ab,
       round(inter * 1.0 / sb.n, 6) AS c_ba
FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
     JOIN sizes sb ON sb.doc_id = doc_b
WHERE greatest(round(inter * 1.0 / sa.n, 6),
               round(inter * 1.0 / sb.n, 6)) >= 0.3""",
        "token_counts": f"""
SELECT doc_id, len({_TOKS}) AS n_tokens,
       len(list_distinct({_TOKS})) AS n_unique,
       length(text) AS n_chars_text
FROM documents""",
        "quality_scores": f"""
SELECT doc_id, len({_TOKS}) AS n_tokens,
  round(CASE WHEN len({_TOKS}) > 0 THEN
    len(list_filter({_TOKS}, x -> x IN ({stop['en']})))
    * 1.0 / len({_TOKS}) ELSE 0.0 END, 6) AS stop_ratio,
  round(CASE WHEN len({_TOKS}) > 0 THEN
    len(list_distinct({_TOKS})) * 1.0 / len({_TOKS})
    ELSE 0.0 END, 6) AS uniq_ratio,
  round(CASE WHEN len({_TOKS}) > 0 THEN
    list_aggregate(list_transform({_TOKS}, x -> length(x)), 'sum')
    * 1.0 / len({_TOKS}) ELSE 0.0 END, 6) AS mean_tok_len
FROM documents""",
        "lang_id": f"""
WITH h AS (SELECT doc_id, {hit['en']} AS en, {hit['de']} AS de,
                  {hit['fr']} AS fr, {hit['es']} AS es FROM documents)
SELECT doc_id,
  CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
       WHEN en = greatest(en, de, fr, es) THEN 'en'
       WHEN de = greatest(en, de, fr, es) THEN 'de'
       WHEN fr = greatest(en, de, fr, es) THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM h""",
        "fingerprints": f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
FROM documents""",
        # winnowing: same portable double Karp-Rabin (bases 257/263 mod
        # 2^31-1, packed h1*2^31+h2) + window-of-4 min + dedup as the
        # Spark op — bit-identical by construction
        "winnow_fingerprints": """
WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
h AS (
  SELECT doc_id,
         list_transform(range(1, length(t)-8+2), i ->
           list_reduce(list_transform(range(i, i+8), j ->
             CAST(unicode(substr(t, CAST(j AS INT), 1)) AS BIGINT)),
             (a, b) -> (a*257+b) % 2147483647) * 2147483648
           + list_reduce(list_transform(range(i, i+8), j ->
             CAST(unicode(substr(t, CAST(j AS INT), 1)) AS BIGINT)),
             (a, b) -> (a*263+b) % 2147483647)) AS hs
  FROM d WHERE length(t) >= 8),
wmin AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(hs) >= 4
           THEN list_transform(range(1, len(hs)-4+2), i ->
                list_min(hs[CAST(i AS INT):CAST(i+3 AS INT)]))
           ELSE [list_min(hs)] END) AS fps
  FROM h)
SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp
FROM wmin ORDER BY doc_id, fp""",
        "minhash_lsh_pairs": _minhash_sql(0.5),
        "dedup_near_keep_first": _dedup_near_sql(0.5),
        "simhash_pairs": _simhash_sql(6),
        "simhash_pairs_blocked": _simhash_sql(4),
        "lsh_ann_top10": _lsh_ann_sql(),
        "ivf_ann_top10": _ivf_ann_sql(),
        "ann_index_top10": _ivf_ann_sql(),
        "lsh_cosine_pairs": _lsh_pairs_sql(0.45),
        "dedup_embedding_keep_first": _dedup_embedding_sql(0.45),
        "ann_cosine_top10": f"""
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
SELECT a.vec_id, round({cosq}, 6) AS cos
FROM embeddings a CROSS JOIN q WHERE a.vec_id <> 0
ORDER BY cos DESC, a.vec_id LIMIT 10""",
        # hybrid RRF: integer ranks from each leg's own deterministic
        # ordering, fused as 1.0/(60+rank) sums — identical division
        # text in both engines
        "hybrid_rrf_top10": f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qt(term) AS (VALUES {_values(sorted(set(Q_BM25_A.split())))}),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN qt USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1),
lex AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rank
    FROM sc) WHERE rank <= 20),
q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
den AS (
  SELECT doc_id, rank FROM (
    SELECT a.vec_id AS doc_id,
           row_number() OVER (ORDER BY round({cosq}, 6) DESC,
                              a.vec_id) AS rank
    FROM embeddings a CROSS JOIN q WHERE a.vec_id <> 0)
  WHERE rank <= 20)
SELECT doc_id,
       round(coalesce(1.0 / (60 + lex.rank), 0.0)
             + coalesce(1.0 / (60 + den.rank), 0.0), 6) AS rrf_score
FROM lex FULL JOIN den USING (doc_id)
ORDER BY rrf_score DESC, doc_id LIMIT 10""",
        "cosine_pairs": f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cosp}, 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round({cosp}, 6) > 0.3""",
        "media_metadata": """
SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
       md5(text) AS digest FROM documents""",
        "media_features": _media_features_sql(),
        "index_phrase_top10": _phrase_sql(Q_PHRASE, 10),
        "index_phrase3_top10": _phrase_sql(Q_PHRASE3, 10),
        "index_phrase_slop_top10": _phrase_sql(Q_PHRASE, 10, slop=1),
        "index_snippets_top10": _snippet_sql(Q_BM25_A, 10, 30),
        "index_snippets_w5": _snippet_sql(Q_OR, 10, 5),
        # tombstones: selection-only (global stats) vs compaction:
        # stats recomputed over the survivors
        "index_deleted_wand_top10": _bm25_sql(
            Q_BM25_A, 10, doc_where=f"NOT ({DEL_PRED})"),
        "index_compacted_wand_top10": _bm25_compact_sql(
            Q_BM25_A, 10, keep_where=f"NOT ({DEL_PRED})"),
        # upsert: stats over ALL versions, superseded originals
        # excluded from selection only
        "index_updated_wand_top10": _bm25_updated_sql(Q_BM25_A, 10),
        # boolean NOT: selection-only exclusion, stats stay global
        "index_not_wand_top10": _bm25_sql(
            Q_BM25_A, 10, not_terms=["window", "customer"]),
        # segmented serving == the single-index ranking, so the plain
        # brute-force BM25 SQL is the oracle
        "index_segments_wand_top10": _bm25_sql(Q_BM25_B, 10),
        # term boosts: w * idf * tf_norm summed
        "index_boost_wand_top10": _bm25_sql(
            Q_BM25_A, 10, weights={"join": 2.0, "merge": 0.5}),
        # pseudo-relevance feedback: the full two-pass loop as CTEs
        "index_prf_wand_top10": _prf_sql(Q_BM25_B, 10, 5, 3, 0.5),
        # wildcard rewrite: 's*' -> top-4 lexicon matches by
        # (df DESC, term ASC) + the plain term, then standard BM25 OR
        "index_prefix_wand_top10": f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (
  SELECT term FROM (
    SELECT term FROM ts WHERE term LIKE 's%'
    ORDER BY df DESC, term LIMIT 4)
  UNION SELECT 'value' AS term),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT 10""",
        # fuzzy rewrite: each 'tok~' -> lexicon terms with
        # levenshtein <= 1 (classic: insert/delete/substitute — the
        # exact predicate the engine verifies with), capped at 4 by
        # (df DESC, term ASC), then standard BM25 OR with the plain
        # term
        "index_fuzzy_wand_top10": f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (
  SELECT term FROM (
    SELECT term FROM ts WHERE levenshtein(term, 'hast') <= 1
    ORDER BY df DESC, term LIMIT 4)
  UNION
  SELECT term FROM (
    SELECT term FROM ts WHERE levenshtein(term, 'jon') <= 1
    ORDER BY df DESC, term LIMIT 4)
  UNION SELECT 'value' AS term),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT 10""",
        # explicit-distance fuzzy: levenshtein <= 2 rewrite
        "index_fuzzy2_wand_top10": f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (
  SELECT term FROM (
    SELECT term FROM ts WHERE levenshtein(term, 'jion') <= 2
    ORDER BY df DESC, term LIMIT 4)
  UNION SELECT 'value' AS term),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT 10""",
        # did-you-mean: ED<=1 lexicon neighborhood of 'hast',
        # (df DESC, term ASC), top 4
        "fuzzy_suggest": f"""
WITH tf AS ({_TF}),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
SELECT term, df FROM ts WHERE levenshtein(term, 'hast') <= 1
ORDER BY df DESC, term LIMIT 4""",
        # faceting: distinct any-term match set joined to the lang
        # column, counted per facet value
        "facet_lang_counts": f"""
WITH tf AS ({_TF}),
q(term) AS (VALUES {_values(sorted(set(Q_OR.split())))}),
m AS (SELECT DISTINCT doc_id FROM tf JOIN q USING (term))
SELECT CAST(d.lang AS VARCHAR) AS facet, count(*) AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY 1""",
        # search-box completion: top-df prefix matches
        "autocomplete_top": f"""
WITH tf AS ({_TF}),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
SELECT term, df FROM ts WHERE term LIKE 's%'
ORDER BY df DESC, term LIMIT 5""",
        # more-like-this: mine doc 7's top-5 terms by tf*idf (the
        # engine's own idf formula; tie -> term string), standard BM25
        # OR over them, source doc excluded
        "index_mlt_wand_top10": f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (
  SELECT tf.term
  FROM tf JOIN ts USING (term) CROSS JOIN st
  WHERE tf.doc_id = 7 AND tf.tf >= 1
  ORDER BY tf.tf * ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           DESC, tf.term
  LIMIT 5),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc WHERE doc_id <> 7
ORDER BY score DESC, doc_id LIMIT 10""",
        # retrieval evaluation (trec_eval definitions at depth 10):
        # run = the two-query BM25 top-10 recomputed from the corpus,
        # qrels = graded term-presence counts; same (rel DESC, doc_id)
        # ideal ordering, same ln(x)/ln2-literal log2 as the engine
        "eval_metrics": f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qt(qid, term) AS (VALUES
  ('qa','hash'),('qa','join'),('qa','merge'),
  ('qb','customer'),('qb','spark'),('qb','window')),
sc AS (
  SELECT qt.qid, tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN qt USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1, 2),
runk AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc_id)
               AS rank
    FROM sc) WHERE rank <= 10),
qrels AS (
  SELECT qt.qid, tf.doc_id,
         CAST(count(DISTINCT tf.term) AS DOUBLE) AS rel
  FROM tf JOIN qt USING (term) GROUP BY 1, 2),
totals AS (
  SELECT qid, count(*) AS n_rel FROM qrels WHERE rel > 0 GROUP BY 1),
ideal AS (
  SELECT qid, sum((pow(2.0, rel) - 1.0)
                  / (ln(r + 1.0) / 0.6931471805599453)) AS idcg
  FROM (SELECT qid, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, doc_id) AS r
        FROM qrels) WHERE r <= 10 GROUP BY 1),
j AS (
  SELECT runk.qid, runk.rank, coalesce(qrels.rel, 0.0) AS rel,
         CASE WHEN coalesce(qrels.rel, 0.0) > 0 THEN 1.0 ELSE 0.0 END
             AS hit
  FROM runk LEFT JOIN qrels USING (qid, doc_id)),
jc AS (SELECT *, sum(hit) OVER (PARTITION BY qid ORDER BY rank)
           AS cum_hits FROM j),
pq AS (
  SELECT qid, sum(hit) AS hits,
         sum(hit * cum_hits / rank) AS ap_num,
         max(hit / rank) AS rr,
         sum((pow(2.0, rel) - 1.0)
             / (ln(rank + 1.0) / 0.6931471805599453)) AS dcg
  FROM jc GROUP BY 1)
SELECT totals.qid, round(coalesce(pq.hits, 0) / 10.0, 6) AS p_at_k,
       round(coalesce(pq.hits, 0) * 1.0 / totals.n_rel, 6)
           AS recall_at_k,
       round(coalesce(pq.ap_num, 0) / totals.n_rel, 6) AS ap,
       round(coalesce(pq.rr, 0), 6) AS rr,
       round(coalesce(pq.dcg, 0) / ideal.idcg, 6) AS ndcg
FROM totals JOIN ideal USING (qid) LEFT JOIN pq USING (qid)""",
        # query-log analytics: epoch-aligned tumbling-hour buckets
        # (date_trunc == F.window for 1-hour tumbling) + gap sessions
        "event_window_counts": """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type, count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2""",
        "event_sessions": """
WITH l AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM l)
SELECT user_id, session_seq, count(*) AS n_events,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM s GROUP BY 1, 2""",
        # --- round-6 corpus-curation tier --------------------------
        # deterministic sampling: the same portable 31-bit mix text
        "hash_sample": f"""
SELECT doc_id FROM documents WHERE {_HASH_MIX} % 5 < 1""",
        "hash_split_counts": f"""
WITH r AS (SELECT {_HASH_MIX} % 100 AS r FROM documents)
SELECT CASE WHEN r < 98 THEN 'train' WHEN r < 99 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n FROM r GROUP BY 1""",
        # unigram-LM quality: BIGINT/BIGINT divisions -> DOUBLE in both
        "lm_quality": f"""
WITH tf AS ({_TF}),
uni AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
tot AS (SELECT CAST(sum(cf) AS BIGINT) AS c_total FROM uni)
SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
       round(sum(tf.tf * ln(cf / c_total)) / sum(tf.tf), 6)
           AS avg_logprob
FROM tf JOIN uni USING (term) CROSS JOIN tot GROUP BY 1""",
        # paragraph keep-first dedup: first occurrence in (doc_id,
        # position) order wins; blank-normalizing paragraphs survive
        "paragraph_dedup": """
WITH base AS (SELECT doc_id, str_split(text, e'\n\n') AS ps
              FROM documents),
p AS (SELECT doc_id, unnest(ps) AS par,
             CAST(unnest(range(1, len(ps)+1)) AS BIGINT) AS pos
      FROM base),
r AS (SELECT doc_id, par, pos, lower(trim(par)) AS k,
             row_number() OVER (PARTITION BY lower(trim(par))
                                ORDER BY doc_id, pos) AS rn
      FROM p),
kept AS (SELECT * FROM r WHERE rn = 1 OR k = ''),
agg AS (SELECT doc_id,
               string_agg(par, e'\n\n' ORDER BY pos) AS text2,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY 1)
SELECT b.doc_id, coalesce(a.text2, '') AS text,
       CAST(len(b.ps) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM base b LEFT JOIN agg a USING (doc_id)""",
        # exact-substring dedup (Lee et al. ExactSubstr): portable
        # token-hash (base 257) + rolling 8-gram hash (base 263) mod
        # 2^31-1, bit-identical to pipeline/substring.py; corpus-first
        # occurrence per gram hash survives, every later occurrence's
        # 8 covered token positions are cut. The packed first-key
        # doc_id*2^32+pos equals the engine's min(struct(doc_id,pos))
        # because pos < 2^32 always holds for in-doc token positions.
        "substring_dedup": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
th AS (SELECT doc_id, ts,
              list_transform(ts, t -> list_reduce(
                  list_transform(regexp_extract_all(t, '.'),
                                 c -> CAST(unicode(c) AS BIGINT)),
                  (a, b) -> (a * 257 + b) % 2147483647)) AS ths
       FROM t),
occ AS (SELECT doc_id,
               CAST(unnest(range(1, len(ths) - 6)) AS BIGINT) - 1 AS pos,
               unnest(list_transform(range(1, len(ths) - 6),
                   i -> list_reduce(list_slice(ths, i, i + 7),
                        (a, b) -> (a * 263 + b) % 2147483647))) AS gh
        FROM th WHERE len(ths) >= 8),
fst AS (SELECT gh, min(doc_id * 4294967296 + pos) AS fk
        FROM occ GROUP BY 1),
anch AS (SELECT o.doc_id, o.pos FROM occ o JOIN fst USING (gh)
         WHERE o.doc_id * 4294967296 + o.pos <> fk),
rm AS (SELECT DISTINCT doc_id, p FROM
         (SELECT doc_id, pos + unnest(range(8)) AS p FROM anch)),
tp AS (SELECT doc_id, unnest(ts) AS tok,
              CAST(unnest(range(len(ts))) AS BIGINT) AS p FROM t),
kept AS (SELECT tp.* FROM tp WHERE NOT EXISTS
           (SELECT 1 FROM rm WHERE rm.doc_id = tp.doc_id
                                AND rm.p = tp.p)),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS txt,
               CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY 1)
SELECT t.doc_id, md5(coalesce(a.txt, '')) AS fp,
       CAST(len(t.ts) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN agg a USING (doc_id)""",
        # mixture sampling: per-lang epoch counts; the fractional
        # epoch is the same portable mix(doc_id) residue test as
        # hash_sample (weights en=0.5, zh=2.0, fr=1.25, default 1.0
        # quantized at den=1e6 — 500000/0/250000 residues)
        "mixture_sample": f"""
WITH r AS (SELECT doc_id, lang,
                  {hash_key_sql('doc_id')} % 1000000 AS res
           FROM documents),
n AS (SELECT doc_id, lang,
             CASE lang
               WHEN 'en' THEN CASE WHEN res < 500000 THEN 1 ELSE 0 END
               WHEN 'zh' THEN 2
               WHEN 'fr' THEN 1 + CASE WHEN res < 250000
                                       THEN 1 ELSE 0 END
               ELSE 1 END AS k
      FROM r)
SELECT doc_id, lang, CAST(unnest(range(k)) AS BIGINT) AS epoch
FROM n""",
        # ordered funnel: stage CTE chain, strict-after qualification
        "event_funnel": """
WITH s0 AS (SELECT user_id, min(ts) AS qt FROM events
            WHERE event_type = 'view' GROUP BY 1),
s1 AS (SELECT e.user_id, min(e.ts) AS qt FROM events e
       JOIN s0 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s0.qt GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS qt FROM events e
       JOIN s1 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s1.qt GROUP BY 1)
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'view', (SELECT count(*) FROM s0)),
  (CAST(1 AS BIGINT), 'click', (SELECT count(*) FROM s1)),
  (CAST(2 AS BIGINT), 'purchase', (SELECT count(*) FROM s2)))
  t(stage, event_type, n_users)""",
        # cohort retention: first-day cohorts, day offsets, distinct
        # active users (UTC dates — the session contract)
        "event_retention": """
WITH first AS (SELECT user_id, min(ts) AS ft FROM events GROUP BY 1),
act AS (SELECT DISTINCT CAST(date_diff('day', DATE '1970-01-01',
                    CAST(ft AS DATE)) AS BIGINT) AS cohort_day,
               CAST(date_diff('day', CAST(ft AS DATE), CAST(ts AS DATE))
                    AS BIGINT) AS day_offset,
               e.user_id
        FROM events e JOIN first USING (user_id))
SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
FROM act GROUP BY 1, 2""",
        # JSON props extraction aggregate
        "event_props_stats": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_key,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1""",
        # BPE step-0 pair counts: word types via the frozen tokenizer,
        # adjacent character pairs weighted by type count; (n desc,
        # lhs, rhs) is a total order over pairs so the LIMIT boundary
        # is engine-stable
        "bpe_pair_counts": f"""
WITH w AS (SELECT unnest({_TOKS}) AS word FROM documents),
t AS (SELECT word, count(*) AS cnt FROM w GROUP BY 1),
s AS (SELECT cnt, regexp_extract_all(word, '.') AS cs FROM t
      WHERE len(word) >= 2),
p AS (SELECT unnest(list_transform(range(1, len(cs)),
                    i -> cs[i] || chr(31) || cs[i + 1])) AS pr, cnt
      FROM s)
SELECT string_split(pr, chr(31))[1] AS lhs,
       string_split(pr, chr(31))[2] AS rhs,
       CAST(sum(cnt) AS BIGINT) AS n
FROM p GROUP BY 1, 2 ORDER BY n DESC, lhs, rhs LIMIT 20""",
        # topic-shard id assignment: the bucketed two-phase scheme is
        # semantically row_number over (KR-31 bucket of lang, lang,
        # doc_id) — the oracle states it as exactly that window
        "topical_ids": """
WITH h AS (SELECT doc_id, lang,
  CASE WHEN length(lang) = 0 THEN 0 ELSE
    list_reduce(list_transform(range(1, length(lang)+1), j ->
      CAST(unicode(substr(lang, CAST(j AS INT), 1)) AS BIGINT)),
      (a, b) -> (a*257+b) % 2147483647) END % 8 AS bucket
  FROM documents)
SELECT doc_id, lang,
       CAST(row_number() OVER (ORDER BY bucket, lang, doc_id) - 1
            AS BIGINT) AS topical_id
FROM h""",
        # TF-IDF keyword extraction: selection/rank order uses the
        # ROUNDED score (ln can drift by ulps across libms; round(6)
        # makes the order identical), term asc breaks ties
        "top_terms": f"""
WITH tf AS (SELECT doc_id, w AS term, count(*) AS tf FROM
            (SELECT doc_id, unnest({_TOKS}) AS w FROM documents)
            GROUP BY 1, 2),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
sc AS (SELECT doc_id, term,
              round(tf * ln((1 + n_docs) / (1 + df)), 6) AS tfidf
       FROM tf JOIN dfx USING (term) CROSS JOIN n),
rk AS (SELECT doc_id, term, tfidf,
              CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, term) AS BIGINT) AS rank
       FROM sc)
SELECT doc_id, rank, term, tfidf FROM rk WHERE rank <= 5""",
        # interpolated bigram LM: same division/log text, round(6)
        "lm_bigram_quality": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents
              WHERE len({_TOKS}) >= 2),
inst AS (SELECT doc_id,
                unnest(list_transform(range(1, len(ts)),
                                      i -> ts[i])) AS p,
                unnest(list_transform(range(1, len(ts)),
                                      i -> ts[i+1])) AS c
         FROM toks),
bg AS (SELECT p, c, count(*) AS cb FROM inst GROUP BY 1, 2),
cp AS (SELECT p, count(*) AS cp FROM inst GROUP BY 1),
uni AS (SELECT w, count(*) AS cu FROM
        (SELECT unnest({_TOKS}) AS w FROM documents) GROUP BY 1),
tot AS (SELECT CAST(sum(cu) AS BIGINT) AS c_total FROM uni)
SELECT inst.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln(0.9 * cb / cp + 0.1 * cu / c_total)), 6)
           AS avg_logprob
FROM inst JOIN bg USING (p, c) JOIN cp USING (p)
     JOIN uni ON uni.w = inst.c CROSS JOIN tot
GROUP BY 1""",
        "gopher_signals": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents
              WHERE len({_TOKS}) > 0),
tfc AS (SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(ts) AS w FROM toks) GROUP BY 1, 2),
top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_tf,
               CAST(sum(c) AS BIGINT) AS n FROM tfc GROUP BY 1)
SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
       round(top_tf / CAST(n AS DOUBLE), 6) AS top_token_frac,
       round(CASE WHEN len(ts) >= 2 THEN
             1.0 - len(list_distinct(list_transform(
                       range(1, len(ts)),
                       i -> ts[i] || ' ' || ts[i+1])))
                   / CAST(len(ts) - 1 AS DOUBLE)
             ELSE 0.0 END, 6) AS dup_bigram_frac,
       round(len(list_filter(ts, x -> regexp_matches(x, '^[0-9]+$')))
             / CAST(len(ts) AS DOUBLE), 6) AS frac_numeric
FROM toks JOIN top USING (doc_id)""",
        # PII scrub: same frozen RE2-subset patterns; DuckDB needs the
        # explicit 'g' flag (Spark regexp_replace is global by default)
        "pii_scrub": f"""
WITH d AS (SELECT doc_id, {_PII_TEXT_SQL} AS s FROM documents),
c1 AS (SELECT doc_id,
              CAST(len(regexp_extract_all(s, '{PII_EMAIL_RE}'))
                   AS BIGINT) AS n_emails,
              regexp_replace(s, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS s
       FROM d),
c2 AS (SELECT doc_id, n_emails,
              CAST(len(regexp_extract_all(s, '{PII_IP_RE}'))
                   AS BIGINT) AS n_ips,
              regexp_replace(s, '{PII_IP_RE}', '<IP>', 'g') AS s
       FROM c1)
SELECT doc_id, n_emails, n_ips,
       CAST(len(regexp_extract_all(s, '{PII_PHONE_RE}'))
            AS BIGINT) AS n_phones,
       regexp_replace(s, '{PII_PHONE_RE}', '<PHONE>', 'g')
           AS clean_text
FROM c2""",
        # URL canonicalizer: the same frozen regex pipeline as SQL text
        "url_canonicalize": f"""
WITH u AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents)
SELECT doc_id, {canonicalize_url_sql('url')} AS canon_url FROM u""",
        "dedup_url_keep_first": f"""
WITH u AS (SELECT doc_id, {_PLAIN_URL_SQL} AS url FROM documents),
c AS (SELECT doc_id, {canonicalize_url_sql('url')} AS canon_url
      FROM u),
r AS (SELECT doc_id, canon_url,
             row_number() OVER (PARTITION BY canon_url
                                ORDER BY doc_id) AS rn FROM c)
SELECT doc_id, canon_url FROM r WHERE rn = 1""",
        "domain_caps": f"""
WITH u AS (SELECT doc_id, {_PLAIN_URL_SQL} AS url FROM documents),
c AS (SELECT doc_id, {canonicalize_url_sql('url')} AS cu FROM u),
d AS (SELECT doc_id, {url_domain_sql('cu')} AS domain FROM c),
r AS (SELECT doc_id, domain,
             row_number() OVER (PARTITION BY domain
                                ORDER BY doc_id) AS rn FROM d)
SELECT doc_id, domain FROM r WHERE rn <= 3""",
        # C4-style boilerplate-line removal: normalized-line doc
        # frequency >= 50 -> line deleted everywhere; ''-normalizing
        # (blank/indent) lines never count. Same normalization text
        # (lower + trim) as pipeline/boilerplate.py
        "line_dedup": f"""
WITH ml AS (SELECT doc_id, {_ML_TEXT_SQL} AS text FROM documents),
keys AS (SELECT DISTINCT doc_id,
                unnest(list_transform(string_split(text, chr(10)),
                                      x -> lower(trim(x)))) AS k
         FROM ml),
boiler AS (SELECT k FROM keys WHERE k <> ''
           GROUP BY k HAVING count(*) >= 50),
bl AS (SELECT coalesce(list(k), []) AS ks FROM boiler)
SELECT ml.doc_id,
       array_to_string(list_filter(string_split(text, chr(10)),
           x -> NOT list_contains(bl.ks, lower(trim(x)))), chr(10))
           AS text_clean,
       CAST(len(string_split(text, chr(10)))
            - len(list_filter(string_split(text, chr(10)),
                  x -> NOT list_contains(bl.ks, lower(trim(x)))))
            AS BIGINT) AS n_removed
FROM ml, bl""",
        # sequence-packing plan: global running token offset in doc_id
        # order, 256-token windows; all-BIGINT arithmetic (// is DuckDB
        # integer division = Spark DIV); greatest(n,1) routes empty docs
        "pack_windows": f"""
WITH t AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum FROM t)
SELECT doc_id, n_tokens, cum - n_tokens AS start_tok,
       (cum - n_tokens) // 256 AS first_window,
       (cum - n_tokens + greatest(n_tokens, 1) - 1) // 256
           AS last_window,
       (cum - n_tokens + greatest(n_tokens, 1) - 1) // 256
           - (cum - n_tokens) // 256 + 1 AS n_windows
FROM c""",
        # assembled packing windows: zip-unnest gives per-token global
        # positions; per-window fingerprint over the pos-ordered slice
        "pack_materialize": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
c AS (SELECT doc_id, ts,
      CAST(sum(len(ts)) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS BIGINT) - len(ts) AS start_tok
      FROM t),
g AS (SELECT doc_id, unnest(ts) AS term,
             start_tok + unnest(range(len(ts))) AS pos FROM c)
SELECT pos // 256 AS window_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       md5(string_agg(term, ' ' ORDER BY pos)) AS fp
FROM g GROUP BY 1""",
        # end-to-end curation composite: the same stage CTE chain as
        # pipeline/curate.py (filter -> dedup keep-first -> hash split)
        "curation_pipeline": f"""
WITH q AS (SELECT doc_id, text FROM documents
  WHERE len({_TOKS}) >= 20
    AND (len(list_distinct({_TOKS})) * 1.0 / len({_TOKS})) >= 0.3
    AND (list_aggregate(list_transform({_TOKS}, x -> length(x)),
         'sum') * 1.0 / len({_TOKS})) <= 12.0),
d AS (SELECT doc_id, text FROM q
      WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY md5(text))),
s AS (SELECT doc_id, text,
      CASE WHEN {hash_key_sql('doc_id')} % 100 < 98 THEN 'train'
           WHEN {hash_key_sql('doc_id')} % 100 < 99 THEN 'val'
           ELSE 'test' END AS split FROM d)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
FROM s GROUP BY 1""",
        # decontamination: portable token-hash (base 257) + rolling
        # 8-gram hash (base 263), both mod 2^31-1 — bit-identical to
        # the Arrow kernel (pipeline/contamination.py)
        "contamination_8gram": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
th AS (SELECT doc_id,
              list_transform(ts, t -> list_reduce(
                  list_transform(regexp_extract_all(t, '.'),
                                 c -> CAST(unicode(c) AS BIGINT)),
                  (a, b) -> (a * 257 + b) % 2147483647)) AS ths
       FROM toks WHERE len(ts) >= 8),
gh AS (SELECT doc_id,
              unnest(list_distinct(list_transform(
                  range(1, len(ths) - 6),
                  i -> list_reduce(list_slice(ths, i, i + 7),
                       (a, b) -> (a * 263 + b) % 2147483647)))) AS gh
       FROM th),
bench AS (SELECT DISTINCT gh FROM gh WHERE doc_id % 89 = 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM gh JOIN bench USING (gh) GROUP BY 1""",
        # BM25F: title = first 8 tokens (w=2.5), body = rest (w=1.0);
        # per-field length norms BEFORE the shared saturation, idf over
        # any-field df — the same expression text as sqlpath.bm25f
        "bm25f_title_body_top10": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
fl AS (SELECT doc_id, list_slice(ts, 1, 8) AS t_toks,
              list_slice(ts, 9, len(ts)) AS b_toks FROM base),
st AS (SELECT count(*) AS n_docs, avg(len(t_toks)) AS avg_t,
              avg(len(b_toks)) AS avg_b FROM fl),
tfield AS (SELECT doc_id, unnest(t_toks) AS term, 't' AS fld FROM fl
           UNION ALL
           SELECT doc_id, unnest(b_toks) AS term, 'b' AS fld FROM fl),
q AS (SELECT unnest(['hash', 'join', 'merge']) AS term),
qt AS (SELECT tfield.* FROM tfield JOIN q USING (term)),
tf AS (SELECT doc_id, fld, term, count(*) AS tf FROM qt
       GROUP BY 1, 2, 3),
dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
lens AS (SELECT doc_id, len(t_toks) AS l_t, len(b_toks) AS l_b
         FROM fl),
wtf AS (SELECT doc_id, term,
               sum(CASE WHEN fld = 't'
                   THEN 2.5 * tf / (1.0 - {BM25_B} + {BM25_B}
                                    * l_t / avg_t)
                   ELSE 1.0 * tf / (1.0 - {BM25_B} + {BM25_B}
                                    * l_b / avg_b) END) AS wtf
        FROM tf JOIN lens USING (doc_id) CROSS JOIN st GROUP BY 1, 2),
sc AS (SELECT doc_id,
              sum(ln(1 + (st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                  * wtf / ({BM25_K1} + wtf)) AS s
       FROM wtf JOIN dfq USING (term) CROSS JOIN st GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT 10""",
        # regex rewrite: anchored lexicon match, (df DESC, term) cap,
        # then the standard BM25 disjunction
        "index_regex_wand_top10": f"""
WITH tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (SELECT term FROM (
        SELECT term FROM ts
        WHERE regexp_matches(term, '^((va|cu)[a-z]{{2,}})$')
        ORDER BY df DESC, term LIMIT 32)),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - ts.df + 0.5) / (ts.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN ts USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT 10""",
        # boolean DNF: per-clause conjunctive BM25 (+ NOT) over the
        # FULL clause match sets, max-merged — equals the engine's
        # per-clause top-k merge (max commutes with monotone round)
        "index_boolean_top10": f"""
WITH u AS (
  SELECT doc_id, score FROM (
    {_bm25_sql('hash join', 1000000, conjunctive=True)}) c1
  UNION ALL
  SELECT doc_id, score FROM (
    {_bm25_sql('merge', 1000000, conjunctive=True,
               not_terms=['window'])}) c2)
SELECT doc_id, max(score) AS score FROM u GROUP BY 1
ORDER BY score DESC, doc_id LIMIT 10""",
        # numeric-range facets: bucket = count of boundaries <= x (the
        # same CASE-sum expression the engine compiles)
        "facet_range_nchars": f"""
WITH tf AS ({_TF}),
m AS (SELECT DISTINCT doc_id FROM tf
      WHERE term IN ('spark', 'window')),
b AS (SELECT doc_id,
             CAST((CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars >= 800 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bucket
      FROM documents),
g AS (SELECT bucket, count(*) AS n_docs FROM m JOIN b USING (doc_id)
      GROUP BY 1)
SELECT bucket,
       CASE bucket WHEN 0 THEN CAST('-infinity' AS DOUBLE)
            WHEN 1 THEN 200.0 WHEN 2 THEN 400.0 ELSE 800.0 END AS lo,
       CASE bucket WHEN 0 THEN 200.0 WHEN 1 THEN 400.0
            WHEN 2 THEN 800.0
            ELSE CAST('infinity' AS DOUBLE) END AS hi,
       n_docs
FROM g ORDER BY bucket""",
        # cross-corpus dedup: the combined UNION view makes the shared
        # minhash CTE chain produce exactly the cross-side pairs (a
        # signature is a pure per-doc function, so old<100000 /
        # new>=100000 filtering recovers the two-corpus join)
        "cross_dedup_pairs": f"""
WITH combined AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
  WHERE doc_id < 300),
{_minhash_ctes(src='combined')}
SELECT doc_b AS new_id, doc_a AS old_id,
       round(CAST(inter AS DOUBLE)/(na+nb-inter), 6) AS jac
FROM v
WHERE doc_a < 100000 AND doc_b >= 100000
  AND round(CAST(inter AS DOUBLE)/(na+nb-inter), 6) >= 0.5
ORDER BY new_id, old_id""",
        # unordered NEAR: occurrence-pair window check per doc (the
        # positions artifact stores 0-based token indexes from the
        # same frozen tokenizer), BM25 over both terms on matches
        "index_near_top10": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
occ0 AS (SELECT doc_id,
                unnest(list_transform(range(1, len(ts) + 1),
                    i -> struct_pack(
                        pos := CAST(i - 1 AS BIGINT),
                        term := ts[CAST(i AS INT)]))) AS o
         FROM toks),
occ AS (SELECT doc_id, o.pos AS pos, o.term AS term FROM occ0),
a AS (SELECT doc_id, pos FROM occ WHERE term = 'spark'),
b AS (SELECT doc_id, pos FROM occ WHERE term = 'window'),
m AS (SELECT doc_id, count(*) AS near_tf FROM (
        SELECT DISTINCT b.doc_id, b.pos
        FROM b JOIN a USING (doc_id)
        WHERE abs(a.pos - b.pos) <= 5) q GROUP BY 1),
tf AS ({_TF}),
dl AS ({_DL}),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tstat AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - tstat.df + 0.5) / (tstat.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN tstat USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE term IN ('spark', 'window')
  GROUP BY 1)
SELECT m.doc_id, near_tf, round(s, 6) AS score
FROM m JOIN sc ON sc.doc_id = m.doc_id
ORDER BY score DESC, m.doc_id LIMIT 10""",
        # analyzer chain: the whole stopword+S-stem projection in SQL
        # (functions/analyze.s_stem_sql), query terms pre-analyzed in
        # python by the same scalar chain
        "index_stemmed_top10": f"""
WITH toks AS (SELECT doc_id,
    list_transform(list_filter({_TOKS},
        x -> x NOT IN ({_SW_SQL})),
        t -> {s_stem_sql('t')}) AS ts
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
       GROUP BY 1, 2),
dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tstat AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {_values(sorted(set(
    analyze_query('tables queries the').split())))}),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (st.n_docs - tstat.df + 0.5) / (tstat.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                        * dl.dl / st.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN tstat USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT 10""",
        # collocations: adjacent-pair PMI; same division text in both
        # engines (BIGINT / BIGINT -> DOUBLE), so floats match exactly
        "bigram_pmi": f"""
WITH toks AS (SELECT {_TOKS} AS ts FROM documents
              WHERE len({_TOKS}) > 0),
uc AS (SELECT w, count(*) AS n_w
       FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY 1),
nt AS (SELECT sum(n_w) AS n_toks FROM uc),
bp AS (SELECT unnest(list_transform(range(1, len(ts)),
               i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS p
       FROM toks WHERE len(ts) >= 2),
pc AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS n_pair
       FROM bp GROUP BY 1, 2 HAVING count(*) >= 5),
np AS (SELECT sum(len(ts) - 1) AS n_pairs FROM toks
       WHERE len(ts) >= 2)
SELECT pc.w1, pc.w2, pc.n_pair,
       round(ln((pc.n_pair / np.n_pairs)
                / ((u1.n_w / nt.n_toks) * (u2.n_w / nt.n_toks))), 6)
           AS pmi
FROM pc JOIN uc u1 ON u1.w = pc.w1 JOIN uc u2 ON u2.w = pc.w2
CROSS JOIN np CROSS JOIN nt""",
        "quality_filter": f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE len({_TOKS}) >= 20
  AND (len(list_distinct({_TOKS})) * 1.0 / len({_TOKS})) >= 0.3
  AND (list_aggregate(list_transform({_TOKS}, x -> length(x)), 'sum')
       * 1.0 / len({_TOKS})) <= 12.0""",
        # the gate corpus is pure ASCII (verified: octet_length ==
        # length for every row), so VARCHAR substr/md5 are byte-exact
        # stand-ins for the kernel's byte slicing
        "bpe_token_counts": r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws,
  CAST(len(list_filter(regexp_extract_all(lower(text),
    '''(s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9\s]+|\s+'),
    x -> NOT regexp_matches(x, '^\s+$'))) AS BIGINT) AS n_bpe
FROM documents""",
        "sample_frames": """
WITH m AS (SELECT doc_id, text, length(text) AS ln FROM documents),
i AS (SELECT unnest([0, 1, 2, 3]) AS fi)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
       CAST((ln * (fi + 1)) // 4 - (ln * fi) // 4 AS BIGINT)
           AS n_frame_bytes,
       md5(substr(text, (ln * fi) // 4 + 1,
                  (ln * (fi + 1)) // 4 - (ln * fi) // 4))
           AS frame_digest
FROM m CROSS JOIN i""",
        "resize_images": """
SELECT doc_id, CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
       md5(text || '64x64') AS resized_digest FROM documents""",
    }
