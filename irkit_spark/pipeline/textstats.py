"""Text-analysis operators for a training-data pipeline: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All JVM-side (built-in pyspark.sql.functions only — whole-stage codegen,
no Python in the hot path); each has an exact DuckDB-SQL oracle in
__spark_entry__.py. Frozen constants here mirror the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE

# Frozen per-language stopword lists (heuristic lang-id; deterministic).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "en"],
}
QUALITY_STOPWORDS = STOPWORDS["en"]


def _toks(text_col="text"):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_unique, n_chars_text): BPE-ish regex token
    count + distinct count + raw char length."""
    t = _toks()
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_unique"),
        F.length("text").cast("long").alias("n_chars_text"))


# GPT-2-style pre-tokenizer regex (public BPE pre-tokenization shape:
# contraction suffixes, space-prefixed letter/digit runs, punctuation
# runs, whitespace). Written in the Java-regex / RE2 common subset so
# Spark and the DuckDB oracle match byte-for-byte.
BPE_RE = r"'(s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9\s]+|\s+"


def bpe_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws, n_bpe): whitespace-split count + BPE-ish
    pre-tokenizer match count (whitespace runs excluded) — the two
    token-budget estimators a training pipeline actually uses."""
    # count \S+ runs directly: the trim()+split form undercounts pure-
    # space docs to 1 and miscounts docs padded with \t/\n (trim strips
    # ASCII spaces only)
    n_ws = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    m = F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), 0)
    # a whitespace test, not trim(): trim strips ASCII space only, so a
    # pure newline/tab run matched by \s+ would survive a trim filter
    # and be miscounted as a BPE token
    n_bpe = F.size(F.filter(m, lambda x: ~x.rlike(r"^\s+$")))
    return docs.select("doc_id",
                       n_ws.cast("long").alias("n_ws"),
                       n_bpe.cast("long").alias("n_bpe"))


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, uniq_ratio, mean_tok_len):
    cheap quality heuristics (length / stopword / repetition ratios)."""
    t = _toks()
    stops = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n = F.size(t).cast("double")
    stop_cnt = F.size(F.filter(t, lambda x: F.array_contains(stops, x)))
    tok_chars = F.aggregate(t, F.lit(0).cast("long"),
                            lambda acc, x: acc + F.length(x))
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.round(F.when(n > 0, stop_cnt / n).otherwise(0.0), 6)
        .alias("stop_ratio"),
        F.round(F.when(n > 0, F.size(F.array_distinct(t)) / n)
                .otherwise(0.0), 6).alias("uniq_ratio"),
        F.round(F.when(n > 0, tok_chars / n).otherwise(0.0), 6)
        .alias("mean_tok_len"))


def quality_filter(docs: DataFrame, min_tokens: int = 20,
                   min_uniq_ratio: float = 0.3,
                   max_mean_tok_len: float = 12.0) -> DataFrame:
    """The applied form of quality scoring: keep docs passing the
    length / repetition / gibberish thresholds — the cleaning pass a
    training pipeline actually runs. One codegen'd scan, no shuffle."""
    t = _toks()
    n = F.size(t).cast("double")
    uniq_ratio = F.when(n > 0, F.size(F.array_distinct(t)) / n) \
        .otherwise(0.0)
    tok_chars = F.aggregate(t, F.lit(0).cast("long"),
                            lambda acc, x: acc + F.length(x))
    mean_len = F.when(n > 0, tok_chars / n).otherwise(0.0)
    return docs.filter((n >= min_tokens)
                       & (uniq_ratio >= min_uniq_ratio)
                       & (mean_len <= max_mean_tok_len))


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred): argmax of per-language stopword hits, frozen
    priority en>de>fr>es on ties, 'und' when no list scores > 0."""
    t = _toks()
    hits = {}
    for lg, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lg] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    best = F.greatest(*[hits[lg] for lg in ["en", "de", "fr", "es"]])
    pred = (F.when(best == 0, "und")
            .when(hits["en"] == best, "en")
            .when(hits["de"] == best, "de")
            .when(hits["fr"] == best, "fr")
            .otherwise("es"))
    return docs.select("doc_id", pred.alias("lang_pred"))


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 over the sorted distinct token set — an
    order-insensitive document fingerprint (bag-of-words identity)."""
    t = _toks()
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t))))
        .alias("fp"))


def winnow_fingerprints(docs: DataFrame, k: int = 8,
                        w: int = 4) -> DataFrame:
    """(doc_id, fp): winnowed rolling-hash fingerprints (the MOSS
    scheme): Karp-Rabin hash over every character k-gram of the
    lowercased text, then keep the minimum of each window of w
    consecutive hashes, deduped. Guarantees: identical docs share the
    full set; any shared substring of length >= k + w - 1 shares at
    least one fingerprint. Joining on fp is the standard local-overlap
    dedup blocking key at corpus scale (one groupBy, no pair blowup).

    The k-gram hash is a PORTABLE double Karp-Rabin over Unicode code
    points — two independent 31-bit polynomial hashes (bases 257/263,
    both mod the Mersenne prime 2^31-1) packed as fp = h1*2^31 + h2:
    every intermediate product fits a signed 64-bit integer, so the
    exact same arithmetic runs in any SQL engine (the DuckDB oracle in
    __spark_entry__ reproduces it bit-for-bit), while the packed
    62-bit key keeps the blocking-collision rate web-scale-safe."""
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    P = 2147483647              # 2^31 - 1
    B1, B2 = 257, 263

    def run(batches):
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # utf-32-le buffer -> one uint32 code point per char,
                # no per-char Python loop
                c = np.frombuffer((text or "").lower()
                                  .encode("utf-32-le"),
                                  dtype=np.uint32).astype(np.int64)
                if c.size < k:
                    continue
                nw = c.size - k + 1
                h1 = np.zeros(nw, dtype=np.int64)
                h2 = np.zeros(nw, dtype=np.int64)
                for j in range(k):      # k vectorized passes
                    h1 = (h1 * B1 + c[j:j + nw]) % P
                    h2 = (h2 * B2 + c[j:j + nw]) % P
                hs = h1 * (P + 1) + h2          # pack: h1*2^31 + h2
                if hs.size >= w:
                    sel = sliding_window_view(hs, w).min(axis=1)
                else:
                    sel = hs.min(keepdims=True)
                u = np.unique(sel)
                ids.extend([doc_id] * u.size)
                fps.extend(u.tolist())
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "fp": pd.Series(fps, dtype="int64")})

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, fp long")


def lm_quality(docs: DataFrame,
               broadcast_vocab_max: int = 2_000_000) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob): mean per-token log-probability
    under the corpus unigram LM, ln(cf_w / C) averaged over token
    instances — the CCNet-style LM quality signal (fluent text scores
    higher than gibberish/rare-token soup) in its engine-portable
    unigram form.

    Scale shape: per-doc tf (one groupBy bounded by distinct (doc,
    term) pairs), one vocab-sized unigram aggregate joined back —
    broadcast below `broadcast_vocab_max` distinct terms, shuffle
    hash join on term above it — then one groupBy(doc). The division
    text cf / C is BIGINT/BIGINT -> DOUBLE in both engines, so the
    DuckDB oracle reproduces the floats exactly."""
    t = _toks()
    toks = docs.select("doc_id", F.explode(t).alias("w"))
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    # unigram counts straight off the token stream (NOT off tf): the
    # tf subtree would be recomputed per consumer without a persist,
    # and groupBy(w) with map-side partial aggregation is the cheaper
    # aggregate anyway
    uni = toks.groupBy("w").agg(F.count("*").alias("cf"))
    # scalar stats collected once (the sqlpath stat-frame pattern): a
    # crossJoin'd 1-row frame would recompute the uni subtree
    st = uni.agg(F.count("*").alias("v"),
                 F.sum("cf").alias("c")).collect()[0]
    c_total = int(st["c"] or 0)
    u = F.broadcast(uni) if int(st["v"]) <= broadcast_vocab_max else uni
    return (tf.join(u, "w")
            .groupBy("doc_id")
            .agg(F.sum("tf").cast("long").alias("n_tokens"),
                 F.round(
                     F.sum(F.col("tf")
                           * F.log(F.col("cf") / F.lit(c_total)))
                     / F.sum("tf"), 6).alias("avg_logprob")))


def lm_quality_bigram(docs: DataFrame, lam: float = 0.9,
                      backoff: float = 0.1,
                      broadcast_vocab_max: int = 2_000_000) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob): mean per-transition
    log-probability under an INTERPOLATED BIGRAM corpus LM —

        ln(lam * c(p,c)/c(p·) + backoff * c(c)/C)

    averaged over a doc's token transitions (p = previous token, c =
    current; c(p·) = p's prefix count over all transitions, so the
    conditional sums to 1; the unigram backoff term is what keeps a
    never-seen-in-context token finite). One CCNet-perplexity step up
    from lm_quality's unigram form: word-salad with plausible unigrams
    but implausible transitions now scores low. lam/backoff are passed
    separately rather than (lam, 1-lam) so the oracle literal 0.1 is
    the exact double the engine uses (1.0 - 0.9 != 0.1 in binary).
    Docs with fewer than two tokens drop out (no transitions).

    Scale shape: transition instances explode to coll_len rows once;
    bigram/prefix counts are two map-side-combining groupBys; the
    unigram and prefix tables broadcast below `broadcast_vocab_max`
    distinct terms, the bigram join stays a shuffle hash join on
    (p, c) (its key space is too wide to assume broadcastable — AQE
    converts it when small). Division/log expression text matches the
    DuckDB oracle, round(6) absorbs sum-order ulps."""
    t = _toks()
    base = (docs.select("doc_id", t.alias("ts"))
            .filter(F.size("ts") >= 2))
    inst = base.select(
        "doc_id",
        F.explode(F.arrays_zip(
            F.slice("ts", 1, F.size("ts") - 1).alias("p"),
            F.slice("ts", 2, F.size("ts") - 1).alias("c"))).alias("b")
    ).select("doc_id", F.col("b.p").alias("p"), F.col("b.c").alias("c"))
    bg = inst.groupBy("p", "c").agg(F.count("*").alias("cb"))
    cp = inst.groupBy("p").agg(F.count("*").alias("cp"))
    uni = (docs.select(F.explode(t).alias("w"))
           .groupBy("w").agg(F.count("*").alias("cu")))
    st = uni.agg(F.count("*").alias("v"),
                 F.sum("cu").alias("ct")).collect()[0]
    c_total = int(st["ct"] or 0)
    small = int(st["v"]) <= broadcast_vocab_max
    cp_j = F.broadcast(cp) if small else cp
    uni_j = uni.withColumnRenamed("w", "c").withColumnRenamed("cu",
                                                              "cu_c")
    uni_j = F.broadcast(uni_j) if small else uni_j
    return (inst.join(bg, ["p", "c"]).join(cp_j, "p").join(uni_j, "c")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.round(F.avg(F.log(
                     F.lit(lam) * F.col("cb") / F.col("cp")
                     + F.lit(backoff) * F.col("cu_c")
                     / F.lit(c_total))), 6).alias("avg_logprob")))


def top_terms(docs: DataFrame, m: int = 5,
              broadcast_vocab_max: int = 2_000_000) -> DataFrame:
    """(doc_id, rank, term, tfidf): the m highest-TF-IDF terms per doc
    — keyword extraction for routing/clustering/faceting a corpus.
    tfidf = tf * ln((1 + n_docs) / (1 + df)) with the +1 smoothing
    that keeps a df == n_docs term finite and non-negative; rank is
    1-based by (tfidf desc, term asc).

    Determinism across engines: selection and rank order use the
    ROUNDED score (round 6) — ln() can differ by ulps between libm
    implementations, and an unrounded ORDER BY would let two
    near-equal terms swap between Spark and the DuckDB oracle; after
    round(6) the values agree exactly and term asc breaks residual
    ties.

    Scale shape: one explode + (doc, term) groupBy for tf, one term
    groupBy for df (broadcast back below `broadcast_vocab_max`
    distinct terms), then a row_number window partitioned by doc_id —
    per-doc state only, no global sort."""
    from pyspark.sql import Window
    t = _toks()
    tf = (docs.select("doc_id", F.explode(t).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    st = df.agg(F.count("*").alias("v")).collect()[0]
    n_docs = docs.count()
    df_j = F.broadcast(df) if int(st["v"]) <= broadcast_vocab_max else df
    sc = (tf.join(df_j, "term")
          .select("doc_id", "term",
                  F.round(F.col("tf") * F.log(
                      F.lit(float(1 + n_docs)) / (F.col("df") + 1)),
                      6).alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"),
                                             F.asc("term"))
    return (sc.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= m)
            .select("doc_id", "rank", "term", "tfidf"))


def gopher_signals(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, top_token_frac, dup_bigram_frac,
    frac_numeric): the Gopher/MassiveText repetition + symbol signals
    a pretraining filter thresholds on.

      top_token_frac  — share of the most frequent token (repetition)
      dup_bigram_frac — 1 - distinct_bigrams / total_bigrams
      frac_numeric    — share of all-digit tokens

    dup_bigram_frac and frac_numeric are per-doc JVM array ops (no
    shuffle); top_token_frac needs the per-(doc, term) count, one
    groupBy — the same shape as term_freqs. Empty docs are dropped
    (no tokens -> no signals), matching the oracle."""
    t = _toks()
    base = (docs.select("doc_id", t.alias("ts"))
            .filter(F.size("ts") > 0))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("ts") - 2),
        lambda i: F.concat_ws(" ",
                              F.element_at("ts", i + 1),
                              F.element_at("ts", i + 2)))
    per_doc = base.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        F.round(F.when(
            F.size("ts") >= 2,
            1.0 - F.size(F.array_distinct(bigrams))
            / (F.size("ts") - 1).cast("double")).otherwise(0.0), 6)
        .alias("dup_bigram_frac"),
        F.round(F.size(F.filter(F.col("ts"),
                                lambda x: x.rlike("^[0-9]+$")))
                / F.size("ts").cast("double"), 6)
        .alias("frac_numeric"))
    top = (base.select("doc_id", F.explode("ts").alias("w"))
           .groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
           .groupBy("doc_id")
           .agg(F.max("tf").alias("top_tf"),
                F.sum("tf").alias("n")))
    topf = top.select(
        "doc_id",
        F.round(F.col("top_tf") / F.col("n").cast("double"), 6)
        .alias("top_token_frac"))
    return (per_doc.join(topf, "doc_id")
            .select("doc_id", "n_tokens", "top_token_frac",
                    "dup_bigram_frac", "frac_numeric"))


# PII patterns, frozen in the RE2 / Java-regex common subset so Spark
# and the DuckDB oracle match byte-for-byte (no lookaround, no \b).
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IP_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
PII_PHONE_RE = r"\+[0-9][0-9 ()-]{6,}[0-9]"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, clean_text): count and
    redact emails / IPv4s / international-format phone numbers —
    the privacy pass a published training corpus runs. Redaction
    order is frozen (email, ip, phone) since the patterns can nest.
    One codegen'd projection; no UDF, no shuffle."""
    s = F.lower(F.col(text_col))
    n_email = F.size(F.regexp_extract_all(s, F.lit(PII_EMAIL_RE), 0))
    c1 = F.regexp_replace(s, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(c1, F.lit(PII_IP_RE), 0))
    c2 = F.regexp_replace(c1, PII_IP_RE, "<IP>")
    n_phone = F.size(F.regexp_extract_all(c2, F.lit(PII_PHONE_RE), 0))
    c3 = F.regexp_replace(c2, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        n_phone.cast("long").alias("n_phones"),
        c3.alias("clean_text"))


def bigram_pmi(docs: DataFrame, min_count: int = 5,
               round_dp: int = 6) -> DataFrame:
    """(w1, w2, n_pair, pmi): corpus collocations — pointwise mutual
    information over adjacent token pairs,

        pmi = ln( (n_pair / N_pairs) / ((n_w1 / N_toks) * (n_w2 / N_toks)) )

    with n_pair >= min_count (the standard low-count PMI guard: a
    hapax pair otherwise maxes the statistic). The phrase-mining /
    tokenizer-vocabulary primitive of a training-data pipeline.

    Scale shape: bigrams are generated JVM-side (one slide over each
    doc's token array — no Python, no per-doc explode before the
    count), then ONE groupBy per relation: pair counts (shuffle bounded
    by distinct-pair count), unigram counts (vocab-sized). The two
    totals are 1-row frames cross-joined in (the sqlpath stat-frame
    pattern); unigram counts join back broadcast when they fit. The
    division text `a / b` is integer-free in both engines, so the
    DuckDB oracle reproduces the floats exactly."""
    t = _toks()
    toks = docs.select(t.alias("ts")).filter(F.size("ts") > 0)
    uni = (toks.select(F.explode("ts").alias("w"))
           .groupBy("w").agg(F.count("*").alias("n_w")))
    n_toks = uni.agg(F.sum("n_w").alias("n_toks"))
    pairs = (toks.filter(F.size("ts") >= 2)
             .select(F.explode(F.transform(
                 F.sequence(F.lit(0), F.size("ts") - 2),
                 lambda i: F.struct(
                     F.element_at("ts", i + 1).alias("w1"),
                     F.element_at("ts", i + 2).alias("w2"))))
                 .alias("p"))
             .select("p.w1", "p.w2")
             .groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
             .filter(F.col("n_pair") >= min_count))
    # PMI normalizes by the TOTAL bigram count (not the kept sum)
    n_pairs = (toks.filter(F.size("ts") >= 2)
               .agg(F.sum(F.size("ts") - 1).alias("n_pairs")))
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    return (pairs.join(u1, "w1").join(u2, "w2")
            .crossJoin(n_pairs).crossJoin(n_toks)
            .select(
                "w1", "w2", "n_pair",
                F.round(F.log(
                    (F.col("n_pair") / F.col("n_pairs"))
                    / ((F.col("n_w1") / F.col("n_toks"))
                       * (F.col("n_w2") / F.col("n_toks")))),
                    round_dp).alias("pmi")))
