"""Deduplication operators: exact, token-Jaccard, trigram-shingle
Jaccard, MinHash+LSH, SimHash.

Scale design: the exact/Jaccard forms are the *oracle-checkable* small
paths; MinHash-LSH and SimHash are the 100 TB paths — candidate
generation is a band-bucket groupBy (shuffle bounded by #buckets, never
the O(n^2) pair space), followed by exact verification of candidates
only. All signature math is numpy inside mapInPandas (Arrow-batched).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.config import TOKEN_RE

# ---- frozen minhash/simhash parameters ---------------------------------
N_PERM = 128
N_BANDS = 16            # 16 bands x 8 rows
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(42)
# these draws are retired (the pre-round-4 61-bit permutation
# constants) but MUST stay: they position the shared _rng stream so the
# frozen _MH_A/_MH_B values below stay frozen
_A = _rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)

# FROZEN hashes (re-frozen round 4): ALL text-dedup tiers — MinHash
# (token -> shingle -> signature -> band key) AND SimHash (62 bit
# planes via _kr_token_hashes62) — run on PORTABLE 31-bit Karp-Rabin
# arithmetic: polynomial over Unicode code points base 257 mod the
# Mersenne prime 2^31-1 for tokens, base-263 window fold for shingles,
# universal-hash permutations (a*h+b) mod 2^31-1, double folds packed
# to 62 bits. Every intermediate fits a signed 64-bit integer, so the
# DuckDB oracles in __spark_entry__ reproduce every pipeline
# bit-for-bit. 31-bit shingle hashes add ~n^2/2^31 per-doc collision
# mass to the exact-Jaccard verify — ~1e-2 for a 10^4-shingle doc,
# well under the verify threshold's resolution.
_KR_P = 2147483647              # 2^31 - 1
_KR_B1, _KR_B2 = 257, 263
_MH_A = _rng.integers(1, _KR_P, size=N_PERM, dtype=np.int64)
_MH_B = _rng.integers(0, _KR_P, size=N_PERM, dtype=np.int64)


def _kr_token_hashes(flat: np.ndarray, base: int = _KR_B1) -> np.ndarray:
    """Portable 31-bit Karp-Rabin token hash (see module constants).
    Vectorized in O(total chars): tokens are processed in length-sorted
    order, so the active set at char position j is a contiguous SUFFIX
    of the sorted batch — no per-position rescan of the whole batch (a
    single 50k-char blob token in a 200k-token batch would otherwise
    turn the position sweep into max_len full-batch mask passes,
    measured ~100x slower)."""
    if flat.size == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(t) for t in flat), dtype=np.int64,
                       count=flat.size)
    codes = np.frombuffer("".join(flat).encode("utf-32-le"),
                          dtype=np.uint32).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    order = np.argsort(lens, kind="stable")
    slens = lens[order]
    sstarts = starts[order]
    acc = np.zeros(flat.size, dtype=np.int64)
    for j in range(int(slens[-1]) if slens.size else 0):
        lo = int(np.searchsorted(slens, j, side="right"))
        idx = sstarts[lo:] + j
        acc[lo:] = (acc[lo:] * base + codes[idx]) % _KR_P
    out = np.empty_like(acc)
    out[order] = acc
    return out


def _kr_token_hashes62(flat: np.ndarray) -> np.ndarray:
    """62 portable bit planes per token — the SimHash bit source: two
    independent 31-bit Karp-Rabin hashes (bases 257/263) pushed through
    a NONLINEAR portable mix (squaring mod the Mersenne prime, plus the
    sibling hash as a cross term) and packed m1*2^31 + m2. Raw KR is
    linear, so lexicographically-near tokens correlate in the high bit
    planes and simhash buckets clump (a measured failure of the blocked
    scheme's spread test); (h^2 + other) mod p breaks that while every
    product stays < 2^62, so a SQL engine reproduces every bit."""
    h1 = _kr_token_hashes(flat, _KR_B1)
    h2 = _kr_token_hashes(flat, _KR_B2)
    m1 = (h1 * h1 + h2) % _KR_P
    m2 = (h2 * h2 + h1) % _KR_P
    return m1 * (_KR_P + 1) + m2


def _poly_windows_mod(th: np.ndarray, n: int,
                      base: int = _KR_B2) -> np.ndarray:
    """Portable length-n window fold of 31-bit hashes:
    acc = (acc*base + h) mod 2^31-1 over each window (docs shorter than
    n fold as one window of their full length)."""
    m = th.size
    w = min(n, m)
    nw = m - w + 1
    out = np.zeros(nw, dtype=np.int64)
    for k in range(w):
        out = (out * base + th[k:k + nw]) % _KR_P
    return out


def _toks(text_col="text"):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


# ------------------------------------------------------------ exact dedup

def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(h, rep_doc, n_copies): md5(text) groups; rep = min doc_id.
    Pure hash-groupBy — the one-shuffle exact dedup."""
    return (docs.select("doc_id", F.md5("text").alias("h"))
            .groupBy("h")
            .agg(F.min("doc_id").alias("rep_doc"),
                 F.count("*").alias("n_copies")))


def dedup_keep_first(docs: DataFrame) -> DataFrame:
    """The applied form of exact dedup: keep only each text's canonical
    (min doc_id) copy — the one-shuffle cleaning pass a training
    pipeline actually runs. Returns the full surviving rows."""
    reps = exact_dup_groups(docs).select(
        F.col("rep_doc").alias("doc_id"))
    return docs.join(reps, "doc_id", "left_semi")


# ------------------------------------------------- exact Jaccard (oracle)

_JACCARD_GUARD_ROWS = 100_000


def _guard_pair_scale(docs: DataFrame, op: str, max_rows: int | None):
    """The exact-Jaccard pair ops below join on shared tokens/shingles
    across the whole corpus — correct (they are the oracle forms) but
    quadratic in bucket sizes, so running one on a 100 TB table is a
    mistake the API should catch, not honor. Raise above `max_rows`
    docs and point to the banded-LSH path; max_rows=None opts out."""
    if max_rows is None:
        return
    n = docs.count()
    if n > max_rows:
        raise ValueError(
            f"{op} is the exact/oracle form (corpus-wide token "
            f"self-join) and was asked to run on {n} docs "
            f"(> max_rows={max_rows}). Use minhash_lsh_pairs (banded "
            f"candidates, candidate-local verify) at scale, or pass "
            f"max_rows=None to override.")


def token_jaccard_pairs(docs: DataFrame, block_col: str = "source",
                        threshold: float = 0.5,
                        max_rows: int | None = _JACCARD_GUARD_ROWS
                        ) -> DataFrame:
    """(doc_a, doc_b, jac): distinct-token Jaccard over pairs within a
    blocking column (at scale: block first, never all-pairs — see
    _guard_pair_scale; minhash_lsh_pairs is the 100 TB path)."""
    _guard_pair_scale(docs, "token_jaccard_pairs", max_rows)
    base = docs.select("doc_id", F.col(block_col).alias("blk"),
                       F.array_distinct(_toks()).alias("toks"))
    tok = base.select("doc_id", "blk", F.explode("toks").alias("term"))
    sizes = base.select("doc_id", F.size("toks").cast("long").alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (a.join(b, (F.col("a.term") == F.col("b.term"))
                    & (F.col("a.blk") == F.col("b.blk"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.withColumnRenamed("doc_id", "doc_a") \
              .withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b") \
              .withColumnRenamed("n", "nb")
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jac", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6))
            .filter(F.col("jac") >= threshold)
            .select("doc_a", "doc_b", "jac"))


def shingle_jaccard_pairs(docs: DataFrame, n: int = 3,
                          threshold: float = 0.1,
                          max_rows: int | None = _JACCARD_GUARD_ROWS
                          ) -> DataFrame:
    """(doc_a, doc_b, jac): n-gram (token shingle) Jaccard near-dup pairs.
    Pair candidates come from an equi-join on shared shingles, so only
    docs with >=1 common shingle ever meet (no cross join) — but the
    shared-shingle join is still corpus-wide (see _guard_pair_scale;
    minhash_lsh_pairs is the 100 TB path). Shingles are built with a
    sliding window over the token array (one codegen'd projection —
    no positional self-joins)."""
    _guard_pair_scale(docs, "shingle_jaccard_pairs", max_rows)
    base = docs.select("doc_id", _toks().alias("toks"))
    windows = F.when(
        F.size("toks") >= n,
        F.transform(F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                    lambda i: F.array_join(F.slice("toks", i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    sh = (base.select("doc_id",
                      F.explode(F.array_distinct(windows)).alias("sh")))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (l.join(r, (F.col("l.sh") == F.col("r.sh"))
                    & (F.col("l.doc_id") < F.col("r.doc_id")))
             .groupBy(F.col("l.doc_id").alias("doc_a"),
                      F.col("r.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.withColumnRenamed("doc_id", "doc_a") \
              .withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b") \
              .withColumnRenamed("n", "nb")
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jac", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6))
            .filter(F.col("jac") >= threshold)
            .select("doc_a", "doc_b", "jac"))


def containment_pairs(docs: DataFrame, n: int = 3,
                      threshold: float = 0.5,
                      max_rows: int | None = _JACCARD_GUARD_ROWS
                      ) -> DataFrame:
    """(doc_a, doc_b, c_ab, c_ba): ASYMMETRIC near-dup — shingle
    containment c_ab = |A∩B| / |A| (how much of A sits inside B),
    pairs kept when max(c_ab, c_ba) >= threshold, doc_a < doc_b.
    Catches subset duplicates (a short doc quoted whole inside a long
    one) that symmetric Jaccard structurally misses: J = inter /
    (na + nb - inter) -> 0 as nb grows even at c_ab = 1, which is also
    why MinHash-Jaccard LSH banding CANNOT serve as a candidate stage
    here — a contained doc's bands almost never collide with its
    container's. The sound candidate join is the shared-shingle
    equi-join below (only docs sharing >= 1 shingle ever meet; cost is
    sum of per-shingle df^2, so it stays behind the same guard as the
    exact-Jaccard forms; at corpus scale shed the head shingles first
    — boilerplate.remove_boilerplate — then containment's join cost
    collapses with them)."""
    _guard_pair_scale(docs, "containment_pairs", max_rows)
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    base = docs.select("doc_id", _toks().alias("toks"))
    windows = F.when(
        F.size("toks") >= n,
        F.transform(F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                    lambda i: F.array_join(F.slice("toks", i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    sh = (base.select("doc_id",
                      F.explode(F.array_distinct(windows)).alias("sh")))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (l.join(r, (F.col("l.sh") == F.col("r.sh"))
                    & (F.col("l.doc_id") < F.col("r.doc_id")))
             .groupBy(F.col("l.doc_id").alias("doc_a"),
                      F.col("r.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.withColumnRenamed("doc_id", "doc_a") \
              .withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b") \
              .withColumnRenamed("n", "nb")
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("c_ab", F.round(F.col("inter") / F.col("na"), 6))
            .withColumn("c_ba", F.round(F.col("inter") / F.col("nb"), 6))
            .filter(F.greatest("c_ab", "c_ba") >= threshold)
            .select("doc_a", "doc_b", "c_ab", "c_ba"))


# ------------------------------------------------------------ minhash-lsh

def _shingle_hash_rows(batches, n: int):
    """Per batch: tokenize once, hash tokens vectorized, window-fold to
    shingle hashes, unique per doc. Yields (doc_ids, [hash sets])."""
    import re
    token = re.compile(TOKEN_RE)
    for pdf in batches:
        tok_lists = [token.findall((t or "").lower())
                     for t in pdf["text"]]
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for t in tok_lists:
            if t:
                flat[pos:pos + len(t)] = t
                pos += len(t)
        th = _kr_token_hashes(flat)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        ids, sets = [], []
        for i, doc_id in enumerate(pdf["doc_id"]):
            sl = th[bounds[i]:bounds[i + 1]]
            if sl.size == 0:
                continue
            ids.append(doc_id)
            sets.append(np.unique(_poly_windows_mod(sl, n)))
        yield ids, sets


def shingle_hash_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shs array<long>, nsh): per-doc distinct shingle-hash
    set — the verification side-table for LSH (bounded by doc length,
    never by corpus size)."""

    def run(batches):
        for ids, sets in _shingle_hash_rows(batches, n):
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "shs": pd.Series([s.view(np.int64) for s in sets],
                                 dtype="object"),
                "nsh": pd.Series([s.size for s in sets], dtype="int64")})

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, shs array<long>, nsh long")


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, band, band_hash): N_PERM minhashes folded into N_BANDS
    band fingerprints — the LSH keys. Fully vectorized numpy per batch
    (token hash + window fold + permutation matmul + band fold)."""

    def run(batches):
        for ids, sets in _shingle_hash_rows(batches, n):
            if not ids:
                yield pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "band": pd.Series([], dtype="int32"),
                    "band_hash": pd.Series([], dtype="int64")})
                continue
            sigs = np.empty((len(ids), N_PERM), dtype=np.int64)
            for i, hs in enumerate(sets):
                # universal hashing: (a*h + b) mod 2^31-1, min per
                # permutation — a, h < 2^31 so a*h+b < 2^63 (portable)
                vals = (hs[None, :] * _MH_A[:, None]
                        + _MH_B[:, None]) % _KR_P
                sigs[i] = vals.min(axis=1)
            # fold each band's ROWS_PER_BAND minhashes into one 62-bit
            # key: double Karp-Rabin fold (bases 257/263 mod 2^31-1)
            # packed k1*2^31 + k2 — portable, collision rate ~2^-62
            bands = sigs.reshape(len(ids), N_BANDS, ROWS_PER_BAND)
            b1 = np.zeros((len(ids), N_BANDS), dtype=np.int64)
            b2 = np.zeros((len(ids), N_BANDS), dtype=np.int64)
            for r in range(ROWS_PER_BAND):
                b1 = (b1 * _KR_B1 + bands[:, :, r]) % _KR_P
                b2 = (b2 * _KR_B2 + bands[:, :, r]) % _KR_P
            bh = b1 * (_KR_P + 1) + b2
            yield pd.DataFrame({
                "doc_id": np.repeat(np.asarray(ids, dtype=np.int64),
                                    N_BANDS),
                "band": np.tile(np.arange(N_BANDS, dtype=np.int32),
                                len(ids)),
                "band_hash": bh.reshape(-1)})

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, band int, band_hash long")


def _signatures_from_sets(sets: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash) derived from a shingle_hash_sets
    frame — the same permutation + band fold minhash_signatures
    computes, but over the ALREADY-built per-doc hash sets, so the
    corpus is tokenized once when `sets` is materialized (round 7:
    minhash_lsh_pairs previously ran the tokenize+shingle kernel once
    for signatures and twice more for the two verify sides)."""

    def run(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            if ids.size == 0:
                yield pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "band": pd.Series([], dtype="int32"),
                    "band_hash": pd.Series([], dtype="int64")})
                continue
            sigs = np.empty((ids.size, N_PERM), dtype=np.int64)
            for i, hs in enumerate(pdf["shs"]):
                hs = np.asarray(hs, dtype=np.int64)
                vals = (hs[None, :] * _MH_A[:, None]
                        + _MH_B[:, None]) % _KR_P
                sigs[i] = vals.min(axis=1)
            bands = sigs.reshape(ids.size, N_BANDS, ROWS_PER_BAND)
            b1 = np.zeros((ids.size, N_BANDS), dtype=np.int64)
            b2 = np.zeros((ids.size, N_BANDS), dtype=np.int64)
            for r in range(ROWS_PER_BAND):
                b1 = (b1 * _KR_B1 + bands[:, :, r]) % _KR_P
                b2 = (b2 * _KR_B2 + bands[:, :, r]) % _KR_P
            bh = b1 * (_KR_P + 1) + b2
            yield pd.DataFrame({
                "doc_id": np.repeat(ids.astype(np.int64), N_BANDS),
                "band": np.tile(np.arange(N_BANDS, dtype=np.int32),
                                ids.size),
                "band_hash": bh.reshape(-1)})

    return sets.select("doc_id", "shs").mapInPandas(
        run, "doc_id long, band int, band_hash long")


def minhash_lsh_pairs(docs: DataFrame, n: int = 3,
                      verify_threshold: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jac): LSH candidates (same band bucket) verified
    with exact shingle Jaccard — candidate-local.

    The 100 TB shape end-to-end: candidate generation is an equi-join
    on (band, band_hash) — shuffle bounded by bucket sizes, never the
    O(n^2) pair space — and verification joins ONLY the candidate pairs
    against the per-doc shingle-hash sets (two hash joins on doc_a /
    doc_b) with exact Jaccard computed per pair JVM-side
    (array_intersect). No corpus-wide shingle self-join anywhere in
    the plan. The per-doc hash sets are localCheckpoint-materialized
    and signatures derive from them (_signatures_from_sets), so the
    corpus is tokenized+shingled ONCE per call instead of three times
    (signature pass + both verify sides — round 7, guide §1.2 "don't
    compute things twice")."""
    sets = shingle_hash_sets(docs, n).localCheckpoint(eager=False)
    sig = _signatures_from_sets(sets)
    l, r = sig.alias("l"), sig.alias("r")
    cand = (l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.band_hash") == F.col("r.band_hash"))
                   & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("doc_a"),
                    F.col("r.doc_id").alias("doc_b"))
            .distinct())
    sa = sets.select(F.col("doc_id").alias("doc_a"),
                     F.col("shs").alias("shs_a"), F.col("nsh").alias("na"))
    sb = sets.select(F.col("doc_id").alias("doc_b"),
                     F.col("shs").alias("shs_b"), F.col("nsh").alias("nb"))
    inter = F.size(F.array_intersect("shs_a", "shs_b")).cast("long")
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jac", F.round(
                inter / (F.col("na") + F.col("nb") - inter), 6))
            .filter(F.col("jac") >= verify_threshold)
            .select("doc_a", "doc_b", "jac"))


def cross_dup_pairs(new_docs: DataFrame, old_docs: DataFrame,
                    n: int = 3,
                    verify_threshold: float = 0.5) -> DataFrame:
    """(new_id, old_id, jac): near-dup links from a NEW batch into an
    EXISTING corpus — the incremental-ingest dedup primitive (today's
    crawl vs the already-curated 100 TB). Same banded LSH + candidate-
    local exact-Jaccard verify as minhash_lsh_pairs, but the candidate
    join runs ACROSS the two corpora only: the new batch never
    self-joins, and at scale the old side's signatures are a
    precomputable, reusable artifact (they are a pure per-doc
    function). Id spaces are independent — pairs carry (new_id,
    old_id), no cross-corpus id comparison."""
    # NEW side (a bounded ingest batch): hash sets materialized once,
    # signatures derived from them — one tokenize pass instead of two
    # (the minhash_lsh_pairs round-7 pattern). The OLD side stays two
    # lazy passes on purpose: checkpointing per-doc hash sets of the
    # whole existing corpus would trade two tokenize passes for a
    # corpus-sized materialization, and at scale the old side's
    # signatures are the precomputable artifact anyway (see above).
    sets_n = shingle_hash_sets(new_docs, n).localCheckpoint(eager=False)
    sig_n = _signatures_from_sets(sets_n).alias("l")
    sig_o = minhash_signatures(old_docs, n).alias("r")
    cand = (sig_n.join(sig_o,
                       (F.col("l.band") == F.col("r.band"))
                       & (F.col("l.band_hash") == F.col("r.band_hash")))
            .select(F.col("l.doc_id").alias("new_id"),
                    F.col("r.doc_id").alias("old_id"))
            .distinct())
    sa = sets_n.select(
        F.col("doc_id").alias("new_id"),
        F.col("shs").alias("shs_a"), F.col("nsh").alias("na"))
    sb = shingle_hash_sets(old_docs, n).select(
        F.col("doc_id").alias("old_id"),
        F.col("shs").alias("shs_b"), F.col("nsh").alias("nb"))
    inter = F.size(F.array_intersect("shs_a", "shs_b")).cast("long")
    return (cand.join(sa, "new_id").join(sb, "old_id")
            .withColumn("jac", F.round(
                inter / (F.col("na") + F.col("nb") - inter), 6))
            .filter(F.col("jac") >= verify_threshold)
            .select("new_id", "old_id", "jac"))


def dedup_against(new_docs: DataFrame, old_docs: DataFrame,
                  n: int = 3, verify_threshold: float = 0.5,
                  id_col: str = "doc_id") -> DataFrame:
    """The applied incremental filter: rows of `new_docs` that are NOT
    a near-dup of anything in `old_docs` (one anti-join against the
    flagged new ids). New-batch-internal dups are dedup_near_keep_first
    territory — run it on the survivors."""
    flagged = (cross_dup_pairs(new_docs, old_docs, n, verify_threshold)
               .select(F.col("new_id").alias(id_col)).distinct())
    return new_docs.join(flagged, id_col, "left_anti")


# ------------------------------------------------- near-dup apply (CC)

def _star_components(pairs: DataFrame, max_iter: int = 40) -> DataFrame:
    """(doc_id, component) via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    convergence in O(log n) alternations regardless of graph DIAMETER —
    the path for pathological duplicate chains where min-label
    propagation's O(diameter) rounds would not terminate. Each half-
    round is a groupBy-min plus a join, all distributed.

      large-star(u): m = min(N(u) + {u}); edges (v, m) for v in N(u),
                     v > u   (operates on the symmetrized edge set)
      small-star(u): m = min(N-(u) + {u}); edges (v, m) for
                     v in N-(u) + {u}, v != m, where N-(u) = smaller
                     neighbors (edges are larger->smaller after a
                     large-star round)
    """
    # localCheckpoint (not persist) each round: an iterative loop that
    # re-persists on top of the previous round's cache hits Spark's
    # cascading cache invalidation — unpersisting round t's edges
    # invalidates round t+1's dependent cache entry, so every job
    # recomputes the full lineage back to round 0 and per-round cost
    # doubles (measured). Checkpointing truncates the lineage instead.
    edges = (pairs.select(F.col("doc_a").alias("u"),
                          F.col("doc_b").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
             .distinct()).localCheckpoint()
    nodes = (edges.select(F.col("u").alias("doc_id"))
             .union(edges.select("v")).distinct()).localCheckpoint()
    for _ in range(max_iter):
        # ---- large-star on the symmetrized set
        sym = edges.union(edges.select(F.col("v").alias("u"),
                                       F.col("u").alias("v")))
        m = (sym.groupBy("u").agg(F.min("v").alias("mv"))
             .select("u", F.least("mv", F.col("u")).alias("m")))
        ls = (sym.join(m, "u")
              .filter(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .filter(F.col("u") != F.col("v"))
              .distinct())
        # ---- small-star on the (now larger->smaller) directed set
        m2 = (ls.groupBy("u").agg(F.min("v").alias("mv"))
              .select("u", F.least("mv", F.col("u")).alias("m")))
        new_edges = (ls.join(m2, "u")
                     .select(F.col("v").alias("n"), F.col("m"))
                     .union(m2.select(F.col("u").alias("n"),
                                      F.col("m")))
                     .filter(F.col("n") != F.col("m"))
                     .select(F.col("n").alias("u"),
                             F.col("m").alias("v"))
                     .distinct()).localCheckpoint()
        stable = (new_edges.exceptAll(edges).isEmpty()
                  and edges.exceptAll(new_edges).isEmpty())
        edges = new_edges
        if stable:
            break
    # fixpoint: every edge points a node at its component min
    return (nodes.join(edges.select(F.col("u").alias("doc_id"),
                                    F.col("v").alias("component")),
                       "doc_id", "left")
            .select("doc_id",
                    F.coalesce("component", "doc_id")
                    .alias("component")))


def connected_components(pairs: DataFrame, max_iter: int = 50,
                         on_nonconverged: str = "raise",
                         algorithm: str = "auto") -> DataFrame:
    """(doc_id, component): connected components of an undirected pair
    graph via min-label propagation — each round every node adopts the
    smallest label in its closed neighborhood. Convergence takes
    O(diameter) rounds (dup clusters are tiny, so 2-3 in practice).
    Each round is two hash joins + a groupBy — no driver data, scales
    with the edge list.

    algorithm: "label" = min-label propagation only; "star" = go
    straight to alternating large-star/small-star (_star_components,
    O(log n) rounds regardless of diameter); "auto" (default) = label
    propagation, falling back to star if max_iter rounds don't
    converge (a pathological long duplicate chain).

    If label propagation exhausts max_iter with no fallback available
    the result would be silently split components, so it raises by
    default (on_nonconverged="warn" downgrades to a logged warning)."""
    if algorithm == "star":
        return _star_components(pairs)
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .union(pairs.select(F.col("doc_b").alias("src"),
                                 F.col("doc_a").alias("dst"))))
    labels = (edges.select(F.col("src").alias("doc_id"))
              .distinct()
              .withColumn("component", F.col("doc_id"))).persist()
    changed = 1
    for _ in range(max_iter):
        nbr_min = (edges.join(labels,
                              edges["dst"] == labels["doc_id"])
                   .groupBy("src")
                   .agg(F.min("component").alias("nbr_comp")))
        updated = (labels.join(nbr_min,
                               labels["doc_id"] == nbr_min["src"], "left")
                   .select(labels["doc_id"],
                           F.least("component",
                                   F.coalesce("nbr_comp", "component"))
                           .alias("component"))).persist()
        changed = (updated.join(labels.withColumnRenamed(
                       "component", "old"), "doc_id")
                   .filter(F.col("component") != F.col("old")).count())
        labels.unpersist()
        labels = updated
        if changed == 0:
            break
    if changed != 0:
        msg = (f"connected_components did not converge within "
               f"{max_iter} rounds ({changed} labels still changing)")
        if algorithm == "auto":
            import warnings
            warnings.warn(msg + "; falling back to large-star/"
                          "small-star", RuntimeWarning)
            labels.unpersist()
            return _star_components(pairs)
        if on_nonconverged == "raise":
            labels.unpersist()
            raise RuntimeError(msg + "; components would be silently "
                               "split")
        import warnings
        warnings.warn(msg, RuntimeWarning)
    return labels


def dedup_near_keep_first(docs: DataFrame, n: int = 3,
                          threshold: float = 0.5) -> DataFrame:
    """The applied form of near-dup dedup: MinHash-LSH pairs ->
    connected components -> keep each component's canonical (min
    doc_id) member. Docs in no near-dup pair survive untouched.
    End-to-end 100 TB shape: banded candidates, candidate-local verify,
    label propagation, one left-anti join."""
    pairs = minhash_lsh_pairs(docs, n, threshold)
    comp = connected_components(pairs)
    losers = (comp.join(
        comp.groupBy("component").agg(F.min("doc_id").alias("keep")),
        "component")
        .filter(F.col("doc_id") != F.col("keep"))
        .select("doc_id")).persist()
    losers.count()     # materialize so the labels frame can be freed
    comp.unpersist()
    return docs.join(losers, "doc_id", "left_anti")


# ---------------------------------------------------------------- simhash

# SimHash width: 62 bits — two portable 31-bit Karp-Rabin planes (see
# _kr_token_hashes62). All chunk/block splitting derives from this.
N_SIMHASH_BITS = 62


def _chunk_widths(n_chunks: int) -> list[int]:
    base, rem = divmod(N_SIMHASH_BITS, n_chunks)
    return [base + 1 if i < rem else base for i in range(n_chunks)]


def simhash64(docs: DataFrame, n_chunks: int = 4) -> DataFrame:
    """(doc_id, simhash, chunk0..chunk{c-1}): tf-weighted simhash over
    N_SIMHASH_BITS (62) portable bit planes + c bit-chunks (pigeonhole
    keys: two hashes within hamming <= c-1 share >= 1 identical chunk,
    so candidate generation is an equi-join per chunk). Token bit
    planes come from _kr_token_hashes62 — exact integer arithmetic a
    SQL engine reproduces, which is what makes the simhash pair entries
    fully oracleable. (Function name kept from the 64-bit era.)"""

    def run(batches):
        # Batch-vectorized: one factorize + one reduceat per chunk of
        # docs instead of a value_counts + (tokens x bits) matmul per
        # doc. All-integer arithmetic (weights are tf counts), so the
        # bit signs — and therefore the simhash values — are exactly
        # those of the per-doc formulation.
        import re
        token = re.compile(TOKEN_RE)
        b62 = np.arange(N_SIMHASH_BITS, dtype=np.int64)
        chunk = 3000          # bounds the (rows x bits) int32 workspace
        for pdf in batches:
            out_h = np.zeros(len(pdf), dtype=np.int64)
            texts = pdf["text"]
            for c0 in range(0, len(pdf), chunk):
                sub = texts.iloc[c0:c0 + chunk]
                tok_lists = [token.findall((t or "").lower())
                             for t in sub]
                lens = np.fromiter((len(t) for t in tok_lists),
                                   np.int64, count=len(tok_lists))
                total = int(lens.sum())
                if total == 0:
                    continue
                flat = np.empty(total, dtype=object)
                pos = 0
                for t in tok_lists:
                    if t:
                        flat[pos:pos + len(t)] = t
                        pos += len(t)
                row = np.repeat(np.arange(len(tok_lists), dtype=np.int64),
                                lens)
                codes, uniq = pd.factorize(flat)
                nu = len(uniq)
                ukey, cnt = np.unique(row * nu + codes,
                                      return_counts=True)
                rws = ukey // nu
                th = _kr_token_hashes62(
                    np.asarray(uniq, dtype=object))[ukey % nu]
                bits = ((th[:, None] >> b62) & np.int64(1)) \
                    .astype(np.int32)
                contrib = (2 * bits - 1) * cnt[:, None].astype(np.int32)
                starts = np.flatnonzero(
                    np.diff(rws, prepend=rws[0] - 1))
                acc = np.add.reduceat(contrib, starts, axis=0)
                hh = ((acc > 0).astype(np.int64) << b62).sum(axis=1)
                out_h[c0 + rws[starts]] = hh
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy().astype("int64"),
                "simhash": out_h})

    out = docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, simhash long")
    u = F.col("simhash").cast("long")
    widths = _chunk_widths(n_chunks)
    offs = np.concatenate([[0], np.cumsum(widths)])
    def chunk(i):
        c = F.shiftrightunsigned(u, int(offs[i]))
        if widths[i] < 64:      # a (1<<64)-1 mask overflows a JVM long
            c = c.bitwiseAND(F.lit((1 << widths[i]) - 1).cast("long"))
        return c

    return out.select(
        "doc_id", "simhash",
        *[chunk(i).cast("int" if widths[i] <= 31 else "long")
          .alias(f"chunk{i}") for i in range(n_chunks)])


def simhash_pairs_blocked(docs: DataFrame, max_hamming: int = 4,
                          n_blocks: int | None = None) -> DataFrame:
    """(doc_a, doc_b, hamming): scale path for simhash near-dup pairs —
    Manku-style block-permutation keying (the public simhash paper's
    table scheme) instead of single-chunk pigeonhole buckets.

    Split the N_SIMHASH_BITS (62) bits into m = n_blocks blocks. A pair within hamming
    k differs in at most k blocks, so it matches on at least m-k
    unchanged blocks; for EVERY (m-k)-subset of blocks we build one
    candidate table keyed on that subset's concatenation. Completeness:
    the pair's damaged-block set (size <= k) is disjoint from at least
    one key subset, so the pair collides in that table.

    vs the chunk scheme (simhash_pairs): same exact output at the same
    k, but the candidate key is (m-k)/m * 62 bits wide instead of
    62/(k+1) bits, so per-bucket candidate joins stay tiny at 10^9
    docs. Cost: C(m, m-k) tables — a LINEAR row fan-out (each doc emits
    one row per table), never a quadratic bucket join.

    Recall/cost frontier at N_SIMHASH_BITS=62 (the reason the default
    contract is k=4; key width = (m-k)/m * 62):
      k=4, m=8  ->  C(8,4) = 70 tables, ~31-bit keys  (default)
      k=6, m=10 -> C(10,4) = 210 tables, ~24-bit keys (opt-in)
    The fan-out grows combinatorially with k while near-dup recall
    gains past hamming 4 are marginal at this hash width (Manku's
    production setting is k=3 on similar hash widths); callers that
    need the k=6 contract pass max_hamming=6 explicitly and pay the 3x
    fan-out. n_blocks defaults to max_hamming + 4 (keeps keys >= 24
    bits through k=6). Verification is the same exact
    bit_count(xor) <= k."""
    from itertools import combinations
    k = max_hamming
    m = n_blocks if n_blocks is not None else max_hamming + 4
    if m <= k:
        raise ValueError(
            f"n_blocks={m} must exceed max_hamming={k} for the "
            f"block-permutation scheme to have a nonempty key")
    widths = _chunk_widths(m)
    offs = [0]
    for w in widths:
        offs.append(offs[-1] + w)
    sh = simhash64(docs, n_chunks=1).select("doc_id", "simhash")
    u = F.col("simhash").cast("long")

    def block(i):
        return (F.shiftrightunsigned(u, offs[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1).cast("long")))

    keys = []
    for combo in combinations(range(m), m - k):
        key, shift = F.lit(0).cast("long"), 0
        for i in combo:
            key = key.bitwiseOR(F.shiftleft(block(i), shift))
            shift += widths[i]
        keys.append(key)
    longf = sh.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*keys)).alias("tbl", "kv"))
    l = longf.select(F.col("doc_id").alias("doc_a"),
                     F.col("simhash").alias("ha"), "tbl", "kv")
    r = longf.select(F.col("doc_id").alias("doc_b"),
                     F.col("simhash").alias("hb"), "tbl", "kv")
    cands = (l.join(r, ["tbl", "kv"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", "ha", "hb")
             .distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cands.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 6,
                  n_chunks: int | None = None) -> DataFrame:
    """(doc_a, doc_b, hamming): near-dup pairs via chunk-bucketed
    candidate join + exact hamming verify.

    Completeness: with c chunks of the 62 bits, any pair within hamming
    c-1 shares at least one unchanged chunk (pigeonhole), so
    n_chunks defaults to max_hamming + 1 — every qualifying pair is
    guaranteed to surface as a candidate. (4 fixed chunks would
    silently miss hamming-4..6 pairs that differ in all four.)"""
    c = n_chunks if n_chunks is not None else max_hamming + 1
    if c < max_hamming + 1:
        raise ValueError(
            f"n_chunks={c} cannot guarantee recall at hamming "
            f"{max_hamming}; need >= {max_hamming + 1}")
    # ONE self-join on (chunk index, chunk value) over the exploded
    # chunk table instead of c separate self-joins unioned: same
    # candidate set, but 2 kernel executions + 1 shuffle instead of 2c
    sh = simhash64(docs, n_chunks=c)
    longf = sh.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[F.col(f"chunk{i}") for i in range(c)]))
        .alias("ck_i", "ck_v"))
    l = longf.select(F.col("doc_id").alias("doc_a"),
                     F.col("simhash").alias("ha"), "ck_i", "ck_v")
    r = longf.select(F.col("doc_id").alias("doc_b"),
                     F.col("simhash").alias("hb"), "ck_i", "ck_v")
    cands = (l.join(r, ["ck_i", "ck_v"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", "ha", "hb")
             .distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cands.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))
