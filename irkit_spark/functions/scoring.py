"""Frozen scorers — BM25 and Dirichlet query-likelihood.

Re-expresses irkit's scorer templates (SURVEY.md §2.9
[pub:include/irkit/score.hpp]) as vectorized numpy kernels plus the
*identical* formula as ANSI-SQL text, so the TAAT DataFrame path, the
DAAT/WAND mapInPandas kernels, and the DuckDB oracle are rank-identical
by construction (BASELINE.json:14).

Frozen formula (SURVEY.md Q1 form, no (k1+1) factor — rank-equivalent
to Robertson BM25 and matching irkit's taat/daat scoring shape):

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(d,t)  = tf / (tf + k1 * (1 - b + b * dl/avgdl))
    bm25(d,t)     = idf(t) * tf_norm(d,t)

Dirichlet QL (SURVEY.md Q2): ln((tf + mu*cf/C) / (dl + mu)) summed over
query terms, plus |q|*... omitted constant — we keep the per-term sum
only (rank-equivalent for fixed query).
"""

from __future__ import annotations

import numpy as np

from irkit_spark.config import BM25_B, BM25_K1, JM_LAMBDA, QL_MU


def idf(df: np.ndarray, n_docs: float) -> np.ndarray:
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))


def bm25(tf, df, dl, n_docs: float, avgdl: float) -> np.ndarray:
    """Per-posting BM25 contribution (vectorized)."""
    return idf(df, n_docs) * bm25_tf_norm(tf, dl, avgdl)


def ql_dirichlet(tf, dl, cf, coll_len: float) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    cf = np.asarray(cf, dtype=np.float64)
    return np.log((tf + QL_MU * cf / coll_len) / (dl + QL_MU))


def ql_jm(tf, dl, cf, coll_len: float) -> np.ndarray:
    """Jelinek-Mercer smoothed query likelihood in its rank-equivalent
    per-posting decomposition (Zhai & Lafferty 2001):
        ln((1-l)*tf/dl + l*p_t) - ln(l*p_t)
          = ln(1 + ((1-l)/l) * tf / (dl * p_t)),  p_t = cf/C
    — additive over MATCHED terms only, with no doc-level adjustment
    (unlike Dirichlet), so it rides every decomposed path unchanged."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    cf = np.asarray(cf, dtype=np.float64)
    c = (1.0 - JM_LAMBDA) / JM_LAMBDA
    return np.log1p(c * tf / (dl * (cf / coll_len)))


# --- the same formulas as SQL text (DuckDB + Spark SQL dialect-neutral) --

def bm25_sql(tf="tf", df="df", dl="dl", n="n_docs", avgdl="avgdl") -> str:
    k1, b = BM25_K1, BM25_B
    return (f"ln(1 + ({n} - {df} + 0.5) / ({df} + 0.5)) * "
            f"({tf} / ({tf} + {k1} * (1.0 - {b} + {b} * {dl} / {avgdl})))")


def ql_sql(tf="tf", dl="dl", cf="cf", coll="coll_len") -> str:
    mu = QL_MU
    return f"ln(({tf} + {mu} * {cf} / {coll}) / ({dl} + {mu}))"


def jm_sql(tf="tf", dl="dl", cf="cf", coll="coll_len") -> str:
    c = (1.0 - JM_LAMBDA) / JM_LAMBDA
    return f"ln(1 + {c!r} * {tf} / ({dl} * ({cf} / {coll})))"


SCORERS = {
    "bm25": bm25,
    "ql": ql_dirichlet,
    "jm": ql_jm,
}
