"""Deterministic synthesized `pages` table (FIXTURES.md F1).

The engine's one real input at the input_hint shape (BASELINE.json:15):
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
`text` is the golden column: it equals the frozen extractor's output on
`html` byte-for-byte (tested).

Determinism across parallelism: generation is chunked on a FIXED grid
(CHUNK docs per chunk, rng seeded per chunk id), so content depends only
on doc index — never on Spark partitioning. This mirrors how the engine
itself must behave (identical docIDs at local[8] vs local[32],
BASELINE.json:6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
CHUNK = 5000
VOCAB_SIZE = 5000
ZIPF_S = 1.2
MEAN_LOG_LEN = 4.6075   # exp(mu + sigma^2/2) ~ 120 tokens
SIGMA_LOG_LEN = 0.6
LANGS = np.array(["en", "de", "fr", "es", "zh"])
LANG_P = np.array([0.5, 0.125, 0.125, 0.125, 0.125])

_VOCAB = np.array([f"term{i:05d}" for i in range(VOCAB_SIZE)], dtype=object)
_ZIPF_P = (1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S)
_ZIPF_P = _ZIPF_P / _ZIPF_P.sum()

_HTML_TMPL = ("<html><head><title>{title}</title>"
              "<script>skip(); var x = 1 < 2;</script>"
              "<style>body {{ color: red; }}</style></head>"
              "<body><!-- hidden comment --><p>{p1}</p>"
              "<p>{p2} &amp; tail&nbsp;end</p></body></html>")


def gen_chunk(chunk_id: int, n_total: int) -> pd.DataFrame:
    """Generate docs [chunk_id*CHUNK, min((chunk_id+1)*CHUNK, n_total))."""
    start = chunk_id * CHUNK
    end = min(start + CHUNK, n_total)
    n = end - start
    rng = np.random.default_rng(SEED * 1_000_003 + chunk_id)
    lens = np.maximum(
        1, rng.lognormal(MEAN_LOG_LEN, SIGMA_LOG_LEN, size=n).astype(np.int64))
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    urls, tss, htmls, texts = [], [], [], []
    from irkit_spark.functions.extract import extract_text
    for j in range(n):
        i = start + j
        site = i % 200
        url = f"https://site{site:04d}.example/p/{i:06d}"
        if i % 101 == 53:            # parse-failure page: invalid utf-8
            html = b"\xff\xfe<html>broken"
        elif i % 97 == 13:           # empty-body page
            html = _HTML_TMPL.format(title="", p1="", p2="").encode()
        elif i % 89 == 7:            # duplicate-token doc
            body = " ".join([_VOCAB[1 + (i % 5)]] * 30)
            html = _HTML_TMPL.format(
                title=f"dup page {i:06d}", p1=body, p2="").encode()
        else:
            toks = rng.choice(_VOCAB, size=lens[j], p=_ZIPF_P)
            half = lens[j] // 2
            html = _HTML_TMPL.format(
                title=f"page {i:06d} site{site:04d}",
                p1=" ".join(toks[:half]), p2=" ".join(toks[half:])).encode()
        urls.append(url)
        tss.append(np.datetime64("2024-01-01T00:00:00") + np.timedelta64(17 * i, "s"))
        htmls.append(html)
        texts.append(extract_text(html))
    return pd.DataFrame({
        "url": pd.Series(urls, dtype="object"),
        "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
        "html": pd.Series(htmls, dtype="object"),
        "text": pd.Series(texts, dtype="object"),
        "lang": pd.Series(langs, dtype="object"),
    })


def pages_pandas(n_docs: int) -> pd.DataFrame:
    """Driver-side generation for pytest fixtures (small n)."""
    chunks = [gen_chunk(c, n_docs) for c in range((n_docs + CHUNK - 1) // CHUNK)]
    return pd.concat(chunks, ignore_index=True)


PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def pages_df(spark, n_docs: int):
    """Distributed generation: one fixed chunk grid, parallel workers.

    One partition per chunk — NOT capped at defaultParallelism: a table
    generated (and persisted) at local[2] would otherwise land in 2
    parquet files of one big row group each, silently capping every
    downstream scan stage at 2-way parallelism even at local[32] (the
    round-1 scaling numbers were bounded by exactly this)."""
    n_chunks = (n_docs + CHUNK - 1) // CHUNK
    chunk_ids = spark.range(n_chunks).withColumnRenamed("id", "chunk_id")
    chunk_ids = chunk_ids.repartition(n_chunks)

    def gen(batches):
        for pdf in batches:
            for cid in pdf["chunk_id"].tolist():
                yield gen_chunk(int(cid), n_docs)

    return chunk_ids.mapInPandas(gen, schema=PAGES_SCHEMA)
