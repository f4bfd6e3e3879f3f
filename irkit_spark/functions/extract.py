"""Frozen HTML -> text extraction (SURVEY.md §2.1 S3).

Re-expresses irkit's gumbo-based DOM walk
([pub:include/irkit/parsing/html.hpp]) as a deterministic, pure,
FROZEN regex state machine (no HTML lib is guaranteed in the sandbox;
SURVEY.md S3 pins "decided at bootstrap, then never changed").

Frozen semantics (golden-file tested, byte-identical per url —
BASELINE.json:15):
  1. decode bytes as strict UTF-8; undecodable input => "" (the
     "parse failure" case from FIXTURES.md F1)
  2. drop <!-- comments -->, <script>...</script>, <style>...</style>
     (case-insensitive, non-greedy, unterminated blocks drop to EOF)
  3. strip every remaining <...> tag
  4. unescape HTML entities (named + numeric, html.unescape)
  5. collapse all whitespace runs to a single space; strip ends

Exposed as `extract_text_udf`, an Arrow-vectorized pandas_udf
(BinaryType -> StringType); the regex passes run as pandas .str ops
over the whole Arrow batch.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd

_COMMENT = re.compile(r"<!--.*?(?:-->|$)", re.S)
_SCRIPT = re.compile(r"<script\b.*?(?:</script\s*>|$)", re.S | re.I)
_STYLE = re.compile(r"<style\b.*?(?:</style\s*>|$)", re.S | re.I)
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")


def strip_markup(s: str) -> str:
    """The frozen strip passes on an already-decoded string (comments,
    script, style, tags -> ' '; entity unescape). No ws-collapse —
    extract_text adds it; the fused canonicalize path subsumes it in
    tokenization."""
    s = _COMMENT.sub(" ", s)
    s = _SCRIPT.sub(" ", s)
    s = _STYLE.sub(" ", s)
    s = _TAG.sub(" ", s)
    return _html.unescape(s)


def extract_text(html_bytes: bytes | None) -> str:
    """Frozen scalar extractor (golden tests, fixture generation)."""
    if html_bytes is None:
        return ""
    try:
        s = bytes(html_bytes).decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return ""
    return _WS.sub(" ", strip_markup(s)).strip()


def extract_batch(html_series: pd.Series) -> pd.Series:
    """Batch form over an Arrow column of binary; same frozen semantics.

    Regex substitution runs per batch via pandas str ops; entity
    unescape uses html.unescape per element inside the batch (C-accel
    lookup table, still Arrow-batched at the Spark boundary).
    """
    def _one(b):
        return extract_text(b)
    return html_series.map(_one).astype("object")


def extract_text_udf():
    """Build the Arrow-vectorized pandas_udf lazily (needs pyspark)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _extract(html_col: pd.Series) -> pd.Series:
        return extract_batch(html_col)

    return _extract
