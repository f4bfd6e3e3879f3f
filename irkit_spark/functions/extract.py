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
(BinaryType -> StringType): rows move Spark<->Python as Arrow batches;
within a batch the regex passes run per element (re.sub on str is
per-element in CPython whether called directly or via pandas .str —
there is no vectorized regex kernel to hoist into).

Known frozen-semantics edge cases (deliberate, golden-tested —
regex-vs-DOM fidelity is documented in SURVEY.md §2.1 / VERDICT r4):
  * a literal '>' inside an attribute value (title="a>b") ends the
    tag match early, leaking the attribute tail (-> 'b">link') — a
    DOM parser would not leak it ('<' inside a value is fine: the
    tag regex consumes it)
  * <noscript>/<template> content is KEPT (a DOM walk with scripting
    enabled would drop noscript)
  * a bare text '<' with a later '>' strips the span between them
    ('5 < 6 and 7 > 4' -> '5 4'); with no later '>' it is kept
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

    Arrow-batched at the Spark boundary only: inside the batch each
    element runs the scalar extract_text (regex substitution on str is
    per-element in CPython regardless of pandas .str wrapping, so
    there is nothing further to vectorize — measured equal).
    """
    return html_series.map(extract_text).astype("object")


def extract_text_udf():
    """Build the Arrow-vectorized pandas_udf lazily (needs pyspark)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _extract(html_col: pd.Series) -> pd.Series:
        return extract_batch(html_col)

    return _extract
