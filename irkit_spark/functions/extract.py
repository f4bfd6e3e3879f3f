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


# ---------------------------------------------------------------------
# Opt-in DOM-fidelity extractor ("dom"): fixes the frozen extractor's
# documented regex-vs-DOM edge cases (VERDICT r4 "What's missing" #2)
# without touching the frozen default — indexes built under one
# extractor stay byte-stable forever; the knob is per-build
# (build_index(extractor=...)) and batches merged together must share
# it (operators/merge.py docstring).
#
# DOM-faithful behaviors the frozen regexes get wrong:
#   * '>' inside a quoted attribute value (title="a>b") no longer ends
#     the tag — tag bodies are tokenized quote-aware
#   * <noscript>/<template>/<iframe> CONTENT is dropped (a DOM walk
#     with scripting enabled renders none of it), alongside
#     script/style
#   * a bare '<' that does not open a tag ('5 < 6') stays literal
#     text instead of swallowing everything to the next '>'
#   * <!DOCTYPE ...>, <? ... >, <![CDATA[ ... ]]> and bogus comments
#     are dropped as units
# Still a single linear scan: one alternation where the first
# character(s) decide the branch and every branch consumes
# deterministically (quoted-string | non-quote-non-gt runs), so no
# catastrophic backtracking on adversarial input.
_RAW_DROP = r"script|style|noscript|template|iframe"
_DOM = re.compile(
    r"""
      <!--.*?(?:-->|$)                                # comment
    | <!\[CDATA\[.*?(?:\]\]>|$)                       # CDATA section
    | <!(?:--)?[^>]*(?:>|$)                           # doctype/bogus <!
    | <\?[^>]*(?:>|$)                                 # <? ... >
    | <(script|style|noscript|template|iframe)        # raw-text element:
      (?=[\s/>])(?:"[^"]*"|'[^']*'|[^>"'])*(?:>|$)    #  quote-aware open tag
      .*?(?:</\1\s*(?:>|$)|$)                         #  content to close/EOF
    | </?[a-zA-Z](?:"[^"]*"|'[^']*'|[^>"'])*(?:>|$)   # ordinary tag
    """,
    re.S | re.I | re.X)


def extract_text_dom(html_bytes: bytes | None) -> str:
    """Scalar "dom" extractor: same decode / entity / whitespace
    contract as the frozen form, DOM-faithful markup handling."""
    if html_bytes is None:
        return ""
    try:
        s = bytes(html_bytes).decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return ""
    return _WS.sub(" ", _html.unescape(_DOM.sub(" ", s))).strip()


# extractor registry (house pattern: codec/scorer registries) — keys
# are the build_index(extractor=...) values. "frozen" is the default
# and the only form the golden byte-identity invariant applies to.
EXTRACTORS = {"frozen": extract_text, "dom": extract_text_dom}


def _extract_text_nows(html_bytes: bytes | None) -> str:
    """Frozen extract WITHOUT the final whitespace-collapse pass.

    For consumers that immediately tokenize ([a-z0-9]+ runs of the
    lowered string): whitespace is never part of a token and never
    joins two alnum runs, so `findall(TOKEN_RE, x.lower())` is
    invariant under `_WS.sub(' ', x).strip()` — the collapse is pure
    overhead there (measured ~70% of extract_text wall on the bench
    corpus). extract_text stays the byte-identity surface."""
    if html_bytes is None:
        return ""
    try:
        s = bytes(html_bytes).decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return ""
    return strip_markup(s)


def _extract_text_dom_nows(html_bytes: bytes | None) -> str:
    """extract_text_dom minus the whitespace collapse (same tokenize
    invariance argument as _extract_text_nows)."""
    if html_bytes is None:
        return ""
    try:
        s = bytes(html_bytes).decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return ""
    return _html.unescape(_DOM.sub(" ", s))


# tokenize-bound twins of EXTRACTORS (functions/tokenize.canonicalize_
# iter): identical token streams, no whitespace-collapse pass
EXTRACTORS_NOWS = {"frozen": _extract_text_nows,
                   "dom": _extract_text_dom_nows}


def extract_batch(html_series: pd.Series,
                  extractor: str = "frozen") -> pd.Series:
    """Batch form over an Arrow column of binary.

    Arrow-batched at the Spark boundary only: inside the batch each
    element runs the scalar extractor (regex substitution on str is
    per-element in CPython regardless of pandas .str wrapping, so
    there is nothing further to vectorize — measured equal).
    """
    return html_series.map(EXTRACTORS[extractor]).astype("object")


def extract_text_udf(extractor: str = "frozen"):
    """Build the Arrow-vectorized pandas_udf lazily (needs pyspark)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    fn = EXTRACTORS[extractor]   # raise on unknown name at plan time

    @F.pandas_udf(T.StringType())
    def _extract(html_col: pd.Series) -> pd.Series:
        return html_col.map(fn).astype("object")

    return _extract
