"""C4-style line-level boilerplate removal.

Web corpora repeat navigation chrome, cookie banners and legal footers
across millions of pages; C4/RefinedWeb-class pipelines drop any line
whose normalized form occurs in too many documents. Two phases:

1. Count: per doc, normalize each line (lower + space-trim) and keep
   the DISTINCT set (a line repeated inside one doc counts once), then
   one narrow shuffle of (line_key) strings — never the full text —
   to count containing docs. Lines normalizing to '' (blank/indent)
   are never boilerplate.
2. Remove: lines whose doc-frequency >= min_docs are deleted from
   every document, order of surviving lines preserved.

Scale shape: the boilerplate set is bounded by construction
(|set| <= total_distinct_line_occurrences / min_docs) and for real
corpora is tiny (thousands of chrome strings), so the default path
collects it under a gate and applies it as a literal-array filter
inside one codegen'd projection — document text itself never
shuffles. Above the gate, a join fallback explodes lines, anti-joins
the boilerplate table (broadcast by AQE when small), and reassembles
per doc — one text shuffle, still no driver materialization. Both
paths are value-identical (tested).

The normalization and filter are frozen expression text shared with
the DuckDB oracle (`line_dedup` in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Driver gate for the literal-array apply path: boilerplate keys are
# short strings; 100k of them is a few MB — same order as the repo's
# other gated broadcasts (DL_BROADCAST_MAX etc.).
BOILER_COLLECT_MAX = 100_000


def _norm(x):
    # frozen normalization — identical text in the DuckDB oracle
    return F.lower(F.trim(x))


def _lines(text_col: str):
    return F.split(F.col(text_col), "\n", -1)


def boilerplate_lines(docs: DataFrame, min_docs: int,
                      text_col: str = "text") -> DataFrame:
    """(line_key, n_docs) for every normalized line occurring in at
    least `min_docs` distinct documents. Only line keys shuffle."""
    keys = docs.select(
        F.explode(F.array_distinct(F.transform(_lines(text_col), _norm)))
        .alias("line_key"))
    return (keys.filter(F.col("line_key") != "")
            .groupBy("line_key")
            .agg(F.count("*").cast("long").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs))


def remove_boilerplate(docs: DataFrame, min_docs: int = 50,
                       text_col: str = "text",
                       collect_max: int = BOILER_COLLECT_MAX) -> DataFrame:
    """Delete corpus-frequent lines from every document.

    Returns the input columns with `text_col` rewritten (surviving
    lines re-joined with '\\n', order preserved) plus `n_removed`
    (lines deleted from this doc). Documents whose every line is
    boilerplate survive with text ''.
    """
    boiler = boilerplate_lines(docs, min_docs, text_col)
    keys = [r.line_key
            for r in boiler.select("line_key").limit(collect_max + 1)
            .collect()]
    if len(keys) <= collect_max:
        return _apply_literal(docs, keys, text_col)
    return _apply_join(docs, boiler, text_col)


def dedup_paragraphs(docs: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """Corpus-global paragraph dedup, keep-first: every repeat of a
    normalized paragraph beyond its FIRST occurrence in corpus order
    (doc_id asc, then position asc) is deleted; the first occurrence
    and all blank-normalizing paragraphs survive. The paragraph-level
    member of the repeated-content family (lines: remove_boilerplate;
    whole docs: pipeline/dedup.py) — the shape 'deduplicate training
    text at sub-document granularity without losing any content'.

    Returns the input columns with `text_col` rewritten (survivors
    re-joined with '\\n\\n', order preserved) plus `n_removed`. Docs
    whose every paragraph was claimed earlier survive with text ''.

    Scale shape: paragraphs posexplode once (the one text shuffle);
    first-occurrence election is groupBy(key).agg(min(struct(doc_id,
    pos))) + a semi-equality join back — a PARTIAL (map-side combine)
    aggregate, so a head boilerplate paragraph repeated across
    millions of docs collapses before the shuffle (a row_number
    window could not split that key), and AQE can split any residual
    join skew. Reassembly groups back by doc. Normalization and split
    are frozen expression text shared with the DuckDB oracle
    (`paragraph_dedup` in __spark_entry__.py)."""
    paras = F.split(F.col(text_col), "\n\n", -1)
    other = [c for c in docs.columns if c != text_col]
    ex = (docs.select(*other,
                      F.posexplode(paras).alias("_pos", "_par"))
          .withColumn("_k", _norm(F.col("_par"))))
    first = (ex.filter(F.col("_k") != "")
             .groupBy("_k")
             .agg(F.min(F.struct("doc_id", "_pos")).alias("_f")))
    kept = (ex.join(first, "_k", "left")
            .filter((F.col("_k") == "")
                    | (F.struct("doc_id", "_pos") == F.col("_f"))))
    agg = (kept.groupBy(*other)
           .agg(F.concat_ws(
                    "\n\n",
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("_pos", "_par"))),
                        lambda s: s["_par"])).alias(text_col),
                F.count("*").alias("_n_kept")))
    base = docs.select(*other, F.size(paras).alias("_n0"))
    return (base.join(agg, other, "left")
            .select(*other,
                    F.coalesce(F.col(text_col), F.lit(""))
                    .alias(text_col),
                    (F.col("_n0") - F.coalesce("_n_kept", F.lit(0)))
                    .cast("long").alias("n_removed")))


def _apply_literal(docs: DataFrame, keys: list[str],
                   text_col: str) -> DataFrame:
    """Zero-shuffle apply: boilerplate set as a literal array inside a
    single codegen'd projection (sorted for a deterministic plan)."""
    barr = F.array(*[F.lit(k) for k in sorted(keys)])
    lines = _lines(text_col)
    kept = F.filter(lines, lambda x: ~F.array_contains(barr, _norm(x))) \
        if keys else lines
    out = [c for c in docs.columns if c != text_col]
    return docs.select(
        *out,
        F.concat_ws("\n", kept).alias(text_col),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_removed"))


def _apply_join(docs: DataFrame, boiler: DataFrame,
                text_col: str) -> DataFrame:
    """Fallback above the gate: explode lines, anti-join the
    boilerplate table, reassemble in original order. One shuffle of
    the text; boilerplate side broadcast by AQE when it fits."""
    other = [c for c in docs.columns if c != text_col]
    ln = docs.select(
        *other, F.size(_lines(text_col)).alias("_n"),
        F.posexplode(_lines(text_col)).alias("_pos", "_line"))
    kept = ln.join(boiler.withColumnRenamed("line_key", "_k"),
                   _norm(F.col("_line")) == F.col("_k"), "left_anti")
    # group back; docs fully boiled away still need a row -> left join
    agg = (kept.groupBy(*other)
           .agg(F.concat_ws(
                    "\n",
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("_pos", "_line"))),
                        lambda s: s["_line"])).alias(text_col),
                (F.first("_n") - F.count("*")).cast("long")
                .alias("n_removed")))
    base = docs.select(*other, F.size(_lines(text_col)).alias("_n0"))
    return (base.join(agg, other, "left")
            .select(*other,
                    F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
                    F.coalesce("n_removed", F.col("_n0").cast("long"))
                    .alias("n_removed")))
