"""End-to-end corpus curation: the pass a training-data pipeline runs
before packing/indexing, composed from this package's own stages.

quality filter (length / repetition / gibberish thresholds)
  -> exact dedup, keep the lowest doc_id per identical text
  -> deterministic hash split (train/val/test residue ranges)

Every stage is an existing tested operator (textstats.quality_filter,
dedup.dedup_keep_first, sampling.hash_split); this module only
composes them, so the whole flow inherits their scale shapes: one
codegen'd filter scan, one hash groupBy on md5(text), one codegen'd
split projection — no pair joins, nothing driver-side. The composite
is oracled end-to-end (`curation_pipeline` in __spark_entry__.py):
the DuckDB SQL chains the same stages as CTEs, proving the stage
*composition* (filter-before-dedup ordering, split-after-dedup
stability) and not just each stage alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irkit_spark.pipeline.dedup import dedup_keep_first
from irkit_spark.pipeline.sampling import hash_split
from irkit_spark.pipeline.textstats import quality_filter


def curate(docs: DataFrame, min_tokens: int = 20,
           min_uniq_ratio: float = 0.3,
           max_mean_tok_len: float = 12.0,
           den: int = 100,
           boundaries: dict[str, int] | None = None) -> DataFrame:
    """Filtered, deduplicated, split-labeled corpus (input columns +
    `split`). Order of stages is part of the contract: quality filter
    first (drop junk before it can shadow a duplicate group's keeper),
    dedup second, split last (so the split is a pure function of the
    surviving doc_id — stable when upstream thresholds change)."""
    kept = quality_filter(docs, min_tokens, min_uniq_ratio,
                          max_mean_tok_len)
    return hash_split(dedup_keep_first(kept), den,
                      boundaries=boundaries)


def curation_report(docs: DataFrame, **kwargs) -> DataFrame:
    """(split, n_docs, n_tokens) over the curated corpus — the
    per-split budget a training run needs before packing."""
    from irkit_spark.config import TOKEN_RE
    cur = curate(docs, **kwargs)
    n = F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                    F.lit(TOKEN_RE), 0))
    return (cur.groupBy("split")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(n.cast("long")).cast("long").alias("n_tokens")))
