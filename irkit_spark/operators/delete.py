"""Document deletion (tombstones) for a built index.

irkit's public surface has no delete (SURVEY.md §2 — the reference
index is immutable once merged); every production deployment of a
fulltext index needs one, so this extends the engine the way Lucene
does: a `deletions/` artifact of tombstoned doc ids alongside the
index. Semantics are Lucene's too, and match the engine's own
filtered-retrieval contract (operators/query.search(doc_filter=...)):

  * deletion changes SELECTION, not scoring — global collection stats
    (n_docs, avgdl, df, cf) stay frozen at build time, so a surviving
    doc scores bit-identically before and after a delete;
  * physical removal + stats recompute is a separate, explicit step
    (operators/compact.compact_index).

Scale shape: the artifact is dir-partitioned by shard like docs/.
Below config.DEL_BROADCAST_MAX the Index ships one broadcast of
per-shard sorted id arrays and every query kernel masks candidates
in place (zero extra jobs, zero shuffle); above it, queries cogroup
against the docs table with the deletions anti-joined out — only the
touched shards move, the same fallback shape as the doc-length gate.

Writes are read-modify-swap: the merged set lands in a temp artifact
dir and is os.replace()d over `deletions/`, so a crash mid-write
leaves the previous tombstone set intact, never a partial one.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELETIONS_SCHEMA = "partition_id int, doc_id long"


def read_deletions(spark: SparkSession, index_path: str,
                   table_format: str | None = None) -> DataFrame:
    from irkit_spark.sources.catalog import read_artifact
    return read_artifact(spark, index_path, "deletions",
                         DELETIONS_SCHEMA, table_format)


def has_deletions(spark: SparkSession, index_path: str,
                  table_format: str | None = None) -> bool:
    from irkit_spark.sources.catalog import artifact_exists
    return artifact_exists(spark, index_path, "deletions",
                           fmt=table_format)


def delete_docs(spark: SparkSession, index_path: str,
                doc_ids=None, predicate: str | None = None,
                table_format: str | None = None) -> dict:
    """Tombstone documents of the index at `index_path`.

    Exactly one of:
      doc_ids   — iterable of ints, or a DataFrame with a doc_id
                  column;
      predicate — SQL boolean expression over the docs artifact
                  (doc_id, url, doc_len, partition_id), e.g.
                  "url LIKE 'https://spam.%'".

    Ids not present in the docs table are ignored (deleting an
    unknown id is a no-op, and the artifact stays a subset of docs —
    the invariant operators/validate.verify_index checks). Cumulative
    and idempotent: the new set is unioned with any existing
    tombstones and deduplicated.

    Returns {"n_deleted": total tombstones after the write}."""
    from irkit_spark.sources.catalog import (artifact_format,
                                             read_artifact,
                                             write_artifact)
    if (doc_ids is None) == (predicate is None):
        raise ValueError("pass exactly one of doc_ids / predicate")
    fmt = artifact_format(table_format)
    docs = read_artifact(spark, index_path, "docs", fmt=fmt)
    if predicate is not None:
        new = docs.filter(F.expr(predicate))
    else:
        if isinstance(doc_ids, DataFrame):
            ids_df = doc_ids.select(F.col("doc_id").cast("long"))
        else:
            ids_df = spark.createDataFrame(
                [(int(d),) for d in doc_ids], "doc_id long")
        # semi-join keeps the artifact a subset of docs and attaches
        # the shard; ad-hoc id lists are small -> broadcast them, the
        # docs scan stays the big side
        new = docs.join(F.broadcast(ids_df.distinct()), "doc_id",
                        "left_semi")
    new = new.select("partition_id", F.col("doc_id").cast("long"))
    if has_deletions(spark, index_path, fmt):
        new = new.unionByName(
            read_deletions(spark, index_path, fmt)).distinct()
    else:
        new = new.distinct()

    if fmt == "iceberg":
        # createOrReplace is the catalog's own atomic swap
        write_artifact(new, index_path, "deletions",
                       partition_by="partition_id", fmt=fmt)
    else:
        # read-modify-SWAP: the source of the union is the artifact
        # being replaced, so the merged set must land elsewhere first
        tmp = "deletions.__tmp__"
        tmp_path = os.path.join(index_path, tmp)
        shutil.rmtree(tmp_path, ignore_errors=True)
        write_artifact(new, index_path, tmp,
                       partition_by="partition_id", fmt=fmt)
        final = os.path.join(index_path, "deletions")
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp_path, final)
    n = read_deletions(spark, index_path, fmt).count()
    return {"n_deleted": int(n)}


def clear_deletions(spark: SparkSession, index_path: str,
                    table_format: str | None = None) -> None:
    """Drop every tombstone (un-delete all). Parquet: remove the
    artifact dir; Iceberg: replace with an empty table."""
    from irkit_spark.sources.catalog import artifact_format
    fmt = artifact_format(table_format)
    if fmt == "iceberg":
        from irkit_spark.sources.catalog import write_artifact
        empty = spark.createDataFrame([], DELETIONS_SCHEMA)
        write_artifact(empty, index_path, "deletions",
                       partition_by="partition_id", fmt=fmt)
        return
    shutil.rmtree(os.path.join(index_path, "deletions"),
                  ignore_errors=True)
