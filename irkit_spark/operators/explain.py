"""Query plan introspection: what would this query cost, and which
serving path would run it — WITHOUT decoding a single posting.

explain_query is the operator an operator-on-call reaches for before a
query fleet goes out: term statistics, the postings volume the scan
will touch, which execution path search() would auto-route to, which
acceleration artifacts (shard_stats / postings_tier / positions) are
present AND fresh, and — when the selection statistics exist — the
per-shard upper-bound profile selective search would rank by. Pure
metadata: the report is built from the lexicon dict, artifact commit
signals and (optionally) the narrow shard-bound pass; the posting
payload bytes are never read.
"""

from __future__ import annotations

from irkit_spark import config
from irkit_spark.operators.query import Index, _parse_boosts


def explain_query(index: Index, query: str, k: int = 10,
                  with_shard_bounds: bool = False) -> dict:
    """A driver-side report dict for one query against one index.

    Keys:
      terms        — [{term, term_id, df, cf, idf, boost}] (OOV
                     dropped, term_id ascending — the kernel's pinned
                     add order)
      oov_terms    — query tokens absent from the lexicon
      n_terms      — len(terms)
      est_postings — sum of df over the query terms: the exact number
                     of postings the pruned scan touches before
                     block-level skipping
      route        — the path search(local=None) would take: "empty"
                     (all OOV), "local" (driver kernel, est_postings
                     <= LOCAL_QUERY_MAX_POSTINGS), or "distributed"
      index        — {n_docs, avgdl, coll_len, codec, quantized,
                     docs_per_shard, n_shards_max}
      deletions    — whether a tombstone set is present
      artifacts    — {shard_stats, postings_tier, positions}: each
                     "fresh" | "stale" | "absent" under the same
                     commit-mtime rule the query paths apply (a stale
                     artifact is exactly as unusable as an absent one)
      shard_bounds — only when with_shard_bounds=True and the query
                     has terms: selective search's [(shard, UB)]
                     ranking (one narrow Spark job; everything else in
                     the report is zero-job when the lexicon dict is
                     warm)
    """
    q, parsed = _parse_boosts(query)
    qmeta = index.lookup_query(q)
    from irkit_spark.functions.tokenize import tokenize
    toks = sorted(set(tokenize(q)))
    found = {m["term"] for m in qmeta}
    terms = [dict(m, boost=float(parsed.get(m["term"], 1.0)))
             for m in qmeta]
    est = sum(m["df"] for m in qmeta)
    if not qmeta:
        route = "empty"
    elif est <= config.LOCAL_QUERY_MAX_POSTINGS:
        route = "local"
    else:
        route = "distributed"

    def _freshness(name: str) -> str:
        _, ver = index._artifact_key(name)
        if ver is None:
            return "absent"
        _, ver_post = index._artifact_key("postings")
        if ver_post is None or ver < ver_post:
            return "stale"
        return "fresh"

    report = {
        "query": query,
        "k": k,
        "terms": terms,
        "oov_terms": [t for t in toks if t not in found],
        "n_terms": len(terms),
        "est_postings": int(est),
        "route": route,
        "index": {
            "n_docs": index.n_docs,
            "avgdl": index.avgdl,
            "coll_len": index.coll_len,
            "codec": index.codec,
            "quantized": index.quantized,
            "docs_per_shard": index.docs_per_shard,
            "n_shards_max": -(-index.n_docs // index.docs_per_shard),
        },
        "deletions": index.has_deletions(),
        "artifacts": {
            "shard_stats": _freshness("shard_stats"),
            "postings_tier": _freshness("postings_tier"),
            "positions": _freshness("positions"),
        },
    }
    if with_shard_bounds and qmeta:
        from irkit_spark.operators.selective import shard_bounds
        report["shard_bounds"] = shard_bounds(index, qmeta)
    return report
