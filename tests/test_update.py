"""Document update / upsert (operators/update.py): update ==
tombstone-superseded + append-under-fresh-id. The updated index must
be value-identical to a fresh build over (old corpus + new versions,
same id assignment) with the superseded ids tombstoned; after
compact_index it must equal a fresh build over the latest version of
every url (score identity per url). Plus guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irkit_spark.operators.build import build_index
from irkit_spark.operators.compact import compact_index
from irkit_spark.operators.delete import delete_docs, read_deletions
from irkit_spark.operators.positions import (build_positions,
                                             phrase_search)
from irkit_spark.operators.query import Index, search
from irkit_spark.operators.update import update_index

VOCAB = ["red", "fox", "dog", "lazy", "jumps", "quick", "brown",
         "river", "stone", "cloud"]


def _text(d: int, n: int) -> str:
    return " ".join(VOCAB[(d * 7 + j * j + (j // 3)) % len(VOCAB)]
                    for j in range(n))


OLD = [(f"u{d:03d}", _text(d, 5 + (d * 13) % 40)) for d in range(60)]
# three replacements (one per shard at docs_per_shard=25 after dense
# assignment) + two adds; replacements introduce an unseen term
BATCH = [("u005", "glacier red fox river " + _text(105, 8)),
         ("u010", "glacier stone cloud " + _text(110, 12)),
         ("u015", "quick brown fox jumps glacier"),
         ("v900", "river stone glacier cloud red fox dog"),
         ("v901", _text(201, 20) + " glacier basin")]
QUERIES = ("red fox", "glacier river", "lazy dog jumps",
           "quick brown fox")


@pytest.fixture(scope="module")
def upd(spark, tmp_path_factory):
    """(updated_dir, old_dir, batch_df) with positions on both."""
    base = tmp_path_factory.mktemp("updidx")
    old_d, out_d = str(base / "old"), str(base / "upd")
    old_df = spark.createDataFrame(OLD, "url string, text string")
    build_index(spark, old_df, old_d, docs_per_shard=25, n_parts=4)
    build_positions(spark, old_df, old_d, n_parts=4)
    batch_df = spark.createDataFrame(BATCH, "url string, text string")
    m = update_index(spark, old_d, batch_df, out_d)
    assert m["n_added"] == 5 and m["n_superseded"] == 3
    assert m["n_new_terms"] >= 2        # glacier, basin
    return out_d, old_d, batch_df


def _hits(idx, q, mode="wand", k=30):
    return [(r["doc_id"], round(r["score"], 9)) for r in
            search(idx, q, k=k, mode=mode, local=False).collect()]


def test_update_matches_manual_tombstone_plus_append(spark, upd,
                                                     tmp_path):
    """Fresh build over (old corpus + new versions) under the SAME id
    assignment, with the superseded ids tombstoned, is value-identical
    on every query path — update is exactly delete+append."""
    out_d, old_d, batch_df = upd
    uidx = Index(spark, out_d)
    docs = uidx.docs
    nx = Index(spark, old_d).n_docs           # next_doc_id at update
    old_map = docs.filter(F.col("doc_id") < nx).select("url", "doc_id")
    new_map = (docs.filter(F.col("doc_id") >= nx)
               .select("url", "doc_id"))
    old_df = spark.createDataFrame(OLD, "url string, text string")
    union = (old_df.join(old_map, "url")
             .unionByName(batch_df.join(new_map, "url")))
    exp_d = str(tmp_path / "expected")
    build_index(spark, union, exp_d, docs_per_shard=25,
                doc_id_col="doc_id", n_parts=4)
    build_positions(spark, union, exp_d, doc_id_col="doc_id",
                    n_parts=4)
    sup = [r["doc_id"] for r in read_deletions(spark, out_d).collect()]
    assert len(sup) == 3
    delete_docs(spark, exp_d, doc_ids=sup)
    eidx = Index(spark, exp_d)
    assert (uidx.n_docs, uidx.coll_len) == (eidx.n_docs, eidx.coll_len)
    for q in QUERIES:
        for mode in ("taat", "wand", "maxscore", "and"):
            assert _hits(uidx, q, mode) == _hits(eidx, q, mode), \
                (q, mode)
    for ph in ("red fox", "glacier basin"):
        a = [tuple(r) for r in phrase_search(uidx, ph, 10).collect()]
        b = [tuple(r) for r in phrase_search(eidx, ph, 10).collect()]
        assert a == b


def test_superseded_docs_gone_new_docs_found(spark, upd):
    out_d, old_d, _ = upd
    uidx = Index(spark, out_d)
    sup = {r["doc_id"] for r in read_deletions(spark, out_d).collect()}
    urls = dict(uidx.docs.select("doc_id", "url").collect())
    for q in QUERIES:
        assert not {d for d, _ in _hits(uidx, q)} & sup, q
    hit_urls = {urls[d] for d, _ in _hits(uidx, "glacier river", k=20)}
    assert {"u005", "u010", "v900"} <= hit_urls
    # the OLD version's phrase is gone, the new one's is findable
    old_hits = {r["doc_id"] for r in
                phrase_search(uidx, "glacier basin", 10).collect()}
    assert old_hits and old_hits.isdisjoint(sup)


def test_update_frozen_stats_until_compact(spark, upd):
    """Superseded docs still count in n_docs/avgdl (delete contract);
    compact recomputes."""
    out_d, old_d, _ = upd
    uidx, oidx = Index(spark, out_d), Index(spark, old_d)
    assert uidx.n_docs == oidx.n_docs + 5
    assert uidx.coll_len > oidx.coll_len


def test_update_compact_equals_fresh_latest(spark, upd, tmp_path):
    """update + compact == fresh build over the latest version of
    every url (value identity per url; ids differ)."""
    out_d, _, batch_df = upd
    comp = str(tmp_path / "comp")
    compact_index(spark, out_d, comp)
    latest = [(u, t) for u, t in OLD
              if u not in {b[0] for b in BATCH}] + BATCH
    fresh = str(tmp_path / "fresh")
    build_index(spark, spark.createDataFrame(
        latest, "url string, text string"), fresh,
        docs_per_shard=25, n_parts=4)
    cidx, fidx = Index(spark, comp), Index(spark, fresh)
    assert (cidx.n_docs, cidx.coll_len) == (fidx.n_docs, fidx.coll_len)
    cu = dict(cidx.docs.select("doc_id", "url").collect())
    fu = dict(fidx.docs.select("doc_id", "url").collect())
    for q in QUERIES:
        a = sorted((cu[d], s) for d, s in _hits(cidx, q, k=100))
        b = sorted((fu[d], s) for d, s in _hits(fidx, q, k=100))
        assert a == b and a, q
    # terms identical by string after compaction
    key = lambda i: sorted((r["term"], int(r["df"]), int(r["cf"]))
                           for r in i.terms.collect())
    assert key(cidx) == key(fidx)


def test_sequential_updates_latest_wins(spark, upd, tmp_path):
    """A second update replacing a doc ADDED by the first keeps only
    the newest version."""
    out_d, _, _ = upd
    out2 = str(tmp_path / "upd2")
    batch2 = spark.createDataFrame(
        [("v900", "volcano ridge " + _text(300, 10)),
         ("u005", "volcano glacier red fox")],
        "url string, text string")
    m = update_index(spark, out_d, batch2, out2)
    assert m["n_added"] == 2
    # u005: original + round-1 version; v900: round-1 version = 3
    assert m["n_superseded"] == 3
    idx = Index(spark, out2)
    urls = dict(idx.docs.select("doc_id", "url").collect())
    hits = {urls[d] for d, _ in _hits(idx, "volcano", k=10)}
    assert hits == {"v900", "u005"}
    # exactly one LIVE doc per updated url
    dels = {r["doc_id"] for r in read_deletions(spark, out2).collect()}
    live = [(d, u) for d, u in urls.items() if d not in dels]
    from collections import Counter
    dup = {u for u, c in Counter(u for _, u in live).items() if c > 1}
    assert not dup
    from irkit_spark.operators.validate import verify_index
    r = verify_index(spark, out2)
    assert r["ok"] and r["checks"]["deletions_consistent"]["ok"], r


def test_update_explicit_doc_ids(spark, tmp_path):
    old_d, out_d = str(tmp_path / "o"), str(tmp_path / "u")
    df = spark.createDataFrame(OLD[:20], "url string, text string")
    build_index(spark, df, old_d, docs_per_shard=25, n_parts=2)
    batch = spark.createDataFrame(
        [("u003", "comet dust red fox", 20), ("w100", "comet tail", 21)],
        "url string, text string, new_id long")
    update_index(spark, old_d, batch, out_d, doc_id_col="new_id")
    idx = Index(spark, out_d)
    got = {r["url"]: r["doc_id"] for r in
           idx.docs.filter("doc_id >= 20").collect()}
    assert got == {"u003": 20, "w100": 21}
    hits = {d for d, _ in _hits(idx, "comet", k=5)}
    assert hits == {20, 21}


def test_update_guards(spark, tmp_path):
    old_d = str(tmp_path / "g")
    df = spark.createDataFrame(OLD[:20], "url string, text string")
    build_index(spark, df, old_d, docs_per_shard=25, n_parts=2)
    batch = spark.createDataFrame([("u001", "x y z")],
                                  "url string, text string")
    with pytest.raises(ValueError, match="differ"):
        update_index(spark, old_d, batch, old_d)
    with pytest.raises(ValueError, match="duplicate"):
        update_index(spark, old_d, spark.createDataFrame(
            [("u001", "a"), ("u001", "b")], "url string, text string"),
            str(tmp_path / "d"))
    with pytest.raises(ValueError, match="empty"):
        update_index(spark, old_d, batch.limit(0),
                     str(tmp_path / "e"))
    with pytest.raises(ValueError, match="distinct, non-null"):
        update_index(spark, old_d, spark.createDataFrame(
            [("u001", "a", 3)], "url string, text string, nid long"),
            str(tmp_path / "f"), doc_id_col="nid")
    qd = str(tmp_path / "q")
    build_index(spark, df, qd, docs_per_shard=25, n_parts=2,
                quantize=True)
    with pytest.raises(ValueError, match="quantized"):
        update_index(spark, qd, batch, str(tmp_path / "qq"))
