"""Event/query-log analytics (pipeline/events.py): window counts and
sessions vs brute-force pandas references, the Structured Streaming
windowed form == the batch form on the same input, epoch_us
timezone-independence, guards."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from irkit_spark.pipeline.events import (epoch_us, sessionize,
                                         stream_window_counts,
                                         window_counts)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, BASE + dt.timedelta(seconds=s), u, t, float(v))
         for i, (s, u, t, v) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double")


@pytest.fixture(scope="module")
def events(spark):
    # 3 users, 2 types, spans 3 hours with idle gaps
    rows = []
    for u in range(3):
        for j in range(40):
            s = u * 7 + j * 200 + (1800 * (j // 15))   # gaps at j=15,30
            rows.append((s, u, "query" if j % 3 else "click",
                         (u + 1) * j * 0.25))
    return _mk_events(spark, rows), rows


def test_window_counts_matches_reference(events):
    ev, rows = events
    want = {}
    for i, (s, u, t, v) in enumerate(rows):
        start = BASE + dt.timedelta(
            hours=int((s // 3600)))
        key = (start, t)
        c, sv = want.get(key, (0, 0.0))
        want[key] = (c + 1, sv + v)
    want = {k: (c, round(sv, 6)) for k, (c, sv) in want.items()}
    got = {(r["window_start"], r["event_type"]):
           (r["n_events"], r["sum_value"])
           for r in window_counts(ev, "1 hour").collect()}
    assert got == want and len(got) > 2


def test_sessionize_matches_reference(events):
    ev, rows = events
    per_user: dict[int, list[tuple[int, int]]] = {}
    for i, (s, u, t, v) in enumerate(rows):
        per_user.setdefault(u, []).append((s, i))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        seq, start, last, n = 0, None, None, 0
        for s, _ in evs:
            if last is None or (s - last) * 1_000_000 > 30 * 60 * 1e6:
                if start is not None:
                    want[(u, seq)] = (n, start, last - start)
                seq, start, n = seq + 1, s, 0
            n += 1
            last = s
        want[(u, seq)] = (n, start, last - start)
    got = {(r["user_id"], r["session_seq"]):
           (r["n_events"],
            int((r["session_start"] - BASE).total_seconds()),
            r["duration_us"] // 1_000_000)
           for r in sessionize(ev, 30).collect()}
    assert got == want
    assert max(seq for _, seq in got) >= 2      # the gaps made sessions


def test_session_boundary_is_strict(spark):
    # exactly 30 minutes apart = SAME session; 30min + 1us = new one
    ev = _mk_events(spark, [(0, 1, "q", 0), (1800, 1, "q", 0)])
    assert sessionize(ev, 30).count() == 1
    ev2 = spark.createDataFrame(
        [(0, BASE, 1, "q", 0.0),
         (1, BASE + dt.timedelta(minutes=30, microseconds=1),
          1, "q", 0.0)],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double")
    assert sessionize(ev2, 30).count() == 2


def test_streaming_window_counts_equals_batch(spark, events, tmp_path):
    ev, _ = events
    src = str(tmp_path / "ev_src")
    out = str(tmp_path / "ev_sink")
    chk = str(tmp_path / "ev_chk")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (stream_window_counts(stream, "1 hour")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", chk)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"], r["event_type"]):
           (r["n_events"], r["sum_value"])
           for r in spark.read.parquet(out).collect()}
    want_all = {(r["window_start"], r["event_type"]):
                (r["n_events"], r["sum_value"])
                for r in window_counts(ev, "1 hour").collect()}
    # append mode only emits windows CLOSED by the watermark; every
    # emitted window must match the batch result exactly, and all but
    # the open tail must be present
    assert got and all(want_all[k] == v for k, v in got.items())
    open_cut = max(ws for ws, _ in want_all)
    missing = {k for k in want_all if k not in got}
    assert all(ws >= open_cut - dt.timedelta(hours=2)
               for ws, _ in missing)


def test_epoch_us_timezone_independent(spark, events):
    ev, _ = events
    tz = spark.conf.get("spark.sql.session.timeZone")
    a = ev.select(epoch_us("ts").alias("us")).agg(
        F.sum("us")).collect()[0][0]
    try:
        spark.conf.set("spark.sql.session.timeZone",
                       "America/New_York")
        b = ev.select(epoch_us("ts").alias("us")).agg(
            F.sum("us")).collect()[0][0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert a == b


def test_guards(events):
    ev, _ = events
    with pytest.raises(ValueError, match="gap_minutes"):
        sessionize(ev, 0)


def test_streaming_sessionize(spark, events, tmp_path):
    """The stateful streaming sessionizer emits value-exact subsets of
    the batch sessionization: every emitted session appears verbatim
    in sessionize()'s output, every non-final session (its closing
    event arrives in-stream) is emitted, and the event-time timeout
    flushes idle users once the watermark passes their gap."""
    from irkit_spark.pipeline.events import sessionize
    from irkit_spark.streaming.stateful import streaming_sessionize

    ev, _ = events
    ev_ts = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {}
    for r in sessionize(ev, 30).collect():
        batch.setdefault(r["user_id"], []).append(
            (int((r["session_start"] - BASE).total_seconds()),
             r["n_events"], r["duration_us"]))
    for u in batch:
        batch[u].sort()
    # two chronological micro-batches (split at the median epoch)
    mid = ev_ts.select(F.unix_micros("ts").alias("us")) \
        .approxQuantile("us", [0.5], 0.0)[0]
    src = str(tmp_path / "sess_src")
    ev_ts.filter(F.unix_micros("ts") <= mid).coalesce(1) \
        .write.parquet(src + "/b1")
    ev_ts.filter(F.unix_micros("ts") > mid).coalesce(1) \
        .write.parquet(src + "/b2")
    stream = (spark.readStream.schema(ev_ts.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/b*")
              .withWatermark("ts", "0 seconds"))
    out = str(tmp_path / "sess_out")
    q = (streaming_sessionize(stream, 30)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "sess_chk"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {}
    for r in spark.read.parquet(out).collect():
        assert r["duration_us"] == int(
            (r["session_end"] - r["session_start"]).total_seconds()
            * 1_000_000)
        got.setdefault(r["user_id"], []).append(
            (int((r["session_start"] - BASE).total_seconds()),
             r["n_events"], r["duration_us"]))
    assert got, "nothing emitted"
    for u, sessions in got.items():
        for s in sessions:
            assert s in batch[u], (u, s)          # value-exact subset
    # every non-final session closes in-stream -> must be emitted
    for u, sessions in batch.items():
        for s in sessions[:-1]:
            assert s in got.get(u, []), (u, s)


def test_funnel_ordered_strict(spark):
    import datetime as dt
    from irkit_spark.pipeline.events import funnel
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1 completes in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2: click BEFORE view -> stops at stage 0 (view only)
        (2, t(5), "click"), (2, t(6), "view"),
        # user 3: view+click same order but purchase before click
        (3, t(1), "view"), (3, t(2), "purchase"), (3, t(3), "click"),
        # user 4: simultaneous view/click -> strict > rejects stage 1
        (4, t(7), "view"), (4, t(7), "click"),
        # user 5: never views
        (5, t(1), "purchase"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "{}") for i, (u, ts, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    got = {r.stage: (r.event_type, r.n_users)
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {0: ("view", 4), 1: ("click", 2), 2: ("purchase", 1)}
    import pytest as _pt
    with _pt.raises(ValueError):
        funnel(ev, [])


def test_props_stats_json_extraction(spark):
    from irkit_spark.pipeline.events import props_stats
    ev = spark.createDataFrame(
        [(0, None, 1, "a", 2.0, '{"k": 3}'),
         (1, None, 2, "a", 4.0, '{"k": 5}'),
         (2, None, 3, "b", 1.0, '{"j": 9}')],   # no k -> null, sum skips
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    got = {r.event_type: (r.n_events, r.sum_key, r.avg_value)
           for r in props_stats(ev).collect()}
    assert got == {"a": (2, 8, 3.0), "b": (1, None, 1.0)}


def test_retention_cohorts(spark):
    import datetime as dt
    from irkit_spark.pipeline.events import retention
    d = lambda day, h: dt.datetime(2024, 1, day, h)
    rows = [
        (1, d(1, 9)), (1, d(1, 15)),           # u1: day-1 cohort, d0 x2
        (1, d(3, 1)),                          # ... active offset 2
        (2, d(1, 23)), (2, d(2, 0)),           # u2: d0 and offset 1
        (3, d(2, 5)),                          # u3: day-2 cohort, d0
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, "view", 0.0, "{}") for i, (u, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    epoch = dt.date(1970, 1, 1)
    c1 = (dt.date(2024, 1, 1) - epoch).days
    c2 = (dt.date(2024, 1, 2) - epoch).days
    got = {(r.cohort_day, r.day_offset): r.n_users
           for r in retention(ev).collect()}
    assert got == {(c1, 0): 2, (c1, 1): 1, (c1, 2): 1, (c2, 0): 1}
