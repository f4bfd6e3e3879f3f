"""Event / query-log analytics over the `events` stream table
(event_id, ts, user_id, event_type, value, props).

A production search engine's other big table is its own query/click
log; the canonical analyses over it are time-bucketed load counts and
gap-based session segmentation (a 30-minute inactivity gap is the
standard search-session definition in the query-log literature).
Both are pure DataFrame windows/aggregations with exact DuckDB
oracles, and the tumbling-window aggregation has a Structured
Streaming form (watermark + window) that matches the batch result on
the same input.

Scale shape: window_counts is one groupBy((window, type)) — shuffle
bounded by bucket-count x type-count; sessionize is one shuffle by
user_id for the lag/cum-sum window plus the per-session aggregate on
the same partitioning (no second exchange: both window and groupBy
key on user_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(col_name: str) -> "F.Column":
    """Epoch microseconds of a TIMESTAMP_NTZ column, timezone-
    INDEPENDENT (unix_micros requires TIMESTAMP and an NTZ->TIMESTAMP
    cast shifts by the session zone; a timestampdiff against the NTZ
    epoch literal does not). Takes a column NAME (it must be
    resolvable in the expression parser)."""
    return F.expr(f"timestampdiff(MICROSECOND, "
                  f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col_name})")


def window_counts(events: DataFrame, window: str = "1 hour",
                  round_dp: int = 6) -> DataFrame:
    """(window_start, event_type, n_events, sum_value): tumbling-
    window event counts + value sums. Window starts are epoch-aligned
    (Spark F.window and DuckDB time_bucket agree)."""
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), round_dp).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def stream_window_counts(events: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours",
                         round_dp: int = 6) -> DataFrame:
    """The Structured Streaming form of window_counts: watermarked so
    state for closed windows is dropped (late events beyond the
    watermark are discarded — the standard completeness/latency
    trade). With an availableNow/complete run over a static input it
    produces exactly the batch window_counts rows (tested).

    Watermarks are defined only on instant-typed event time
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on TIMESTAMP_NTZ), so an NTZ
    ts is cast; under a UTC session zone — this engine's session
    contract, set in config.get_spark and the CLI — the cast is the
    identity on the underlying micros and the emitted windows equal
    the batch (NTZ) windows."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), round_dp).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_seq, n_events, session_start, session_end,
    duration_us): gap-based sessions per user — a new session starts
    at the first event and whenever the inactivity gap STRICTLY
    exceeds `gap_minutes`. Event order within a user is (ts, event_id)
    — fully deterministic under timestamp ties."""
    if gap_minutes < 1:
        raise ValueError("gap_minutes must be >= 1")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    wc = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (events
            .withColumn("__prev", F.lag("ts").over(w))
            .withColumn("__brk", F.when(
                F.col("__prev").isNull()
                | ((epoch_us("ts") - epoch_us("__prev")) > gap_us),
                1).otherwise(0))
            .withColumn("session_seq", F.sum("__brk").over(wc))
            .groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"))
            .withColumn("duration_us",
                        epoch_us("session_end")
                        - epoch_us("session_start")))


def funnel(events: DataFrame, stages: list[str]) -> DataFrame:
    """Ordered funnel analysis (the classic event-log op): how many
    users reach each stage IN ORDER — a user counts for stage i when
    they have a stages[i] event at a timestamp STRICTLY after the
    timestamp that qualified them for stage i-1 (strict ordering, so
    one event can never satisfy two stages; the qualifying timestamp
    is the earliest valid one, which maximizes downstream matches —
    the standard greedy funnel semantics). Returns (stage, event_type,
    n_users), stage ascending 0-based.

    Scale shape: one filter + min-aggregate per stage keyed by
    user_id (len(stages) small, each a partial aggregate) and a join
    against the previous stage's (user, ts) — shuffles carry (long,
    long) pairs only, never event payloads. Each stage's qualifier
    table is persisted and materialized by its own count, so the
    events table is scanned once PER STAGE, not once per stage pair
    (the naive chained-lineage form is O(stages^2) scans)."""
    if not stages:
        raise ValueError("stages must be non-empty")
    out_rows = []
    prev = None
    for i, s in enumerate(stages):
        cur = events.filter(F.col("event_type") == s) \
            .select("user_id", "ts")
        if prev is not None:
            cur = (cur.join(prev.select("user_id",
                                        F.col("_qt").alias("_pt")),
                            "user_id")
                   .filter(F.col("ts") > F.col("_pt"))
                   .select("user_id", "ts"))
        nxt = cur.groupBy("user_id").agg(F.min("ts").alias("_qt")) \
            .persist()
        out_rows.append((i, s, nxt.count()))    # materializes nxt
        if prev is not None:
            prev.unpersist()
        prev = nxt
    if prev is not None:
        prev.unpersist()
    spark = events.sparkSession
    return spark.createDataFrame(
        out_rows, "stage long, event_type string, n_users long")


def props_stats(events: DataFrame, key: str = "k",
                round_dp: int = 6) -> DataFrame:
    """(event_type, n_events, sum_key, avg_value): per-type aggregate
    over a JSON field extracted from `props` — the semi-structured
    column surface (Spark get_json_object == DuckDB json_extract).
    One codegen'd scan + one small groupBy."""
    kv = F.get_json_object(F.col("props"), f"$.{key}").cast("long")
    return (events.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum(kv).cast("long").alias("sum_key"),
                 F.round(F.avg("value"), round_dp).alias("avg_value")))


def retention(events: DataFrame) -> DataFrame:
    """Cohort retention (the classic product-analytics triangle):
    users are cohorted by the UTC day of their first event; for every
    (cohort_day, day offset) the count of cohort users active on that
    offset day. Returns (cohort_day, day_offset, n_users) with
    cohort_day as EPOCH DAYS (long) — the repo's portable-time rule:
    date/timestamp objects coerce differently per engine on the
    driver's hash path, integers never do. Offset 0 = the cohort day.

    Scale shape: one (user_id -> first ts) partial min-aggregate, one
    pair-only join back, one distinct-count groupBy keyed by
    (cohort, offset, user) then (cohort, offset) — shuffles carry
    (long, date, int) tuples, never event payloads."""
    first = (events.groupBy("user_id")
             .agg(F.min("ts").alias("_ft")))
    joined = (events.select("user_id", "ts")
              .join(first, "user_id")
              .select(F.datediff(F.to_date("_ft"), F.lit("1970-01-01"))
                      .cast("long").alias("cohort_day"),
                      F.datediff(F.to_date("ts"), F.to_date("_ft"))
                      .cast("long").alias("day_offset"),
                      "user_id"))
    return (joined.distinct()
            .groupBy("cohort_day", "day_offset")
            .agg(F.count("*").cast("long").alias("n_users")))
