"""Structured Streaming extension (post-parity, SURVEY.md §2.C).

The reference is batch-only — no watermark/window/state code exists
anywhere in it — so none of this is parity-required; it is the extended
surface for the driver's ``events`` table: tumbling-window aggregation
with late-data watermarks, and session windows.

Scale design: watermark + windowed agg is Spark's canonical streaming
shape — state is bounded by (watermark horizon × key cardinality),
partial aggregation happens map-side, and state store updates shuffle on
(window, key). ``sessionize`` uses ``session_window`` (native since 3.2),
not a custom applyInPandasWithState loop, so state merging stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


_WINDOW_UNIT_SECS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _window_seconds(window: str) -> int | None:
    """`"1 hour"` → 3600; None for forms the fast path shouldn't handle."""
    parts = window.strip().lower().split()
    if len(parts) == 2 and parts[0].isdigit() and parts[1] in _WINDOW_UNIT_SECS:
        return int(parts[0]) * _WINDOW_UNIT_SECS[parts[1]]
    return None


def _with_event_time(events: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Attach a watermark, coercing the event-time column to TIMESTAMP (LTZ).

    Parquet written with isolated/NTZ timestamps surfaces as TIMESTAMP_NTZ,
    which Spark rejects as an event-time column
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); event time must be TIMESTAMP_LTZ.
    The cast reinterprets the same wall-clock instant under the session zone
    (UTC in our sessions), so window boundaries are unchanged.
    """
    field = events.schema[ts_col]
    if isinstance(field.dataType, T.TimestampNTZType):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.withWatermark(ts_col, watermark)


def stream_tumbling_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-type event counts in tumbling windows with late-data handling.

    Works identically on a batch DataFrame (for oracle checks) and a
    ``readStream`` DataFrame (watermark only takes effect when streaming).
    """
    if events.isStreaming:
        events = _with_event_time(events, ts_col, watermark)
    else:
        secs = _window_seconds(window)
        if secs is not None:
            # batch fast path: F.window materializes a (start, end)
            # struct per row before the aggregation; the equivalent
            # epoch-floor arithmetic (same epoch alignment) keeps the
            # grouping key a bare BIGINT bucket inside whole-stage
            # codegen, and the timestamp conversion runs on the
            # aggregated output (≤ groups rows), not per input row —
            # measured 0.53 → 0.43 (timestamp key, round 6) → 0.39 s
            # (bigint key) on 10 M events at sf10; the remaining cost is
            # per-row hash-agg probing on two keys, not job overhead
            # (BENCH_TUMBLING_ANATOMY_sf10.json: keyless scan+agg 0.12,
            # one key 0.27, two keys 0.39)
            # column API (not an F.expr SQL string): ts_col values that
            # need quoting/backticks keep working on the fast path
            # (round-11 self-review find #6); cast-truncation matches
            # the r6 path's semantics
            bucket = (F.unix_timestamp(F.col(ts_col)) / secs).cast("bigint")
            return (
                events.groupBy(bucket.alias("__bucket"), "event_type")
                .agg(
                    F.count("*").alias("n_events"),
                    F.round(F.sum("value"), 2).alias("sum_value"),
                )
                .select(
                    F.timestamp_seconds(
                        F.col("__bucket") * secs
                    ).alias("window_start"),
                    "event_type",
                    "n_events",
                    "sum_value",
                )
            )
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sliding_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping (sliding) window aggregation: each event contributes to
    window/slide consecutive windows. Spark's window() expands the event
    to its windows map-side, so partial aggregation still combines before
    the shuffle; streaming state is bounded by watermark × window count.
    """
    if events.isStreaming:
        events = _with_event_time(events, ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """User sessions via native session windows (gap-based).

    Returns one row per (user, session): start/end, event count, value sum.
    """
    if events.isStreaming:
        events = _with_event_time(events, ts_col, watermark)
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("s"), user_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    *,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    within_watermark: bool = True,
) -> DataFrame:
    """Drop duplicate deliveries of the same event (at-least-once sources).

    Streaming: state is the set of seen keys; ``within_watermark=True``
    uses ``dropDuplicatesWithinWatermark`` so a key's state is evicted
    once the watermark passes it — bounded state, the only safe mode for
    an unbounded key domain like event ids. With ``False`` the classic
    ``dropDuplicates`` keeps every key forever (use only for small key
    domains). Batch DataFrames just dedup (for oracle checks).

    Scale: one shuffle on the key; state store per key-partition; eviction
    makes state proportional to (event rate x watermark horizon), not to
    history length.
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    events = _with_event_time(events, ts_col, watermark)
    if within_watermark:
        return events.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def run_file_stream_demo(
    spark, src_dir: str, out_dir: str, checkpoint: str, spool_dir: str | None = None
) -> None:
    """End-to-end streaming smoke: file source → windowed agg → parquet sink.

    Uses availableNow trigger so it terminates after draining ``src_dir``.
    Nanosecond-timestamp parquet (which Spark's streaming source cannot
    read) is spooled once through the batch resolver to µs precision — the
    "fix it at ingest" step a real deployment would do in its writer.
    """
    import os

    from ..sources.resolver import SourceResolver

    resolver = SourceResolver(spark)
    # FileStreamSource requires a directory; single-file inputs (and
    # ns-timestamp parquet, which the streaming source cannot decode) are
    # spooled once through the batch resolver into a directory at µs
    # precision — the "fix it at ingest" step a real deployment's writer does.
    if os.path.isfile(src_dir) or resolver._nanos_columns(src_dir):
        import tempfile

        spool = spool_dir or tempfile.mkdtemp(prefix="psql_stream_spool_")
        resolver.resolve(src_dir).write.mode("overwrite").parquet(spool)
        src_dir = spool
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = stream_tumbling_counts(stream)
    (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    within: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time bound.

    Spark can only join two unbounded streams when it knows how long to
    buffer each side: both inputs carry a watermark and the join
    condition time-bounds the match (right event time within
    ``± within`` of the left's). State per side is then bounded by
    (rate × (watermark + within)) and evicted as the watermark advances —
    the canonical enrich-clicks-with-impressions shape. ``how`` may be
    ``inner``, ``left_outer``, or ``right_outer`` (outer rows emit once
    the watermark proves no match can arrive).

    Right-side columns (including its event time) come back suffixed with
    ``right_suffix``; join keys keep one unsuffixed copy. Batch inputs
    get the identical predicate (the oracle twin for differentials).
    """
    if left.isStreaming:
        left = _with_event_time(left, ts_col, watermark)
    if right.isStreaming:
        right = _with_event_time(right, ts_col, watermark)
    renamed = right.select(
        *[F.col(c).alias(c if c in on else f"{c}{right_suffix}") for c in right.columns]
    )
    lts, rts = F.col(ts_col), F.col(f"{ts_col}{right_suffix}")
    cond = (
        (rts >= lts - F.expr(f"INTERVAL {within}"))
        & (rts <= lts + F.expr(f"INTERVAL {within}"))
    )
    for k in on:
        cond = cond & (left[k] == renamed[k])
    joined = left.join(renamed, cond, how)
    # one unsuffixed copy of each join key: left's where it exists, else
    # the right's (right_outer rows have NULL left keys — taking only
    # left[k] would lose the right row's key values, ADVICE r5)
    return joined.select(
        *[
            F.coalesce(left[c], renamed[c]).alias(c) if c in on else left[c]
            for c in left.columns
        ],
        *[renamed[c] for c in renamed.columns if c not in on],
    )
