"""Stateful streaming transformations.

Each function takes a streaming (or batch — the plans are identical)
DataFrame of `events`-shaped readings and returns a transformed
DataFrame; sinks live in .sinks. Late-data policy is explicit
everywhere: a watermark on ``ts`` and append-mode emission, so a
window's result is final once the watermark passes its end. The
reference never defined these semantics (SURVEY.md §2b row
'Streaming'); these are the engine's canonical definitions.

Scale notes: windowed/session aggregations shuffle on
(key, window) — state lives in the state store keyed the same way, so
a 1000-executor cluster partitions state horizontally. Watermarks
bound state size: state for windows older than the watermark is
evicted each micro-batch. Without the watermark the state store
grows without bound — that, not throughput, is what kills unbounded
streaming jobs at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_quality(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-sensor quality aggregate (the README's
    real-time monitoring goal, reference README.md:5).

    Append-mode compatible: emits each (sensor, window) exactly once,
    when the watermark passes window end. Rows arriving more than
    ``watermark`` after the newest seen event time are dropped —
    the engine's canonical late-data policy.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"),
            F.col("user_id").alias("sensor_id"),
        )
        .agg(
            F.count("*").alias("n_readings"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "sensor_id",
            "n_readings",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def sliding_quality(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window rolling average — each event lands in
    window/slide overlapping windows (the streaming analogue of the
    batch ``sensor_rolling_avg`` trend smoother). Carries BOTH window
    bounds like its tumbling/session siblings — consumers of
    overlapping windows especially need the end in-band (review
    finding: the schema was inconsistently start-only here)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("win"),
            F.col("user_id").alias("sensor_id"),
        )
        .agg(
            F.count("*").alias("n_readings"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "sensor_id",
            "n_readings",
            "avg_value",
        )
    )


def sessionized_activity(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows: activity bursts per sensor, closed after
    ``gap`` of silence. Dynamic-length state — the watermark is what
    lets Spark finalize and evict a session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("sess"),
            F.col("user_id").alias("sensor_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format("sess.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sess.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "sensor_id",
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate (event_id) deliveries within the watermark
    horizon — at-least-once Kafka delivery → effectively-once
    downstream. State holds only ids newer than the watermark, so
    memory is bounded by (horizon × arrival rate), not stream length.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def threshold_alerts(events: DataFrame, *, critical: float = 150.0) -> DataFrame:
    """Stateless alert filter (the README's 'cảnh báo' goal,
    reference README.md:6): readings at/above the critical band of
    ``sensor_quality_bands``. Narrow op — composes with any watermark
    upstream and the foreachBatch alert sink downstream."""
    return events.filter(F.col("value") >= critical).select(
        "event_id",
        F.col("user_id").alias("sensor_id"),
        "ts",
        "value",
        F.lit("critical").alias("severity"),
    )
