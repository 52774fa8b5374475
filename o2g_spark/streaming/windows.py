"""Time-window aggregations over event streams (B16).

All built on ``F.window`` / ``F.session_window`` — Catalyst's native
windowed-aggregation operators, which run identically over batch
DataFrames and Structured Streaming sources (plus watermarking in the
streaming case). No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    extra_keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts + value stats per event_type.

    Output columns are flattened (window_start, window_end) so the
    result is oracle-comparable (DuckDB time_bucket).
    """
    w = F.window(F.col(ts_col), window)
    return (
        events.groupBy(w.alias("w"), *extra_keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *extra_keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide
    overlapping windows)."""
    w = F.window(F.col(ts_col), window, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (F.session_window — stateful in streaming, plain agg in
    batch)."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(w.alias("w"), user_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_tumbling_counts(
    stream: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
) -> DataFrame:
    """True Structured Streaming variant: watermarked tumbling counts.

    Late rows beyond ``watermark`` are dropped and window state is
    evicted — the bounded-state shape required for an unbounded
    100 TB/day stream. Caller attaches the sink:

        q = (stream_tumbling_counts(spark.readStream.format("rate")...)
             .writeStream.outputMode("append").format("memory")...)
    """
    if not stream.isStreaming:
        raise ValueError("stream_tumbling_counts expects a streaming DataFrame")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )
