"""Event-time windowed aggregation with a watermark (late-data handling).

The reference has no event-time semantics (SURVEY.md §2.10); this is the
training-pipeline extension for event streams: tumbling event-time windows
with a watermark bounding state for late data. With
``Trigger.AvailableNow`` the same query is an incremental batch rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming (or batch) events → per-window per-type counts + value sum.

    Late rows beyond the watermark are dropped by the engine; window state
    is bounded accordingly. Output columns are flattened and integer-exact
    so the result is comparable across engines.
    """
    # parquet TIMESTAMP(isAdjustedToUTC=false) loads as TIMESTAMP_NTZ,
    # which watermarks reject — normalize to TIMESTAMP
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    windowed = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        windowed.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .alias("value_cents"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )
