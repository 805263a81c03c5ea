"""Stream-stream interval join with watermarks — the §2.10 capability
the other streaming modules don't cover (dedupe/running totals are
stateful maps, windowed_event_counts is a single-stream agg; this is
TWO event streams joined on key + event-time range).

The shape: for every probe event (purchase), all build events (clicks)
of the same user within ``gap`` BEFORE it. With both sides watermarked
and the join condition bounding build-time from BOTH directions
(``probe_ts - gap <= build_ts <= probe_ts``), Spark can expire join
state: a click older than (watermark + gap) can never match a future
purchase and is dropped from the state store — bounded state on an
unbounded stream, which is the entire point of the watermark contract.

The same function works on BATCH frames (no watermark needed), where
Catalyst plans it as an equi join on the user with the range as a
post-join filter — that batch twin is the driver query
``attribution_window``, hash-checked against a plain DuckDB range
join, so the streaming semantics are anchored to an oracle.

Relation to ``operators/temporal.asof_join``: the as-of join keeps the
single LATEST build row per probe (union+window, no join); this keeps
ALL build rows in the window (genuine join, row multiplicity = window
occupancy). Attribution pipelines want both: as-of for last-touch,
interval for multi-touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    probe_type: str = "purchase",
    build_type: str = "click",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """(purchase_id, user_id, click_id, lag_us): every build event of
    the same user at most ``gap`` before (inclusive) each probe event.
    Works on a streaming events frame (stream-stream inner join,
    watermarked both sides, append output) and on a batch frame (same
    plan minus watermarks) — identical rows either way as long as no
    event is later than the watermark."""
    # parquet TIMESTAMP_NTZ: watermarks and interval arithmetic want
    # TIMESTAMP (same normalization as windowed_event_counts)
    ev = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    p = ev.where(F.col(type_col) == probe_type).select(
        F.col(user_col).alias("p_user"),
        F.col(ts_col).alias("p_ts"),
        F.col(id_col).alias("purchase_id"),
    )
    c = ev.where(F.col(type_col) == build_type).select(
        F.col(user_col).alias("c_user"),
        F.col(ts_col).alias("c_ts"),
        F.col(id_col).alias("click_id"),
    )
    if events.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    joined = p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts >= p_ts - interval {gap} "
            "AND c_ts <= p_ts"
        ),
        "inner",
    )
    return joined.select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("p_user").cast("long").alias("user_id"),
        F.col("click_id").cast("long").alias("click_id"),
        F.expr("timestampdiff(MICROSECOND, c_ts, p_ts)")
        .cast("long")
        .alias("lag_us"),
    )
