"""Watermarked stream-stream join: view -> click attribution.

The last Structured Streaming join shape the engine needed next to
stream-static enrich (windows.py consumers) and the stateful operators:
BOTH sides are unbounded streams, so the runtime must buffer each side's
recent rows in state and needs watermarks plus a time-range join
condition to know when a buffered view can never match a future click
and be evicted — without them, stream-stream state grows forever.
`view_click_attribution` attributes every click to the same user's
views in the preceding `horizon_s` seconds (the ad-tech / funnel
attribution shape; inner join, so results are exact and emission-safe
in append mode).

Scale shape: the join keys on user_id (high-cardinality, no skew) with
the time-range as a non-equi post-condition — Spark state-stores each
side partitioned by the equi key, so a user's buffered views never
leave one partition; state per side is bounded by watermark + horizon
(rows older than watermark - horizon are evicted). Batch-equivalence is
pinned in tests/test_streaming.py (an inner stream-stream join must
emit exactly the batch inequality-join result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTR_HORIZON_S = 1800


def view_click_attribution(
    events: DataFrame,
    horizon_s: int = ATTR_HORIZON_S,
    watermark: str = "1 hour",
) -> DataFrame:
    """Events (streaming or batch) -> (user_id, view_id, click_id,
    gap_s): every click joined to the same user's views at most
    horizon_s seconds earlier (inclusive both ends). Works identically
    on a batch DataFrame (watermarks are a no-op there) — the
    batch-equivalence test relies on exactly that."""
    # watermarks require an instant (TIMESTAMP, not NTZ): cast once up
    # front under the pinned-UTC session clock — every downstream use is
    # a comparison or difference, where the offset cancels (the
    # events.asof_join convention; layout.X_SQL documents the
    # non-difference trap)
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").cast("timestamp").alias("view_ts"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    if views.isStreaming:
        views = views.withWatermark("view_ts", watermark)
        clicks = clicks.withWatermark("click_ts", watermark)
    return (
        views.join(
            clicks,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (
                F.col("click_ts")
                <= F.col("view_ts") + F.expr(f"interval {horizon_s} seconds")
            ),
        )
        .select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "click_id",
            F.expr(
                "(unix_micros(click_ts) - unix_micros(view_ts))"
                " div 1000000"
            ).alias("gap_s"),
        )
    )


def view_click_attribution_outer(
    events: DataFrame,
    horizon_s: int = ATTR_HORIZON_S,
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER variant: every view emits — attributed clicks as in
    the inner join, and views with NO click within horizon_s emit
    (view_id, NULL click_id, NULL gap_s). In streaming this is the
    semantics only watermarks make possible: an unmatched view's NULL
    row may be emitted ONLY once the watermark passes view_ts +
    horizon (before that a matching click could still arrive, and
    append mode cannot retract) — Spark seals and emits it from the
    join state automatically, which is exactly the sessionize.py
    lesson applied to joins. Consequence the test pins: rows near the
    stream's end whose seal point the final watermark never reaches
    stay buffered (emitted as matches only if a click arrived), so a
    finite stream needs a watermark-advancing flush event to drain
    the tail — the documented operational contract of every
    append-mode outer join in production.

    State/scale shape is the inner join's: both sides partitioned by
    the user_id equi-key, per-side buffers evicted past watermark +
    horizon."""
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").cast("timestamp").alias("view_ts"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    if views.isStreaming:
        views = views.withWatermark("view_ts", watermark)
        clicks = clicks.withWatermark("click_ts", watermark)
    return (
        views.join(
            clicks,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (
                F.col("click_ts")
                <= F.col("view_ts") + F.expr(f"interval {horizon_s} seconds")
            ),
            "leftOuter",
        )
        .select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "click_id",
            F.expr(
                "(unix_micros(click_ts) - unix_micros(view_ts))"
                " div 1000000"
            ).alias("gap_s"),
        )
    )
