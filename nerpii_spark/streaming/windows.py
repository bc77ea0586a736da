"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.2: no streams anywhere in
nerpii), so streaming here is the incremental-ingest path the north_rule
checkpoint/resume story implies: the SAME DataFrame transformations run
over `readStream` sources — windowed aggregation with watermarks for the
events feed, and the S1/S2 page operators (pandas-UDF clean + mapInPandas
detect) compose unchanged on a streaming DataFrame
(tests/test_streaming.py proves batch/stream result equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type. Works on batch
    and streaming inputs alike; pass `watermark` on streams to bound state
    (late rows beyond it are dropped)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value_c",
        )
    )


def stream_events_from_dir(spark, path: str) -> DataFrame:
    """File-source stream over an events parquet directory (the local
    stand-in for a Kafka/Kinesis feed)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
