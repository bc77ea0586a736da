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


def windowed_user_hll_registers(
    events: DataFrame,
    window: str = "1 day",
    watermark: str | None = None,
) -> DataFrame:
    """Windowed distinct-user HLL state -> (window_start, event_type,
    j, rho): the mergeable 64-register sketch (operators/sketch.py)
    produced BY a streaming aggregation — register max IS the sketch's
    merge operation, so it is exactly the shape Structured Streaming
    can maintain incrementally (one stateful agg keyed by
    (window, type, register); state is bounded at 64 rows per open
    window x type regardless of user cardinality — the whole point vs
    a streaming count-distinct, whose state grows with users). The
    estimate is computed ON READ over the materialized register table
    (sketch.hll_estimate_from_registers), the lakehouse
    pre-aggregate-to-sketch-state pattern; registers from different
    shards/streams union and re-max losslessly."""
    from nerpii_spark.functions.hashing import sql_h1, sql_h2
    from nerpii_spark.operators.sketch import M_REGS, RHO_CAP, _rho_sql

    src = events.withWatermark("ts", watermark) if watermark else events
    w_expr = sql_h2(sql_h1("user_id", 5), 5)
    hs = src.select(
        F.col("ts"), F.col("event_type"), F.expr(w_expr).alias("w")
    ).select(
        "ts",
        "event_type",
        (F.col("w") % M_REGS).alias("j"),
        F.expr(_rho_sql(sql_h2("w", 7))).alias("r"),
    )
    return (
        hs.groupBy(F.window("ts", window).alias("win"), "event_type", "j")
        .agg(F.max("r").alias("rho"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "j",
            "rho",
        )
    )
