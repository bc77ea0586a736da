"""Z-order (Morton) data layout — multi-dimensional clustering for
min/max file skipping.

The lakehouse problem this solves: partitioning prunes on ONE dimension;
a predicate on (time range AND user range) over data laid out by time
alone still scans every file. Interleaving the bits of both dimensions
into one sort key (the Z-order curve, the same layout OPTIMIZE ZORDER BY
applies in Delta/Iceberg compaction) bounds EVERY contiguous key range
to a small rectangle in (x, y) space, so per-file min/max statistics
prune on both dimensions at once.

Guarantee (by construction, asserted in tests and certified by the
DuckDB oracle): fixing the top 2k bits of the 32-bit z value fixes the
top k bits of each 16-bit dimension, so a bucket of 2^(32-2k)
consecutive z values covers at most a 2^(16-k) x 2^(16-k) rectangle —
e.g. 256 buckets (k=4) each span <= 1/16 of each dimension's range.

Scale shape: the z key is pure per-row bit arithmetic (whole-stage
codegen, no shuffle); laying out data is ONE repartitionByRange(z) —
the same single shuffle a one-dimensional sort would cost — and range
boundaries come from Spark's reservoir sampling of z, so skew in either
dimension cannot overload a writer task. The stats query shuffles only
(bucket, partial min/max) — 256 rows per map task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16-bit -> even bit positions of a 32-bit word (classic mask spread)
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]

N_BUCKETS_BITS = 8  # 256 buckets -> top 4 bits of each dimension fixed
DIM_MASK = 0xFFFF


def _shl(dialect: str, e: str, n: int) -> str:
    return f"shiftleft({e}, {n})" if dialect == "spark" else f"(({e}) << {n})"


def spread16_sql(dialect: str, x: str) -> str:
    """Interleave-ready spread: 16-bit int -> its bits at even positions
    of a 32-bit word. Valid Spark SQL and DuckDB SQL (int64 & | ops)."""
    # bigint up-cast: an int32 input (or literal) would overflow the
    # b30 << 1 step in engines with checked 32-bit shifts
    e = f"(cast({x} as bigint) & {DIM_MASK})"
    for n, mask in _SPREAD:
        e = f"((({e} | {_shl(dialect, e, n)})) & {mask})"
    return e


def zorder_sql(dialect: str, x: str, y: str) -> str:
    """32-bit Morton key of two 16-bit dimensions (y gets odd bits)."""
    return (
        f"({spread16_sql(dialect, x)} |"
        f" {_shl(dialect, spread16_sql(dialect, y), 1)})"
    )


# event-table dimensions: minutes since epoch (time axis) x user_id.
# ts is TIMESTAMP_NTZ; the Spark epoch is built from FIELD extractions
# (datediff/hour/minute/second), which are timezone-free on NTZ —
# unix_timestamp() would re-interpret the wall clock in the session
# timezone and silently shift the key under a non-UTC pin, while the
# DuckDB twin (epoch_ms on a naive timestamp) never does.
_SPARK_EPOCH_S = (
    "(cast(datediff(cast(ts as date), date '1970-01-01') as bigint) * 86400"
    " + hour(ts) * 3600 + minute(ts) * 60 + second(ts))"
)
X_SQL = {
    "spark": f"({_SPARK_EPOCH_S} div 60) % {DIM_MASK + 1}",
    # epoch() is a DOUBLE (cast would round half-up where field
    # extraction truncates); epoch_ms is exact integer milliseconds
    "duck": f"((epoch_ms(ts) // 1000) // 60) % {DIM_MASK + 1}",
}
Y_SQL = f"user_id % {DIM_MASK + 1}"


def zorder_stats_sql(dialect: str, rel: str = "events") -> str:
    """Bucket-level pruning statistics of the z-ordered layout:
    (bucket, n_rows, min_x, max_x, min_y, max_y). Certifies the
    rectangle bound: every bucket's (x, y) bounding box is at most
    2^(16-k) on each side for 2^(2k) buckets."""
    z = zorder_sql(dialect, X_SQL[dialect], Y_SQL)
    div = "div" if dialect == "spark" else "//"
    return f"""
with d as (
  select {X_SQL[dialect]} as x, {Y_SQL} as y, {z} as z from {rel}
)
select cast(z {div} {1 << (32 - N_BUCKETS_BITS)} as bigint) as bucket,
       count(*) as n_rows,
       cast(min(x) as bigint) as min_x, cast(max(x) as bigint) as max_x,
       cast(min(y) as bigint) as min_y, cast(max(y) as bigint) as max_y
from d group by 1
"""


def zorder_stats(events: DataFrame) -> DataFrame:
    """Spark side of zorder_stats_sql (same plan, DataFrame API)."""
    x = F.expr(X_SQL["spark"])
    y = F.expr(Y_SQL)
    z = F.expr(zorder_sql("spark", X_SQL["spark"], Y_SQL))
    d = events.select(x.alias("x"), y.alias("y"), z.alias("z"))
    return (
        d.groupBy(
            F.expr(f"cast(z div {1 << (32 - N_BUCKETS_BITS)} as bigint)").alias(
                "bucket"
            )
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
    )


def write_zordered(
    events: DataFrame, path: str, n_files: int = 16
) -> None:
    """Materialize the clustered layout: ONE range shuffle on z (range
    boundaries from reservoir-sampled z, so dimension skew cannot
    overload a writer), sorted within files so parquet page indexes
    stay tight. Downstream scans with predicates on EITHER dimension
    prune files via parquet min/max footers."""
    z = F.expr(zorder_sql("spark", X_SQL["spark"], Y_SQL))
    (
        events.withColumn("z", z)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )
