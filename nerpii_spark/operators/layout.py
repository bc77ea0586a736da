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

from pyspark.sql import DataFrame, Window
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


# ---------------------------------------------------------------------------
# table maintenance: manifest pruning audit, small-file compaction,
# snapshot retention — the Iceberg housekeeping jobs a checkpointed
# pipeline schedules around its data (SURVEY §2's materialize stage).
# ---------------------------------------------------------------------------

# fixed predicate workload for the pruning audit: (pred_id, xlo, xhi,
# ylo, yhi) half-open boxes over the NORMALIZED (time, user) key space
# (each axis min/max-scaled to 0..65535, so bands are fractions of the
# observed span at every sf). p1/p2 constrain one dimension, p3-p6
# both — the case Z-order exists for.
PRUNE_PREDS: list[tuple[int, int, int, int, int]] = [
    (1, 16384, 32768, 0, 65536),
    (2, 0, 65536, 0, 16384),
    (3, 16384, 32768, 0, 16384),
    (4, 49152, 65536, 49152, 65536),
    (5, 0, 8192, 0, 8192),
    (6, 32768, 36864, 16384, 24576),
]

TIME_FILE_WIDTH = 256  # time-only layout: 65536-wide x axis / 256 files

# raw epoch minutes (timezone-free; the un-wrapped form of X_SQL)
EPMIN_SQL = {
    "spark": f"({_SPARK_EPOCH_S} div 60)",
    "duck": "((epoch_ms(ts) // 1000) // 60)",
}


def prune_dims_sql(dialect: str, rel: str = "events") -> str:
    """Normalized audit dimensions -> `select x, y from ...`: time
    minutes and user_id each min/max-scaled to the full 16-bit Morton
    domain. Raw user ids occupy a tiny prefix of 0..65535 (150 users at
    sf0.01), so the top interleave bits would never differentiate them
    and bucket bounding boxes would span the whole axis — normalization
    is what makes min/max skipping measurable, exactly the reason
    OPTIMIZE ZORDER BY clusters on range-partitioned rank, not raw
    values. The min/max pass is one 4-number scalar agg broadcast back
    via cross join; `greatest(span, 1)` guards the degenerate
    single-value axis."""
    div = "div" if dialect == "spark" else "//"
    ep = EPMIN_SQL[dialect]
    return f"""
  select cast((t - tmn) * 65535 {div} greatest(tmx - tmn, 1) as bigint) as x,
         cast((u - umn) * 65535 {div} greatest(umx - umn, 1) as bigint) as y
  from (select {ep} as t, user_id as u from {rel}) raw
  cross join (
    select min({ep}) as tmn, max({ep}) as tmx,
           min(user_id) as umn, max(user_id) as umx
    from {rel}
  ) b
"""


def manifest_prune_sql(dialect: str, rel: str = "events") -> str:
    """File-skipping effectiveness audit -> one row per (layout,
    pred_id): (files_total, files_scanned, rows_scanned). Simulates the
    manifest min/max pruning an Iceberg/Delta reader performs, under
    TWO physical layouts of the same rows — 'zorder' (files = 256
    Morton-key ranges over the normalized dims, see prune_dims_sql)
    and 'time' (files = 256 time-axis ranges, the naive layout) —
    against the fixed PRUNE_PREDS box workload. A file is scanned iff
    its (min_x..max_x, min_y..max_y) bounding box intersects the
    predicate box; the audit certifies WHY the Z-order writer exists:
    time-partitioned files span the full user axis, so user-constrained
    predicates (p2-p6) skip nothing there while the Morton layout
    bounds both axes per file (256 buckets = a 16x16 grid, each file
    box <= 4096 on each side).

    Scale shape: per-file stats are one map-side-combined agg per
    layout (256 rows each at any corpus size — file count, not row
    count) plus one 4-number min/max scalar agg for normalization; the
    predicate join is a constant 6-row broadcast cross join over those
    512 stat rows; the final agg folds 3072 rows. Nothing row-scale
    ever shuffles."""
    div = "div" if dialect == "spark" else "//"
    z = zorder_sql(dialect, "x", "y")
    vals = ", ".join(f"({p}, {a}, {b}, {c}, {d})"
                     for p, a, b, c, d in PRUNE_PREDS)
    preds = (
        f"select * from values {vals} as p(pred_id, xlo, xhi, ylo, yhi)"
        if dialect == "spark"
        else f"select * from (values {vals}) p(pred_id, xlo, xhi, ylo, yhi)"
    )
    return f"""
with d as (
{prune_dims_sql(dialect, rel)}
),
files as (
  select 'zorder' as layout,
         cast({z} {div} {1 << (32 - N_BUCKETS_BITS)} as bigint) as file_id,
         cast(count(*) as bigint) as n_rows,
         min(x) as min_x, max(x) as max_x,
         min(y) as min_y, max(y) as max_y
  from d group by 1, 2
  union all
  select 'time' as layout,
         cast(x {div} {TIME_FILE_WIDTH} as bigint) as file_id,
         cast(count(*) as bigint) as n_rows,
         min(x) as min_x, max(x) as max_x,
         min(y) as min_y, max(y) as max_y
  from d group by 1, 2
),
preds as ({preds})
select layout, cast(pred_id as bigint) as pred_id,
       cast(count(*) as bigint) as files_total,
       cast(sum(case when min_x < xhi and max_x >= xlo
                      and min_y < yhi and max_y >= ylo
                then 1 else 0 end) as bigint) as files_scanned,
       cast(sum(case when min_x < xhi and max_x >= xlo
                      and min_y < yhi and max_y >= ylo
                then n_rows else 0 end) as bigint) as rows_scanned
from files cross join preds
group by layout, pred_id
"""


def compaction_plan(
    files: DataFrame, target_bytes: int, solo_base: int = 1 << 20
) -> DataFrame:
    """Small-file compaction (OPTIMIZE/rewrite_data_files) planner over
    a file manifest (part_col, file_id, bytes) -> one row per planned
    output file: (part, bin_id, n_files, bytes_total, kind). Files
    already >= target_bytes are left alone (kind='solo', bin_id =
    solo_base + file_id, disjoint from packed bins by construction);
    smaller files are packed per partition in file_id order by running
    size: bin = floor(cumulative-bytes-before / target) — the
    sequence-packing idiom (textstats.pack_sequences) applied to table
    maintenance. Guarantees (each file < target, so increments never
    skip a bin): every packed bin holds < 2*target bytes, and the
    cumulative bytes through every non-last bin k reach >= (k+1)*target
    — bins average exactly target; an individual non-last bin can
    undershoot it only by as much as its predecessor overshot
    (hypothesis found the [13x1, 38, 49, 1]@50 case where bin 1 holds
    49 — the property tests pin the TRUE cumulative invariant).

    Scale shape: the manifest is metadata (one row per FILE, ~1e6 rows
    for a 100 TB table at 128 MB files — driver-free but tiny for a
    shuffle); one window partitioned by the table partition column
    (bounded fan-in per partition), one map-side-combinable agg. The
    data files themselves are never read: planning is pure manifest
    arithmetic, exactly like Iceberg's bin-packing planner."""
    w = (
        Window.partitionBy("part")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    small = files.where(F.col("bytes") < target_bytes)
    packed = (
        small.withColumn(
            "cum_before",
            F.coalesce(F.sum("bytes").over(w), F.lit(0)).cast("bigint"),
        )
        .select(
            "part",
            F.expr(f"cum_before div {target_bytes}").alias("bin_id"),
            "bytes",
        )
        .groupBy("part", "bin_id")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("bytes_total"),
        )
        .withColumn("kind", F.lit("packed"))
    )
    solo = files.where(F.col("bytes") >= target_bytes).select(
        "part",
        (F.col("file_id") + solo_base).cast("bigint").alias("bin_id"),
        F.lit(1).cast("bigint").alias("n_files"),
        F.col("bytes").cast("bigint").alias("bytes_total"),
        F.lit("solo").alias("kind"),
    )
    return packed.unionByName(solo)


def duck_compaction_plan_sql(
    files_sql: str, target_bytes: int, solo_base: int = 1 << 20
) -> str:
    """DuckDB twin of compaction_plan (window sum cast per the HUGEINT
    trap; same running-sum bin arithmetic)."""
    return f"""
with manifest as ({files_sql}),
small as (
  select part, file_id, bytes,
         cast(coalesce(sum(bytes) over (
           partition by part order by file_id
           rows between unbounded preceding and 1 preceding
         ), 0) as bigint) as cum_before
  from manifest where bytes < {target_bytes}
)
select part, cum_before // {target_bytes} as bin_id,
       cast(count(*) as bigint) as n_files,
       cast(sum(bytes) as bigint) as bytes_total,
       'packed' as kind
from small group by 1, 2
union all
select part, cast(file_id + {solo_base} as bigint) as bin_id,
       cast(1 as bigint) as n_files,
       cast(bytes as bigint) as bytes_total,
       'solo' as kind
from manifest where bytes >= {target_bytes}
"""


SNAP_RETAIN_LAST = 5        # keep the newest N snapshots per table
SNAP_RETAIN_HOURS = 48      # ...plus anything younger than this


def snapshot_expiry_sql(dialect: str, rel: str = "events") -> str:
    """Snapshot-retention plan (expire_snapshots) -> one row per
    snapshot: (tbl, snap_ts, n_rows, rn, action). The snapshot log is
    derived deterministically from the event stream (one snapshot per
    (event_type, hour) — each table commit in a streaming sink's
    foreachBatch cadence); the policy is Iceberg's standard dual gate:
    keep the newest SNAP_RETAIN_LAST snapshots per table AND any
    snapshot within SNAP_RETAIN_HOURS of that table's head, expire the
    rest. Timestamps compare via the timezone-free integer epoch idiom
    (layout.X_SQL): field extraction on the Spark side, epoch_ms on
    DuckDB, so no session-timezone pin is load-bearing.

    Scale shape: the snapshot log is metadata (hours x tables, not
    rows); building it is one map-side-combined agg over the stream,
    then two window functions partitioned by table over the tiny log.
    The expire DELETE this plan drives touches only manifest entries."""
    if dialect == "spark":
        ep = (
            "(cast(datediff(cast(snap_ts as date), date '1970-01-01')"
            " as bigint) * 86400 + hour(snap_ts) * 3600"
            " + minute(snap_ts) * 60 + second(snap_ts))"
        )
        trunc = "date_trunc('hour', ts)"
    else:
        ep = "(epoch_ms(snap_ts) // 1000)"
        trunc = "date_trunc('hour', ts)"
    return f"""
with snaps as (
  select event_type as tbl, {trunc} as snap_ts,
         cast(count(*) as bigint) as n_rows
  from {rel} group by 1, 2
),
ranked as (
  select tbl, snap_ts, n_rows, {ep} as ep,
         row_number() over (partition by tbl order by snap_ts desc) as rn,
         max({ep}) over (partition by tbl) as head_ep
  from snaps
)
select tbl, snap_ts, n_rows, cast(rn as bigint) as rn,
       case when rn <= {SNAP_RETAIN_LAST}
              or ep >= head_ep - {SNAP_RETAIN_HOURS * 3600}
            then 'keep' else 'expire' end as action
from ranked
"""


# ---------------------------------------------------------------------------
# reshard movement plan: rendezvous (HRW) vs mod hashing
# (Thaler & Ravishankar 1998 — highest-random-weight hashing)
# ---------------------------------------------------------------------------

RESHARD_N = 16  # current shard count; the plan evaluates n -> n+1


def _hrw_exprs(dialect: str, key: str, n: int) -> tuple[str, str]:
    """(shard under n, shard under n+1) as argmax over per-shard hash
    weights. The weight list is built over a MATERIALIZED key column
    (h2 per element is cheap; the no-CSE rule applies to the key, not
    the lambda-free literal list).

    The weight is a DOUBLE h2: a single h2(key, s) is AFFINE in the
    salt — (v0 + (key%3037)*97*s) % M, an arithmetic progression with a
    step far below M — so across s = 1..n the LARGEST salt nearly
    always wins and "argmax" degenerates to "the newest shard takes
    everything" (measured: 2000/2000 keys moved). Re-hashing each
    weight through h2(., 9) multiplies by A ~ 1.1e9 and wraps mod M,
    scrambling the progression; the per-shard weights are then
    independent for practical purposes and the 1/(n+1) movement bound
    holds (pinned in pytest)."""
    from ..functions.hashing import sql_h2

    def arglist(m: int) -> str:
        return ", ".join(
            sql_h2(sql_h2(key, s + 1), 9) for s in range(m)
        )

    if dialect == "spark":
        return (
            f"cast(array_position(array({arglist(n)}),"
            f" array_max(array({arglist(n)}))) - 1 as bigint)",
            f"cast(array_position(array({arglist(n + 1)}),"
            f" array_max(array({arglist(n + 1)}))) - 1 as bigint)",
        )
    return (
        f"cast(list_position([{arglist(n)}],"
        f" list_aggregate([{arglist(n)}], 'max')) - 1 as bigint)",
        f"cast(list_position([{arglist(n + 1)}],"
        f" list_aggregate([{arglist(n + 1)}], 'max')) - 1 as bigint)",
    )


def reshard_plan(pages: DataFrame, n: int = RESHARD_N) -> DataFrame:
    """Key-movement audit for growing a sharded store from n to n+1
    shards — the decision input for partition-layout evolution at
    crawl scale, where every moved key is bytes rewritten: under mod
    hashing (shard = h % n) growing to n+1 moves ~n/(n+1) of ALL keys;
    under rendezvous/HRW hashing (shard = argmax_s h(key, s)) only the
    keys the NEW shard wins move — expected 1/(n+1) — and they can move
    ONLY INTO the new shard (per-key weights of surviving shards are
    unchanged, so a changed argmax must be won by the newcomer; that
    invariant is n_moved == n_moved_to_new, certified by the oracle and
    pinned in pytest).

    Plan: per-row codegen arithmetic (2n+3 chained int hashes over one
    materialized key) + ONE 2-row map-side-combined aggregate; no
    shuffle of keys, no join. Output: one row per scheme with exact
    movement counts and ppm."""
    from ..functions.hashing import sql_fullhash

    hrw_n, hrw_n1 = _hrw_exprs("spark", "__k", n)
    rows = (
        # fullhash, NOT strhash: the 12-char-prefix polynomial would
        # collapse every "https://site..." url to a handful of keys
        # (the documented strhash trap), gutting both schemes
        pages.select(F.expr(sql_fullhash("url", "spark")).alias("__k"))
        .select(
            F.expr(f"__k % {n}").alias("mod_n"),
            F.expr(f"__k % {n + 1}").alias("mod_n1"),
            F.expr(hrw_n).alias("hrw_n"),
            F.expr(hrw_n1).alias("hrw_n1"),
        )
    )
    agg = rows.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.expr(
            "cast(sum(case when mod_n != mod_n1 then 1 else 0 end)"
            " as bigint)"
        ).alias("mod_moved"),
        F.expr(
            f"cast(sum(case when mod_n != mod_n1 and mod_n1 = {n} then 1"
            " else 0 end) as bigint)"
        ).alias("mod_to_new"),
        F.expr(
            "cast(sum(case when hrw_n != hrw_n1 then 1 else 0 end)"
            " as bigint)"
        ).alias("hrw_moved"),
        F.expr(
            f"cast(sum(case when hrw_n != hrw_n1 and hrw_n1 = {n} then 1"
            " else 0 end) as bigint)"
        ).alias("hrw_to_new"),
    )
    return agg.selectExpr(
        f"stack(2,"
        f" 'mod', mod_moved, mod_to_new,"
        f" 'rendezvous', hrw_moved, hrw_to_new) as (scheme, n_moved,"
        " n_moved_to_new)",
        "n_keys",
    ).selectExpr(
        "scheme",
        "n_keys",
        "n_moved",
        "n_moved_to_new",
        "cast(n_moved * 1000000 div n_keys as bigint) as moved_ppm",
    )


def duck_reshard_plan_sql(pages_sql_duck: str, n: int = RESHARD_N) -> str:
    """DuckDB twin of reshard_plan (identical hash chain + argmax +
    movement arithmetic; first-position tie rule matches Spark's
    array_position)."""
    from ..functions.hashing import sql_fullhash

    hrw_n, hrw_n1 = _hrw_exprs("duck", "__k", n)
    return f"""
with p as (select {sql_fullhash('url', 'duck')} as __k
           from ({pages_sql_duck})),
r as (
  select __k % {n} as mod_n, __k % {n + 1} as mod_n1,
         {hrw_n} as hrw_n, {hrw_n1} as hrw_n1
  from p
),
a as (
  select cast(count(*) as bigint) as n_keys,
         cast(sum(case when mod_n != mod_n1 then 1 else 0 end) as bigint)
           as mod_moved,
         cast(sum(case when mod_n != mod_n1 and mod_n1 = {n} then 1
                  else 0 end) as bigint) as mod_to_new,
         cast(sum(case when hrw_n != hrw_n1 then 1 else 0 end) as bigint)
           as hrw_moved,
         cast(sum(case when hrw_n != hrw_n1 and hrw_n1 = {n} then 1
                  else 0 end) as bigint) as hrw_to_new
  from r
)
select scheme, n_keys, n_moved, n_moved_to_new,
       cast(n_moved * 1000000 // n_keys as bigint) as moved_ppm
from (
  select 'mod' as scheme, n_keys, mod_moved as n_moved,
         mod_to_new as n_moved_to_new from a
  union all
  select 'rendezvous', n_keys, hrw_moved, hrw_to_new from a
)
"""


# ---------------------------------------------------------------------------
# Hilbert-curve clustering key (4-state LUT, pure codegen)
# ---------------------------------------------------------------------------

# Derived by composing the classic xy2d rotation group (4 orientations)
# and verified exhaustively against the reference loop in pytest:
# COMB[state*4 + qd] = next_state*4 + digit, qd = 2*x_bit + y_bit.
HILBERT_COMB = (4, 1, 11, 2, 0, 15, 5, 6, 10, 9, 3, 12, 14, 7, 13, 8)
HILBERT_BITS = 16


def hilbert_py(x: int, y: int, bits: int = HILBERT_BITS) -> int:
    """Python mirror of hilbert_sql (the LUT machine)."""
    state = 0
    d = 0
    for i in range(bits - 1, -1, -1):
        qd = 2 * ((x >> i) & 1) + ((y >> i) & 1)
        code = HILBERT_COMB[state * 4 + qd]
        state, digit = code // 4, code % 4
        d = d * 4 + digit
    return d


def hilbert_sql(dialect: str, x: str, y: str, bits: int = HILBERT_BITS) -> str:
    """32-bit Hilbert key of two 16-bit dimensions as ONE scalar
    expression in whole-stage codegen — no HOF lambda, no UDF. The
    textbook xy2d loop has data-dependent rotations whose naive
    CASE-expression unrolling DOUBLES per level (the CollapseProject
    blowup documented at hearst_sql); instead the rotation group is
    precompiled into the 4-state HILBERT_COMB lookup table and each
    level is ONE array lookup referencing the previous level ONCE —
    the collapsed expression stays LINEAR in bits (16 lookups + 16
    digit terms). Sum terms are bigint-cast before the 4^k multiply
    (the ANSI int32-product trap).

    Hilbert beats Morton/Z-order on locality: every curve step is a
    unit grid step (no Z-jumps), so bucket bounding boxes are tighter
    — measured against zorder_stats in pytest."""
    body = ",".join(str(v) for v in HILBERT_COMB)
    if dialect == "spark":
        arr = f"array({body})"
        # element_at requires an INT index (a bigint index is a
        # DATATYPE_MISMATCH analysis error)
        el = lambda i: f"element_at({arr}, cast(({i}) + 1 as int))"
        div = "div"
    else:
        arr = f"[{body}]"
        el = lambda i: f"list_extract({arr}, ({i}) + 1)"
        div = "//"
    xs = f"(cast({x} as bigint) & {DIM_MASK})"
    ys = f"(cast({y} as bigint) & {DIM_MASK})"
    qd = lambda i: (
        f"((({xs} {div} {1 << i}) % 2) * 2 + (({ys} {div} {1 << i}) % 2))"
    )
    c_exprs = []
    prev = None
    for step, i in enumerate(range(bits - 1, -1, -1)):
        state = "0" if prev is None else f"(({prev}) {div} 4)"
        prev = el(f"{state} * 4 + {qd(i)}")
        c_exprs.append(prev)
    terms = [
        f"(cast(({c}) % 4 as bigint) * {4 ** (bits - 1 - s)})"
        for s, c in enumerate(c_exprs)
    ]
    return "(" + " + ".join(terms) + ")"


def hilbert_stats_sql(dialect: str, rel: str = "events") -> str:
    """Bucket-level pruning statistics of the Hilbert layout — the
    zorder_stats twin: (bucket, n_rows, min_x, max_x, min_y, max_y)
    over the same (minutes-since-epoch, user_id) dimensions, so the
    two layouts' bounding-box tightness is directly comparable."""
    div = "div" if dialect == "spark" else "//"
    h = hilbert_sql(dialect, "x", "y")
    return f"""
with d as (
  select {X_SQL[dialect]} as x, {Y_SQL} as y from {rel}
),
k as (
  select x, y, {h} as h from d
)
select cast(h {div} {1 << (32 - N_BUCKETS_BITS)} as bigint) as bucket,
       count(*) as n_rows,
       cast(min(x) as bigint) as min_x, cast(max(x) as bigint) as max_x,
       cast(min(y) as bigint) as min_y, cast(max(y) as bigint) as max_y
from k group by 1
"""


def hilbert_stats(events: DataFrame) -> DataFrame:
    """Spark side of hilbert_stats_sql (spark.sql over a temp view is
    avoided: build the same plan with expr columns)."""
    d = events.select(
        F.expr(X_SQL["spark"]).alias("x"), F.expr(Y_SQL).alias("y")
    )
    k = d.withColumn("h", F.expr(hilbert_sql("spark", "x", "y")))
    return (
        k.groupBy(
            F.expr(
                f"cast(h div {1 << (32 - N_BUCKETS_BITS)} as bigint)"
            ).alias("bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
    )
