"""Event-log relational operators (batch; the streaming surface is
nerpii_spark/streaming/).

The as-of (attribution) join here is the time-series operator SURVEY
§2.2 notes the reference never needs (nerpii is batch-tabular, 500
rows); it is delivered as a training-/event-pipeline extra because
"latest prior touchpoint" enrichment is the standard event-log join and
a distributed engine must express it WITHOUT a per-user range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """For each `left_type` event, attach the most recent `right_type`
    event of the same user at or before its timestamp.
    -> (event_id, user_id, right_event_id nullable, gap_us nullable).

    Scale shape: the distributed as-of is a running `last(...,
    ignorenulls=True)` over ONE shuffle on user_id + one per-partition
    sort — no self-join, no per-user range scan (a naive range join is
    O(n_left x n_right) per user), no Python. The window's
    (unbounded, current) frame is computed incrementally during the
    sort-based window pass, so cost is linear in events per user, and
    user_id is a uniform high-cardinality key (no hot partition).

    Determinism: "at or before" is UNCONDITIONALLY inclusive — the sort
    key is (ts, is_right desc, event_id), so every right-type event at
    the probe's exact timestamp precedes it in the running frame
    regardless of event_id order (ASOF `p.ts >= c.ts` semantics, not
    just on data with unique (user_id, ts)). Among several right events
    tied on (user_id, ts) the max event_id wins (last in frame order);
    the oracle dedups its right side to the same representative, making
    the pair a total, engine-independent definition.

    The DuckDB oracle is deliberately a DIFFERENT algorithm (native
    ASOF JOIN) — the comparison cross-validates two independent
    implementations of the semantics.
    """
    ev = events.where(F.col("event_type").isin([left_type, right_type]))
    is_right = F.col("event_type") == right_type
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc(is_right.cast("int")), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r_id = F.last(
        F.when(is_right, F.col("event_id")), ignorenulls=True
    ).over(w)
    r_ts = F.last(F.when(is_right, F.col("ts")), ignorenulls=True).over(w)
    return (
        ev.withColumn("right_event_id", r_id)
        .withColumn("right_ts", r_ts)
        .where(F.col("event_type") == left_type)
        .select(
            "event_id",
            "user_id",
            F.col("right_event_id").cast("bigint").alias("right_event_id"),
            (
                # ts is TIMESTAMP_NTZ in the parquet; unix_micros needs
                # TIMESTAMP — safe here because the gap is a difference,
                # so the session-timezone offset cancels exactly
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("right_ts").cast("timestamp"))
            )
            .cast("bigint")
            .alias("gap_us"),
        )
    )


def duck_asof_sql(
    left_type: str = "purchase",
    right_type: str = "click",
    rel: str = "events",
) -> str:
    """Native-ASOF DuckDB twin of `asof_join`. The right side is deduped
    to max(event_id) per (user_id, ts) first so native ASOF (which picks
    an arbitrary row among equal c.ts) lands on the same representative
    the Spark window's frame order does — the tie rule that makes the
    inclusive semantics total."""
    return f"""
with p as (select * from {rel} where event_type = '{left_type}'),
     c as (select event_id, user_id, ts from (
         select event_id, user_id, ts,
                row_number() over (partition by user_id, ts
                                   order by event_id desc) as rn
         from {rel} where event_type = '{right_type}')
       where rn = 1)
select p.event_id, p.user_id,
       cast(c.event_id as bigint) as right_event_id,
       cast(epoch_us(p.ts) - epoch_us(c.ts) as bigint) as gap_us
from p asof left join c on p.user_id = c.user_id and p.ts >= c.ts
"""


INTERVAL_BUCKET_S = 3600


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_s: int = INTERVAL_BUCKET_S,
    end_inclusive: bool = True,
) -> DataFrame:
    """Interval-containment (range) join: attach to each left row the
    interval of the same key that contains its timestamp
    (start <= ts <= end, timestamps compared directly — no epoch math
    in the predicate). Pass `end_inclusive=False` for right-open
    intervals (start <= ts < end). Sessions from Spark's session_window
    are safe with the inclusive default: session_window MERGES an event
    arriving exactly `gap` after the previous one (measured —
    tests/test_extras.py::test_session_window_exact_gap_merges), so no
    event of the same key can sit at a FINAL session_end and the
    inclusive predicate never double-matches.
    Spark has no native range join; the naive
    formulation (equi on key + inequality on ts) degenerates to a
    per-key nested-loop scan. This is the banded rewrite: both sides
    are bucketed into fixed windows of `bucket_s` seconds — a point
    lands in exactly one bucket, an interval EXPLODES into every bucket
    it overlaps — so the join becomes a pure equi-join on
    (key, bucket) with the exact containment predicate as a cheap
    post-filter, and Catalyst plans a shuffled hash/sort-merge join,
    never a nested loop.

    Fan-out bound: an interval adds ceil(len/bucket_s)+1 rows — size
    bucket_s to the typical interval length (sessions here are
    30-minute-gap-bounded, so 1h buckets mean ~1-2 rows each). A point
    matching several overlapping intervals returns one row per match;
    with disjoint intervals (sessions) the match is unique without any
    dedup, because the point's single bucket occurs once per interval.
    """
    b = lambda c: f"(unix_timestamp(cast({c} as timestamp)) div {bucket_s})"
    lb = left.withColumn("_b", F.expr(b(ts_col)))
    iv = intervals.withColumn(
        "_b",
        F.explode(F.expr(f"sequence({b(start_col)}, {b(end_col)})")),
    )
    end_ok = (
        F.col(ts_col) <= F.col(end_col)
        if end_inclusive
        else F.col(ts_col) < F.col(end_col)
    )
    return (
        lb.join(iv, [key_col, "_b"])
        .where((F.col(ts_col) >= F.col(start_col)) & end_ok)
        .drop("_b")
    )


PCTS = (50, 90, 99)


def grouped_percentiles(
    events: DataFrame, ps: tuple[int, ...] = PCTS,
    group_col: str = "event_type", value_expr: str =
    "cast(round(value * 100) as bigint)",
) -> DataFrame:
    """Exact per-group percentiles (percentile_disc semantics: the
    smallest value whose cumulative count reaches ceil(p% of n)),
    computed the scale-correct way: the corpus collapses map-side into a
    per-group VALUE HISTOGRAM (groupBy (group, value) count), and the
    rank scan runs over distinct values only — reducer load is bounded
    by value cardinality per group, not rows per group, so a group with
    10^9 events and 10^4 distinct cents-values costs a 10^4-row window.
    A naive per-group sort (window over raw rows) would put every row of
    a hot group on one reducer.

    All arithmetic is bigint (`cum * 100 >= p * tot` is the exact
    integer form of cum >= ceil(p/100 * tot) because cum is integral),
    so duck_percentiles_sql() matches bit-for-bit.
    -> (group_col, n, p{p}_c ...)."""
    from pyspark.sql import Window as W

    h = (
        events.groupBy(
            group_col, F.expr(value_expr).alias("value_c")
        ).agg(F.count("*").alias("cnt"))
    )
    w_run = (
        W.partitionBy(group_col)
        .orderBy("value_c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy(group_col).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    h2 = h.withColumn("cum", F.sum("cnt").over(w_run)).withColumn(
        "tot", F.sum("cnt").over(w_all)
    )
    return h2.groupBy(group_col).agg(
        F.max("tot").cast("bigint").alias("n"),
        *[
            F.min(
                F.when(
                    F.col("cum") * 100 >= p * F.col("tot"),
                    F.col("value_c"),
                )
            )
            .cast("bigint")
            .alias(f"p{p}_c")
            for p in ps
        ],
    )


def duck_percentiles_sql(
    ps: tuple[int, ...] = PCTS, rel: str = "events",
    group_col: str = "event_type",
    value_expr: str = "cast(round(value * 100) as bigint)",
) -> str:
    picks = ", ".join(
        f"cast(min(case when cum * 100 >= {p} * tot then value_c end)"
        f" as bigint) as p{p}_c"
        for p in ps
    )
    return f"""
with h as (
  select {group_col}, {value_expr} as value_c,
         cast(count(*) as bigint) as cnt
  from {rel} group by 1, 2
),
c as (
  select {group_col}, value_c,
         cast(sum(cnt) over (partition by {group_col} order by value_c
              rows between unbounded preceding and current row)
           as bigint) as cum,
         cast(sum(cnt) over (partition by {group_col}) as bigint) as tot
  from h
)
select {group_col}, cast(max(tot) as bigint) as n, {picks}
from c group by 1
"""


# ---------------------------------------------------------------------------
# Integer z-score spike detection (per-user anomaly flagging)
# ---------------------------------------------------------------------------

def anomaly_events(
    events: DataFrame,
    k: int = 3,
    min_n: int = 8,
) -> DataFrame:
    """Per-user spike detection: flag events whose value deviates from
    the user's mean by more than ``k`` standard deviations — the
    event-log outlier report (fraud / telemetry-glitch triage), done
    with INTEGER sufficient statistics and no sqrt.

    The k-sigma test `(v - mean)^2 > k^2 * var` multiplies through by
    n^2 to stay in bigint::

        (n*v - S1)^2  >  k^2 * (n*S2 - S1^2)

    with v = cents-quantized value, S1 = sum(v), S2 = sum(v^2), n =
    count per user. Both sides are exact integers, so Spark and DuckDB
    agree bit-for-bit (no float variance, no libm).

    Scale shape: ONE shuffle on user_id — the whole-partition window
    computes (n, S1, S2) in the same pass that evaluates the filter; no
    groupBy + join-back (that shape shuffles the event stream twice).
    user_id is uniform high-cardinality, so no hot partition. Overflow
    bound (documented, asserted nowhere cheaper): |n*v| < 3e9 keeps the
    squared term in int64 — at 1e9 events/user re-quantize to coarser
    units or window the stats by time first.

    Users with fewer than ``min_n`` events are skipped (a 2-event user
    flags everything; variance needs support).
    """
    v = F.expr("cast(round(value * 100) as bigint)")
    w = W.partitionBy("user_id")
    df = events.select(
        "event_id", "user_id", v.alias("value_c"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(v).over(w).alias("s1"),
        F.sum(v * v).over(w).alias("s2"),
    )
    dev = df.n * df.value_c - df.s1
    lhs = dev * dev
    rhs = F.lit(k * k) * (df.n * df.s2 - df.s1 * df.s1)
    return (
        df.where((F.col("n") >= min_n) & (lhs > rhs))
        .select(
            "event_id", "user_id", "value_c",
            F.col("n").cast("bigint").alias("n"),
            lhs.cast("bigint").alias("dev2"),
            rhs.cast("bigint").alias("thr2"),
        )
    )


def duck_anomaly_sql(
    k: int = 3, min_n: int = 8, rel: str = "events"
) -> str:
    """DuckDB twin of :func:`anomaly_events` (same integer algebra;
    sum(bigint) -> HUGEINT, so every aggregate is cast back)."""
    return f"""
with s as (
  select event_id, user_id,
         cast(round(value * 100) as bigint) as value_c,
         cast(count(*) over w as bigint) as n,
         cast(sum(cast(round(value * 100) as bigint)) over w
              as bigint) as s1,
         cast(sum(cast(round(value * 100) as bigint)
                  * cast(round(value * 100) as bigint)) over w
              as bigint) as s2
  from {rel}
  window w as (partition by user_id)
)
select event_id, user_id, value_c, n,
       cast((n * value_c - s1) * (n * value_c - s1) as bigint) as dev2,
       cast({k * k} * (n * s2 - s1 * s1) as bigint) as thr2
from s
where n >= {min_n}
  and (n * value_c - s1) * (n * value_c - s1)
      > {k * k} * (n * s2 - s1 * s1)
"""


# ---------------------------------------------------------------------------
# Ordered funnel analysis (view -> click -> purchase)
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel(
    events: DataFrame,
    stages: tuple[str, str, str] = FUNNEL_STAGES,
) -> DataFrame:
    """Ordered three-stage funnel -> ONE row (n_users, n_s1, n_s2,
    n_s3, conv2_milli, conv3_milli): a user completes stage k when a
    stage-k event exists STRICTLY AFTER their first completion of
    stage k-1 (the classic product-analytics funnel; strictly-after is
    the documented tie rule — a click at the exact first-view
    timestamp did not follow it).

    Time handling: timestamps are only ever COMPARED (never converted
    to epoch), so TIMESTAMP_NTZ is timezone-pin-independent here — the
    layout.py field-extraction caveat does not arise.

    Scale shape: ONE exchange on user_id; the three stage resolutions
    are whole-partition window minima over that same partitioning
    (Catalyst plans one Exchange, three Window ops that reuse it), the
    per-user collapse reuses it again, and the funnel itself is a
    1-row global conditional-count agg. No self-joins, no join-back of
    an agg table, no Python. user_id is uniform high-cardinality."""
    s1, s2, s3 = stages
    w = W.partitionBy("user_id")
    d1 = events.select(
        "user_id", "event_type", "ts",
        F.min(F.when(F.col("event_type") == s1, F.col("ts")))
        .over(w).alias("f1"),
    )
    d2 = d1.select(
        "*",
        F.min(
            F.when(
                (F.col("event_type") == s2) & (F.col("ts") > F.col("f1")),
                F.col("ts"),
            )
        ).over(w).alias("f2"),
    )
    d3 = d2.select(
        "*",
        F.min(
            F.when(
                (F.col("event_type") == s3) & (F.col("ts") > F.col("f2")),
                F.col("ts"),
            )
        ).over(w).alias("f3"),
    )
    per_user = d3.groupBy("user_id").agg(
        F.max("f1").alias("f1"), F.max("f2").alias("f2"),
        F.max("f3").alias("f3"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("f1").cast("bigint").alias("n_s1"),
        F.count("f2").cast("bigint").alias("n_s2"),
        F.count("f3").cast("bigint").alias("n_s3"),
    ).select(
        "*",
        F.expr(
            "case when n_s1 > 0 then (1000 * n_s2) div n_s1"
            " else cast(null as bigint) end"
        ).alias("conv2_milli"),
        F.expr(
            "case when n_s2 > 0 then (1000 * n_s3) div n_s2"
            " else cast(null as bigint) end"
        ).alias("conv3_milli"),
    )


def duck_funnel_sql(
    stages: tuple[str, str, str] = FUNNEL_STAGES, rel: str = "events"
) -> str:
    """DuckDB twin of :func:`funnel` — the window chain as chained
    CTEs (window calls cannot nest)."""
    s1, s2, s3 = stages
    return f"""
with d1 as (
  select user_id, event_type, ts,
         min(case when event_type = '{s1}' then ts end)
           over (partition by user_id) as f1
  from {rel}
),
d2 as (
  select *, min(case when event_type = '{s2}' and ts > f1 then ts end)
              over (partition by user_id) as f2
  from d1
),
d3 as (
  select *, min(case when event_type = '{s3}' and ts > f2 then ts end)
              over (partition by user_id) as f3
  from d2
),
pu as (
  select user_id, max(f1) as f1, max(f2) as f2, max(f3) as f3
  from d3 group by 1
),
agg as (
  select cast(count(*) as bigint) as n_users,
         cast(count(f1) as bigint) as n_s1,
         cast(count(f2) as bigint) as n_s2,
         cast(count(f3) as bigint) as n_s3
  from pu
)
select *,
       case when n_s1 > 0 then (1000 * n_s2) // n_s1
            else cast(null as bigint) end as conv2_milli,
       case when n_s2 > 0 then (1000 * n_s3) // n_s2
            else cast(null as bigint) end as conv3_milli
from agg
"""


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention triangle -> (cohort_day, day_offset, n_users):
    users grouped by FIRST-SEEN calendar day, counted as retained on
    every later day they produce any event (day_offset = calendar days
    since the cohort day; offset 0 is the cohort size). The standard
    product-analytics read ("of users who arrived Monday, how many
    came back Wednesday") and, for a crawl corpus, the re-visit
    cadence of hosts/users without assuming any fixed horizon.

    Calendar-day semantics on purpose: both engines cast timestamp ->
    date and difference whole dates, so no epoch conversion and no
    timezone-pin dependence (the entity_timeline note) — datediff on
    DATEs is tz-free in both dialects.

    Scale shape: first-seen = ONE map-side-combined min agg on
    user_id; events join back user-keyed (high-cardinality, no skew —
    a hyperactive user inflates one probe partition, AQE splits it);
    the (user, day) dedup combines map-side; the final (cohort, off)
    rollup is bounded by days^2 / 2 rows. No window functions."""
    firsts = events.groupBy("user_id").agg(
        F.min("ts").alias("first_ts")
    )
    per_day = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            F.col("first_ts").cast("date").alias("cohort_day"),
            F.datediff(
                F.col("ts").cast("date"), F.col("first_ts").cast("date")
            ).cast("bigint").alias("day_offset"),
        )
        .distinct()
    )
    return per_day.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


def duck_retention_sql(rel: str = "events") -> str:
    """Oracle twin (date_diff('day', ...) over whole DATEs == Spark
    datediff on casts — calendar days, tz-free)."""
    return f"""
with firsts as (
  select user_id, min(ts) as first_ts from {rel} group by 1
),
per_day as (
  select distinct e.user_id,
         cast(f.first_ts as date) as cohort_day,
         cast(date_diff('day', cast(f.first_ts as date),
                        cast(e.ts as date)) as bigint) as day_offset
  from {rel} e join firsts f using (user_id)
)
select cohort_day, day_offset, cast(count(*) as bigint) as n_users
from per_day group by 1, 2
"""


# ---------------------------------------------------------------------------
# sequential pattern mining (PrefixSpan-style contiguous k-grams over
# per-user event streams, Pei et al. 2001 — restricted to contiguous
# order-2/3 patterns, the production shape of "what do users do next")
# ---------------------------------------------------------------------------

SEQ_MIN_SUPPORT = 20  # distinct users, not occurrences (the PrefixSpan defn)


def event_sequences(
    events: DataFrame, min_support: int = SEQ_MIN_SUPPORT
) -> DataFrame:
    """Frequent contiguous event-type sequences of length 2 and 3 with
    per-USER support (a user contributes once per pattern however often
    they repeat it — the sequence-mining support definition, which a
    plain pair count gets wrong): (k, pattern, support).

    Plan: ONE exchange on user_id; lead() and lead(2) share the same
    window spec so Catalyst plans a single Window over it; the
    (pattern, user) distinct and the support count both map-side
    combine. The event-type alphabet is tiny, so output is at most
    |types|^2 + |types|^3 rows regardless of corpus size. Ordering ties
    on (ts) are broken by event_id — same total order in the oracle."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    g2 = seq.where(F.col("e2").isNotNull()).select(
        F.lit(2).cast("bigint").alias("k"),
        F.concat_ws(">", "e1", "e2").alias("pattern"),
        "user_id",
    )
    g3 = seq.where(F.col("e3").isNotNull()).select(
        F.lit(3).cast("bigint").alias("k"),
        F.concat_ws(">", "e1", "e2", "e3").alias("pattern"),
        "user_id",
    )
    return (
        g2.unionByName(g3)
        .distinct()
        .groupBy("k", "pattern")
        .agg(F.count("*").cast("bigint").alias("support"))
        .where(F.col("support") >= min_support)
    )


def duck_event_sequences_sql(
    rel: str = "events", min_support: int = SEQ_MIN_SUPPORT
) -> str:
    """DuckDB twin of event_sequences (same window order, support
    definition and threshold)."""
    return f"""
with s as (
  select user_id, event_type as e1,
         lead(event_type, 1) over w as e2,
         lead(event_type, 2) over w as e3
  from {rel}
  window w as (partition by user_id order by ts, event_id)
),
g as (
  select distinct cast(2 as bigint) as k,
         e1 || '>' || e2 as pattern, user_id
  from s where e2 is not null
  union
  select distinct cast(3 as bigint),
         e1 || '>' || e2 || '>' || e3, user_id
  from s where e3 is not null
)
select k, pattern, cast(count(*) as bigint) as support
from g group by 1, 2
having cast(count(*) as bigint) >= {min_support}
"""


# ---------------------------------------------------------------------------
# Watermark-lateness audit: how late does this stream actually arrive?
# ---------------------------------------------------------------------------

WM_SALT = 131
WM_JITTER_S = 300


def watermark_audit(
    events: DataFrame, jitter_max_s: int = WM_JITTER_S
) -> DataFrame:
    """Event-time lateness profile -> (late_bucket, n_events,
    max_late_s): the report that SIZES a streaming watermark. Arrival
    time is the event time plus a planted deterministic network delay
    (h1(event_id) % jitter_max_s seconds — the sandbox stand-in for a
    real ingestion timestamp column); an event's LATENESS is how far
    the per-user event-time high-water mark had already advanced past
    it when it arrived (greatest(0, runmax_before_arrival - ts)).
    log2-bucketed seconds out: pick the watermark delay at the bucket
    covering your tolerated drop rate — the empirical basis for the
    repo's streaming `withWatermark` settings instead of a guess.

    Scale shape: ONE user-keyed window (partitions bounded by
    events-per-user, the sessionize discipline) computing the running
    max over arrival order with a deterministic (arrival, event_id)
    tie-break, then one map-side-combined <= 64-row histogram agg.
    Epoch math via unix_micros on a cast timestamp (tz-pin-free, the
    events.py convention); ilog2 via bit length."""
    from pyspark.sql import Window as W

    from ..functions.hashing import sql_h1

    e = events.select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).withColumn(
        "arr_us",
        F.col("ts_us")
        + F.expr(f"({sql_h1('event_id', WM_SALT)}) % {jitter_max_s}")
        * 1_000_000,
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("arr_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    late = e.withColumn("runmax_us", F.max("ts_us").over(w)).select(
        F.expr(
            "greatest(cast(0 as bigint),"
            " (coalesce(runmax_us, ts_us) - ts_us) div 1000000)"
        ).alias("late_s")
    )
    return (
        late.withColumn(
            "late_bucket",
            F.expr("cast(length(bin(late_s + 1)) - 1 as bigint)"),
        )
        .groupBy("late_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.max("late_s").cast("bigint").alias("max_late_s"),
        )
    )


def derive_watermark_delay(
    events: DataFrame,
    tolerated_drop: float = 0.0,
    jitter_max_s: int = WM_JITTER_S,
) -> int:
    """Close the audit -> settings loop (VERDICT r3 #8): the smallest
    whole-second watermark delay D such that the share of calibration
    events whose measured lateness exceeds D is <= `tolerated_drop` —
    the number you hand to `withWatermark(col, f"{D} seconds")` instead
    of a guessed constant.

    Lateness here is measured against the GLOBAL event-time high-water
    mark in arrival order — exactly what a Structured Streaming
    watermark advances on — NOT watermark_audit's per-user runmax: any
    user's fresh event advances the stream watermark for everyone, so
    the per-user profile UNDERESTIMATES drops (a user whose own events
    are in order can still lose rows to other users' clock). The
    planted arrival model is the audit's (ts + h1(event_id) % jitter).

    Scale shape: this is a CALIBRATION pass — run it on a bounded
    recent traffic window (the way real pipelines size watermarks from
    a day's profile), not the corpus; the global running max is one
    ordered pass, and the lateness histogram has <= jitter_max_s
    distinct values, so the driver sees a bounded table. The derived D
    seals the planted distribution by construction; the gate in
    tests/test_streaming.py proves it end-to-end on a live stream and
    that a smaller D measurably drops rows."""
    from pyspark.sql import Window as W

    from ..functions.hashing import sql_h1

    e = events.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).withColumn(
        "arr_us",
        F.col("ts_us")
        + F.expr(f"({sql_h1('event_id', WM_SALT)}) % {jitter_max_s}")
        * 1_000_000,
    )
    w = (
        W.orderBy("arr_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    hist = (
        e.withColumn("runmax_us", F.max("ts_us").over(w))
        .select(
            # CEIL to whole seconds: an event 1.5 s late needs delay 2
            # to survive `ts >= max_ts - delay` (floor would under-seal)
            F.expr(
                "greatest(cast(0 as bigint),"
                " (coalesce(runmax_us, ts_us) - ts_us + 999999)"
                " div 1000000)"
            ).alias("late_s")
        )
        .groupBy("late_s")
        .agg(F.count("*").cast("bigint").alias("n"))
        .collect()
    )
    if not hist:
        return 0
    rows = sorted(hist, key=lambda r: r["late_s"])
    total = sum(r["n"] for r in rows)
    budget = tolerated_drop * total
    # suffix counts: tail_above[L] = events with lateness >= L
    tail_above = {}
    suffix = 0
    for r in reversed(rows):
        suffix += r["n"]
        tail_above[r["late_s"]] = suffix

    def tail_gt(d: int) -> int:
        """Events a delay-d watermark would drop (lateness > d)."""
        for r in rows:
            if r["late_s"] > d:
                return tail_above[r["late_s"]]
        return 0

    # smallest D in {0} U {observed lateness} with tail(> D) <= budget;
    # always returns inside the loop: at d = max(late_s), tail_gt is 0
    for d in sorted({0} | {r["late_s"] for r in rows}):
        if tail_gt(d) <= budget:
            return int(d)
    raise AssertionError("unreachable: tail_gt(max late_s) == 0")


def derive_watermark(
    events: DataFrame,
    tolerated_drop: float = 0.0,
    jitter_max_s: int = WM_JITTER_S,
) -> str:
    """`withWatermark`-ready spec string from the measured lateness
    profile: derive_watermark_delay formatted as '<D> seconds'."""
    return (
        f"{derive_watermark_delay(events, tolerated_drop, jitter_max_s)}"
        " seconds"
    )


def duck_watermark_audit_sql(
    events_rel: str = "events", jitter_max_s: int = WM_JITTER_S
) -> str:
    """Oracle twin of watermark_audit (epoch_us both sides; ilog2 via
    to_base; HUGEINT sums cast)."""
    from ..functions.hashing import sql_h1

    return f"""
with e as (
  select event_id, user_id,
         epoch_us(ts) as ts_us,
         epoch_us(ts) + (({sql_h1('event_id', WM_SALT)}) % {jitter_max_s})
           * 1000000 as arr_us
  from {events_rel}
),
l as (
  select greatest(cast(0 as bigint),
           (coalesce(max(ts_us) over (
              partition by user_id order by arr_us, event_id
              rows between unbounded preceding and 1 preceding), ts_us)
            - ts_us) // 1000000) as late_s
  from e
)
select cast(length(to_base(late_s + 1, 2)) - 1 as bigint) as late_bucket,
       cast(count(*) as bigint) as n_events,
       cast(max(late_s) as bigint) as max_late_s
from l group by 1
"""


# ---------------------------------------------------------------------------
# JSON property ingest: schema-on-read over the props column
# ---------------------------------------------------------------------------


def json_props_stats(events: DataFrame) -> DataFrame:
    """Schema-on-read JSON ingest -> per event_type (n, n_k, sum_k,
    max_k): the `props` column (a JSON string in the events feed) is
    parsed with an EXPLICIT schema via from_json — the semi-structured
    leg of source-format breadth (CSV and parquet scans are O1;
    WARC/CDX binary is warc.py; this is the JSON sidecar every event
    pipeline carries). Explicit schema means Catalyst prunes to the
    single referenced field and malformed rows surface as NULL (n - n_k
    counts them) instead of failing the job.

    Scale shape: row-local parse in whole-stage codegen (JsonToStructs,
    no Python), then ONE map-side-combined groupBy over |types| keys."""
    return (
        events.select(
            "event_type",
            F.from_json("props", "k bigint").alias("p"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count("p.k").cast("bigint").alias("n_k"),
            F.sum("p.k").cast("bigint").alias("sum_k"),
            F.max("p.k").cast("bigint").alias("max_k"),
        )
    )


def duck_json_props_sql(events_rel: str = "events") -> str:
    """Oracle twin of json_props_stats (json_extract + casts)."""
    return f"""
select event_type,
       cast(count(*) as bigint) as n,
       cast(count(cast(json_extract(props, '$.k') as bigint)) as bigint)
         as n_k,
       cast(sum(cast(json_extract(props, '$.k') as bigint)) as bigint)
         as sum_k,
       cast(max(cast(json_extract(props, '$.k') as bigint)) as bigint)
         as max_k
from {events_rel} group by 1
"""
