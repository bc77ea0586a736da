"""Portable cardinality / frequency sketches (bit-exact in Spark SQL /
DuckDB SQL): an HLL-style register sketch (Flajolet et al. 2007,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm") and a Count-Min sketch (Cormode & Muthukrishnan 2005, "An
improved data stream summary: the count-min sketch and its
applications").

Why a hand-rolled sketch instead of `approx_count_distinct`: Spark's
HLL++ and DuckDB's HLL use different hash functions and register
layouts, so their estimates can never hash-match across engines. This
sketch derives every bit from the repo's frozen portable hash chain
(functions/hashing.py), so the Spark result and the DuckDB oracle agree
bit-for-bit — the driver's value-hash gate certifies the *distributed
sketch computation itself*, while a pytest gates the estimate's accuracy
against the exact distinct count (the part an identical-recomputation
oracle cannot certify).

Sketch (per group = lang, m = 64 registers):
  token  -> v = strhash(token)            (universe = 12-char-prefix+len
                                           token classes — documented, both
                                           engines and the accuracy test use
                                           the same universe)
  v      -> w = h2(v, 5); register j = w % 64
  w      -> u = h2(w, 7); rho = 1 + count_trailing_zeros(u)  (u = 0 -> 32)
  register_j = max(rho)  over the group
  S = sum_j 2^(32 - register_j)  (missing registers contribute 2^32)
  estimate = floor(alpha_64 * m^2 * 2^32 / S)  with alpha_64 = 0.709
             = (709 * 4096 * 2^32) div (1000 * S)   — all int64, exact.

Scale shape: the token stream is NEVER shuffled by token — the only
shuffle is groupBy(lang, j) MAX(rho), whose map-side partial state is
bounded by 64 rows per lang per task; only <= 64 x |langs| tiny rows
cross the wire, and register tables from disjoint corpus shards merge
by the same MAX (the sketch is mergeable, the property that matters at
100 TB). No driver-side state; estimate arithmetic is a 5-row projection.

No small-range (linear-counting) correction: at n >> m (the regime a
corpus vocabulary is always in) raw HLL is unbiased; the pytest bound
covers the sketch's ~1.04/sqrt(64) = 13% standard error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nerpii_spark.functions.hashing import sql_h2, sql_strhash

M_REGS = 64
RHO_CAP = 32
# floor(alpha_64 * m^2 * 2^32 * 1000) / 1000 with alpha_64 = 0.709:
# numerator of the integer estimate, = 709 * 4096 * 2^32
_EST_NUM = 709 * (M_REGS * M_REGS) * (1 << 32)
_EST_DEN = 1000


def _rho_sql(u: str) -> str:
    """1 + trailing zeros of `u` (int64 expr, both dialects); u = 0 -> cap.
    (u & -u) isolates the lowest set bit; bit_count of (that - 1) counts
    the zeros below it. Both engines implement `&` and bit_count on
    bigint; `0 - u` avoids unary-minus precedence differences."""
    lowbit = f"(({u}) & (0 - ({u})))"
    return (
        f"(case when ({u}) = 0 then {RHO_CAP}"
        f" else bit_count({lowbit} - 1) + 1 end)"
    )


def _tok_rel(dialect: str, doc_rel: str, text_col: str, group_col: str) -> str:
    if dialect == "spark":
        return (
            f"select {group_col} as g, tok from {doc_rel} "
            f"lateral view explode(split(lower({text_col}), ' ')) t as tok "
            f"where tok <> ''"
        )
    return (
        f"select {group_col} as g,"
        f" unnest(string_split(lower({text_col}), ' ')) as tok"
        f" from {doc_rel}"
    )


def hll_distinct_sql(
    dialect: str,
    doc_rel: str = "documents",
    text_col: str = "text",
    group_col: str = "lang",
) -> str:
    """Full dual-dialect SELECT -> (g renamed to group_col, est_distinct,
    s_sum, n_regs_hit)."""
    v = sql_strhash("tok")
    w = sql_h2(v, 5)
    u = sql_h2("w", 7)
    rho = _rho_sql("u")
    div = "div" if dialect == "spark" else "//"
    toks = _tok_rel(dialect, doc_rel, text_col, group_col)
    # unseen registers contribute 2^32 each, added in CLOSED FORM
    # ((m - count) << 32) — no zero-register union (which would either
    # rescan the corpus to enumerate groups or recompute the aggregate
    # lineage twice). Observed registers always have rho >= 1, so
    # n_regs_hit = count(*).
    return f"""
with toks as ({toks}),
hs as (select g, {w} as w from toks where tok <> ''),
hs2 as (select g, w % {M_REGS} as j, {u} as u from hs),
obs as (select g, j, max({rho}) as rho from hs2 group by g, j),
s as (
  select g,
         cast(sum({_pow2_sql(dialect, f"{RHO_CAP} - rho")})
              + ({M_REGS} - count(*)) * {_pow2_sql(dialect, str(RHO_CAP))}
              as bigint) as s_sum,
         cast(count(*) as bigint) as n_regs_hit
  from obs group by g
)
select g as {group_col},
       cast(({_EST_NUM} {div} ({_EST_DEN} * s_sum)) as bigint)
         as est_distinct,
       s_sum, n_regs_hit
from s
"""


def _pow2_sql(dialect: str, exp: str) -> str:
    """Integer 2^exp for 0 <= exp <= 32 via shiftleft (no float pow)."""
    if dialect == "spark":
        return f"shiftleft(cast(1 as bigint), cast({exp} as int))"
    return f"(cast(1 as bigint) << ({exp}))"


def hll_distinct(
    docs: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Per-`group_col` distinct-token estimate -> (group_col,
    est_distinct, s_sum, n_regs_hit). See module docstring for the
    sketch and its scale shape."""
    v = sql_strhash("tok")
    w_expr = sql_h2(v, 5)
    u_expr = sql_h2("w", 7)
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    hs2 = toks.select(
        "g", F.expr(w_expr).alias("w")
    ).select(
        "g",
        (F.col("w") % M_REGS).alias("j"),
        F.expr(u_expr).alias("u"),
    )
    obs = hs2.groupBy("g", "j").agg(
        F.max(F.expr(_rho_sql("u"))).alias("rho")
    )
    # unseen registers in closed form — no zero-union, no second pass
    s = obs.groupBy("g").agg(
        (
            F.sum(F.expr(_pow2_sql("spark", f"{RHO_CAP} - rho")))
            + (F.lit(M_REGS) - F.count("*"))
            * F.expr(_pow2_sql("spark", str(RHO_CAP)))
        ).cast("bigint").alias("s_sum"),
        F.count("*").cast("bigint").alias("n_regs_hit"),
    )
    return s.select(
        F.col("g").alias(group_col),
        F.expr(f"cast(({_EST_NUM} div ({_EST_DEN} * s_sum)) as bigint)").alias(
            "est_distinct"
        ),
        "s_sum",
        "n_regs_hit",
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (heavy-hitter counts without a per-token shuffle)
# ---------------------------------------------------------------------------

CMS_D = 4     # hash rows
CMS_W = 256   # counters per row
CMS_PROBES = ["works", "at", "in", "lives", "the", "zz-absent-zz"]


def _cms_cell(tok_expr: str, r: str) -> str:
    """Row-r counter index of a token (portable hash chain)."""
    v = sql_strhash(tok_expr)
    return f"({sql_h2(v, f'100 + {r}')} % {CMS_W})"


def cms_counts(
    docs: DataFrame,
    probes: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Count-Min estimates for `probes` -> (token, est_count).

    The exact count of every token needs a shuffle keyed by token (Zipf
    head keys become hot); the CMS needs ONE groupBy over (row, cell) —
    d x w = 1024 counters of bounded, mergeable state (map-side partial
    state <= 1024 rows per task, shards combine by +). est = min over
    the d rows of the token's cell; the classic guarantee (est >= true,
    est <= true + N/w per row w.h.p.) is gated in pytest; the DuckDB
    oracle replays the counter matrix and the probe lookups
    bit-for-bit."""
    probes = probes if probes is not None else CMS_PROBES
    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).where(F.col("tok") != "")
    cells = toks.select(
        F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("r"), "tok"
    ).select("r", F.expr(_cms_cell("tok", "r")).alias("c"))
    counters = cells.groupBy("r", "c").agg(
        F.count("*").cast("bigint").alias("n")
    )
    spark = docs.sparkSession
    probe_df = spark.createDataFrame(
        [(p,) for p in probes], "token string"
    ).select(
        "token", F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("r")
    ).select(
        "token", "r", F.expr(_cms_cell("token", "r")).alias("c")
    )
    return (
        probe_df.join(F.broadcast(counters), ["r", "c"], "left")
        .groupBy("token")
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0)))
            .cast("bigint")
            .alias("est_count")
        )
    )


def duck_cms_counts_sql(
    doc_rel: str = "documents",
    probes: list[str] | None = None,
    text_col: str = "text",
) -> str:
    probes = probes if probes is not None else CMS_PROBES
    plist = ", ".join("'" + p.replace("'", "''") + "'" for p in probes)
    return f"""
with toks as (
  select unnest(string_split(lower({text_col}), ' ')) as tok from {doc_rel}
),
cells as (
  select r, {_cms_cell('tok', 'r')} as c
  from (select tok, unnest(range({CMS_D})) as r from toks where tok <> '')
),
counters as (select r, c, cast(count(*) as bigint) as n
             from cells group by 1, 2),
probe as (
  select token, r, {_cms_cell('token', 'r')} as c
  from (select unnest([{plist}]) as token)
       cross join (select unnest(range({CMS_D})) as r)
)
select token,
       cast(min(coalesce(n, 0)) as bigint) as est_count
from probe left join counters using (r, c)
group by token
"""


def hll_estimate_from_registers(
    regs: DataFrame, keys: list[str], rho_col: str = "rho"
) -> DataFrame:
    """Estimate-on-read over materialized HLL register state ->
    (*keys, est_distinct, s_sum, n_regs_hit): the rollup half of the
    sketch split out so register maxima can be produced ANYWHERE the
    merge operation (max per register) runs — a batch groupBy, a
    streaming windowed aggregation (streaming/windows.
    windowed_user_hll_registers), or a union of per-shard sketch
    tables — and the estimate stays one tiny closed-form aggregation
    over <= 64 rows per key (unseen registers in closed form; PLUS the
    small-range linear-counting branch lc = m*ln(m/(m-V)) the windowed
    distinct-users regime needs — n << m biases the raw harmonic
    estimator high — in the shared integer log2 fixed point, so the
    branch replays bit-for-bit in DuckDB)."""
    from ..functions.intmath import FP_ONE, log2fp, spark_log2fp_cols

    s = regs.groupBy(*keys).agg(
        (
            F.sum(F.expr(_pow2_sql("spark", f"{RHO_CAP} - {rho_col}")))
            + (F.lit(M_REGS) - F.count("*"))
            * F.expr(_pow2_sql("spark", str(RHO_CAP)))
        ).cast("bigint").alias("s_sum"),
        F.count("*").cast("bigint").alias("n_regs_hit"),
    )
    s = s.withColumn("_raw", F.expr(
        f"cast(({_EST_NUM} div ({_EST_DEN} * s_sum)) as bigint)"
    ))
    # small-range (linear counting) branch — the windowed-users regime
    # (n << m) where the raw harmonic estimator is biased high:
    # lc = m * ln(m / (m - V)), in the shared log2 fixed point so the
    # value replays bit-for-bit in DuckDB (duck_log2fp_expr twin)
    s = s.withColumn("_mv", F.expr(
        f"cast(greatest({M_REGS} - n_regs_hit, 1) as bigint)"
    ))
    s = spark_log2fp_cols(s, "_mv", "_l2mv")
    lc = (
        f"cast(({M_REGS} * ({log2fp(M_REGS)} - _l2mv) * 693147)"
        f" div cast({FP_ONE * 1000000} as bigint) as bigint)"
    )
    return s.select(
        *keys,
        F.expr(
            f"case when n_regs_hit < {M_REGS} and _raw <= {5 * M_REGS // 2}"
            f" then {lc} else _raw end as est_distinct"
        ),
        "s_sum",
        "n_regs_hit",
    )


def duck_windowed_user_hll_sql(events_rel: str = "events") -> str:
    """DuckDB replay twin of windowed_user_hll_registers +
    hll_estimate_from_registers over the events table: same hash
    chain, register maxima, closed-form sum, raw estimator and
    small-range linear-counting branch (fixed-point log2 via
    duck_log2fp_expr), bit-for-bit."""
    from ..functions.hashing import sql_h1, sql_h2
    from ..functions.intmath import FP_ONE, duck_log2fp_expr, log2fp

    w_expr = sql_h2(sql_h1("user_id", 5), 5)
    u_expr = sql_h2("w", 7)
    raw = f"({_EST_NUM} // ({_EST_DEN} * s_sum))"
    l2 = duck_log2fp_expr(f"greatest({M_REGS} - n_regs_hit, 1)")
    lc = (
        f"(({M_REGS} * ({log2fp(M_REGS)} - {l2}) * 693147)"
        f" // cast({FP_ONE * 1000000} as bigint))"
    )
    return f"""
with hs as (
  select cast(date_trunc('day', ts) as timestamp) as window_start,
         event_type,
         {w_expr} as w
  from {events_rel}
),
regs as (
  select window_start, event_type, w % {M_REGS} as j,
         max({_rho_sql(u_expr)}) as rho
  from hs group by 1, 2, 3
),
s as (
  select window_start, event_type,
         cast(sum({_pow2_sql("duck", f"{RHO_CAP} - rho")})
              + ({M_REGS} - count(*))
                * {_pow2_sql("duck", str(RHO_CAP))} as bigint) as s_sum,
         cast(count(*) as bigint) as n_regs_hit
  from regs group by 1, 2
)
select window_start, event_type,
       cast(case when n_regs_hit < {M_REGS} and {raw} <= {5 * M_REGS // 2}
                 then {lc} else {raw} end as bigint) as est_distinct,
       s_sum, n_regs_hit
from s
"""


# ---------------------------------------------------------------------------
# HDR-style mergeable quantile sketch (log2 buckets, 3-bit mantissa)
# ---------------------------------------------------------------------------

HDR_PS = (50, 90, 99)
HDR_SUB = 8  # sub-buckets per octave (3 mantissa bits)


def hdr_quantiles(
    df: DataFrame, value_expr: str, ps: tuple[int, ...] = HDR_PS
) -> DataFrame:
    """Mergeable quantile SKETCH (HdrHistogram / DDSketch family) ->
    one row per requested percentile: (p, bucket, est_lo, est_hi,
    cum_n, n). The third mergeable sketch next to HLL and Count-Min:
    positive bigint values map to bucket = 8*floor(log2(v)) + 3-bit
    mantissa, giving <= 12.5% relative-error bands at ANY value range;
    the sketch state is just per-bucket counts, so shards merge by
    ADDITION — the property exact q_percentiles (full value histogram)
    lacks when value cardinality itself is unbounded.

    Every step is integer: the octave is length(bin(v)) - 1 (identical
    built-in in Spark and DuckDB, no libm log2 at bucket boundaries),
    the mantissa is ((v - 2^m) * 8) div 2^m via bigint shifts (the
    int32 shift-literal trap is pre-empted with casts), the rank target
    is ceil(p*n/100) = (p*n + 99) div 100.

    Scale shape: ONE map-side-combined groupBy over the corpus into
    <= 8*63 cells; everything after (cumulative window, 3-row target
    join, min_by) runs on the sketch, not the data. The window's
    single partition holds <= 504 rows BY CONSTRUCTION."""
    from pyspark.sql import Window as W

    one = "cast(1 as bigint)"
    sk = (
        df.select(F.expr(value_expr).cast("bigint").alias("v"))
        .where(F.col("v") >= 1)
        .select(F.expr("cast(length(bin(v)) - 1 as int)").alias("m"), "v")
        .select(
            F.expr(
                f"cast(m as bigint) * {HDR_SUB} + ((v - shiftleft({one}, m))"
                f" * {HDR_SUB}) div shiftleft({one}, m)"
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    cum = sk.select(
        "bucket",
        F.sum("cnt")
        .over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_n"),
    )
    tot = sk.agg(F.sum("cnt").cast("bigint").alias("n"))
    targets = tot.select(
        F.explode(
            F.array(*[F.lit(int(p)).cast("bigint") for p in ps])
        ).alias("p"),
        "n",
    ).select("p", "n", F.expr("(p * n + 99) div 100").alias("target"))
    hit = (
        targets.join(cum, F.col("cum_n") >= F.col("target"))
        .groupBy("p", "n")
        .agg(
            F.min("bucket").cast("bigint").alias("bucket"),
            F.expr("cast(min_by(cum_n, bucket) as bigint)").alias("cum_n"),
        )
    )
    return hit.select(
        "p",
        "bucket",
        F.expr(
            f"(shiftleft({one}, cast(bucket div {HDR_SUB} as int))"
            f" * ({HDR_SUB} + bucket % {HDR_SUB})) div {HDR_SUB}"
        ).alias("est_lo"),
        F.expr(
            f"(shiftleft({one}, cast(bucket div {HDR_SUB} as int))"
            f" * ({HDR_SUB} + 1 + bucket % {HDR_SUB})) div {HDR_SUB}"
        ).alias("est_hi"),
        "cum_n",
        "n",
    )


def duck_hdr_quantiles_sql(
    rel_sql: str, value_expr: str, ps: tuple[int, ...] = HDR_PS
) -> str:
    """Oracle twin of hdr_quantiles: identical bucket map (bin() msb,
    bigint-cast shifts), cumulative window, ceil-rank targets and
    min-bucket pick — HUGEINT sums cast back at every level."""
    plist = ", ".join(f"cast({int(p)} as bigint)" for p in ps)
    one = "cast(1 as bigint)"
    return f"""
with vals_q as (
  select cast({value_expr} as bigint) as v from ({rel_sql}) where {value_expr} >= 1
),
sk as (
  select cast(m as bigint) * {HDR_SUB}
         + ((v - ({one} << m)) * {HDR_SUB}) // ({one} << m) as bucket,
         cast(count(*) as bigint) as cnt
  from (select cast(length(bin(v)) - 1 as int) as m, v from vals_q)
  group by 1
),
cum as (
  select bucket,
         cast(sum(cnt) over (order by bucket
              rows between unbounded preceding and current row)
              as bigint) as cum_n
  from sk
),
tot as (select cast(sum(cnt) as bigint) as n from sk),
targets as (
  select p, n, (p * n + 99) // 100 as target
  from (select unnest([{plist}]) as p), tot
),
hit as (
  select t.p, t.n, cast(min(c.bucket) as bigint) as bucket,
         cast(min_by(c.cum_n, c.bucket) as bigint) as cum_n
  from targets t join cum c on c.cum_n >= t.target
  group by 1, 2
)
select p, bucket,
       (({one} << cast(bucket // {HDR_SUB} as int))
        * ({HDR_SUB} + bucket % {HDR_SUB})) // {HDR_SUB} as est_lo,
       (({one} << cast(bucket // {HDR_SUB} as int))
        * ({HDR_SUB} + 1 + bucket % {HDR_SUB})) // {HDR_SUB} as est_hi,
       cum_n, n
from hit
"""


# ---------------------------------------------------------------------------
# cross-corpus MinHash similarity matrix (Broder 1997 resemblance
# sketches, aggregated per language slice)
# ---------------------------------------------------------------------------

MINHASH_SIG_K = 16  # signature width; est. Jaccard = agree / K


def lang_minhash_matrix(
    docs: DataFrame, k: int = MINHASH_SIG_K
) -> DataFrame:
    """Pairwise shingle-set resemblance between language slices of the
    corpus: per lang a k-wide MinHash signature of the UNION of its
    docs' 3-gram shingle sets (min is duplicate-blind, so per-doc
    distinct explode feeds it directly), then every lang pair scored by
    signature agreement — the corpus-similarity matrix that informs
    mixture design and cross-lingual contamination checks.

    Scale: the explode feeds ONE map-side-combined groupBy with
    <=|langs| groups x k mins — the token stream is never shuffled by
    token (the HLL/CMS discipline); the pair join is |langs|^2 rows.
    The shingle hash is the frozen strhash polynomial (codegen, no
    HOF): its first-12-chars+length domain adds a small collision bias
    identically on both engines (and in the DuckDB replay), which is
    the usual sketch-accuracy-for-cost trade documented at
    hashing.strhash; estimator error is dominated by k anyway
    (sd ~ 1/sqrt(k))."""
    from ..functions.hashing import sql_h2, sql_strhash
    from ..session import ensure_min_partitions
    from .dedup import with_shingles

    sh = (
        with_shingles(ensure_min_partitions(docs))
        .select("lang", F.explode("shingles").alias("s"))
        .withColumn("h", F.expr(sql_strhash("s")))
    )
    # <=|langs| rows; checkpointed because BOTH crossJoin sides below
    # derive from it — live, the whole corpus shingle scan would run
    # twice (measured 7.4s -> ~2s at sf0.1 together with the
    # partition-floor shim above)
    sig = sh.groupBy("lang").agg(
        *[
            F.expr(f"min({sql_h2('h', j + 1)})").alias(f"m{j}")
            for j in range(k)
        ]
    ).localCheckpoint(eager=True)
    a = sig.select(F.col("lang").alias("lang_a"), *[F.col(f"m{j}").alias(f"a{j}") for j in range(k)])
    b = sig.select(F.col("lang").alias("lang_b"), *[F.col(f"m{j}").alias(f"b{j}") for j in range(k)])
    agree = " + ".join(
        f"(case when a{j} = b{j} then 1 else 0 end)" for j in range(k)
    )
    return (
        a.crossJoin(b)
        .where(F.col("lang_a") < F.col("lang_b"))
        .select(
            "lang_a",
            "lang_b",
            F.expr(f"cast({agree} as bigint)").alias("n_agree"),
            F.expr(f"cast(({agree}) * 1000000 div {k} as bigint)").alias(
                "jaccard_est_ppm"
            ),
        )
    )


def duck_lang_minhash_matrix_sql(
    doc_rel_sql: str, k: int = MINHASH_SIG_K
) -> str:
    """DuckDB twin of lang_minhash_matrix (identical shingles, hash
    chain, mins and agreement arithmetic)."""
    from ..functions.hashing import sql_h2, sql_strhash
    from .dedup import shingles_sql

    mins = ", ".join(
        f"min({sql_h2('h', j + 1)}) as m{j}" for j in range(k)
    )
    agree = " + ".join(
        f"(case when a.m{j} = b.m{j} then 1 else 0 end)" for j in range(k)
    )
    return f"""
with d as (select lang, text from ({doc_rel_sql})),
sh as (
  select lang, unnest({shingles_sql('duck', 'text')}) as s from d
),
hh as (select lang, {sql_strhash('s')} as h from sh),
sig as (select lang, {mins} from hh group by lang)
select a.lang as lang_a, b.lang as lang_b,
       cast({agree} as bigint) as n_agree,
       cast(({agree}) * 1000000 // {k} as bigint) as jaccard_est_ppm
from sig a join sig b on a.lang < b.lang
"""


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (mergeable rollup: persisted state +
# delta fold == full recompute, the lakehouse MERGE-refresh contract)
# ---------------------------------------------------------------------------


def _subj_regs(triples: DataFrame) -> DataFrame:
    """(pred, j, rho) HLL register table for distinct SUBJECTS per
    predicate — the same hash chain as hll_distinct_sql so a single-pass
    oracle replays it."""
    from ..functions.hashing import sql_h2, sql_strhash

    w = sql_h2(sql_strhash("subj"), 5)
    u = sql_h2("w", 7)
    return (
        triples.select("pred", F.expr(w).alias("w"))
        .select(
            "pred",
            F.expr(f"w % {M_REGS}").alias("j"),
            F.expr(_rho_sql(sql_h2("w", 7))).alias("rho"),
        )
        .groupBy("pred", "j")
        .agg(F.max("rho").alias("rho"))
    )


def _pred_stats(triples: DataFrame) -> DataFrame:
    return triples.groupBy("pred").agg(
        F.count("*").cast("bigint").alias("n_triples"),
        F.max("doc_id").cast("bigint").alias("latest_doc"),
    )


def pred_agg_incremental(triples: DataFrame, split_mod: int = 4) -> DataFrame:
    """Incremental refresh of a per-predicate rollup (count, latest
    capture, HLL distinct-subject estimate) — the aggregate analog of
    the incremental linker/pagerank/dedup family: the OLD window's
    state (doc_id % split_mod != 0, the same split those use) is
    computed once and persisted (localCheckpoint), then the delta batch
    folds in WITHOUT rescanning the old window: counts ADD, latest MAX,
    HLL registers take the elementwise MAX (a full-outer register
    join). Because every component is a commutative monoid, the fold
    provably equals the from-scratch aggregate — and the DuckDB oracle
    IS the from-scratch single pass, so the driver hash-match certifies
    mergeability itself, not just plumbing.

    Scale: state is <=|preds| x 64 register rows + |preds| stat rows —
    metadata-sized however large the fact table; the delta pass is the
    only corpus-scan. This is how a 100 TB rollup stays fresh per crawl
    without nightly full recomputes."""
    old = triples.where(F.col("doc_id") % split_mod != 0)
    delta = triples.where(F.col("doc_id") % split_mod == 0)
    regs_old = _subj_regs(old).localCheckpoint(eager=False)
    stats_old = _pred_stats(old).localCheckpoint(eager=False)
    regs_new = _subj_regs(delta)
    stats_new = _pred_stats(delta)

    ro = regs_old.select("pred", "j", F.col("rho").alias("rho_o"))
    rn = regs_new.select("pred", "j", F.col("rho").alias("rho_n"))
    merged = (
        ro.join(rn, ["pred", "j"], "full_outer")
        .select(
            "pred",
            "j",
            F.expr(
                "greatest(coalesce(rho_o, 0), coalesce(rho_n, 0))"
            ).alias("rho"),
        )
    )
    s = merged.groupBy("pred").agg(
        F.expr(
            f"cast(sum({_pow2_sql('spark', f'{RHO_CAP} - rho')})"
            f" + ({M_REGS} - count(*))"
            f" * {_pow2_sql('spark', str(RHO_CAP))} as bigint)"
        ).alias("s_sum"),
    )
    stats = (
        stats_old.unionByName(stats_new)
        .groupBy("pred")
        .agg(
            F.sum("n_triples").cast("bigint").alias("n_triples"),
            F.max("latest_doc").cast("bigint").alias("latest_doc"),
        )
    )
    return stats.join(s, "pred").select(
        "pred",
        "n_triples",
        "latest_doc",
        F.expr(
            f"cast({_EST_NUM} div ({_EST_DEN} * s_sum) as bigint)"
        ).alias("est_distinct_subj"),
        "s_sum",
    )


def duck_pred_agg_sql(triples_rel: str) -> str:
    """From-scratch single-pass DuckDB oracle of pred_agg_incremental:
    identical register chain over the FULL window — equality with the
    persisted-state + delta fold certifies the merge."""
    from ..functions.hashing import sql_h2, sql_strhash

    w = sql_h2(sql_strhash("subj"), 5)
    u = sql_h2("w", 7)
    rho = _rho_sql(u)
    return f"""
with t as ({triples_rel}),
hs as (select pred, {w} as w from t),
obs as (
  select pred, w % {M_REGS} as j, max({rho}) as rho
  from hs group by 1, 2
),
s as (
  select pred,
         cast(sum({_pow2_sql('duck', f'{RHO_CAP} - rho')})
              + ({M_REGS} - count(*)) * {_pow2_sql('duck', str(RHO_CAP))}
              as bigint) as s_sum
  from obs group by 1
),
st as (
  select pred, cast(count(*) as bigint) as n_triples,
         cast(max(doc_id) as bigint) as latest_doc
  from t group by 1
)
select st.pred, n_triples, latest_doc,
       cast({_EST_NUM} // ({_EST_DEN} * s_sum) as bigint)
         as est_distinct_subj,
       s_sum
from st join s on st.pred = s.pred
"""


# ---------------------------------------------------------------------------
# HLL set-algebra overlap: per-language distinct-token intersection
# ---------------------------------------------------------------------------


def hll_overlap(
    docs: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Sketch-algebra overlap report -> one row per group pair:
    (lang_a, lang_b, est_a, est_b, est_union, est_inter, jaccard_e6).
    The audience-overlap query: HLL registers are MERGEABLE under
    elementwise max, so the union estimate costs no second corpus
    pass — A∪B from merged registers, A∩B by inclusion-exclusion
    (clamped at 0: the estimator can go negative within its error),
    Jaccard from the two. This is the set-ALGEBRA face of the HLL
    machinery hll_distinct certifies; the register maxima, closed-form
    unseen mass (rho 0 -> 2^32) and the integer estimator are shared
    bit-for-bit.

    Scale shape: ONE register aggregation over the token stream
    (identical to hll_distinct — the stream is never shuffled by
    token), localCheckpoint'd because per-group estimates AND the pair
    merge both ride it; registers densify to 64-int arrays per group
    (bounded state), the pair table is |groups|^2 x 64 integers, and
    the elementwise-max fold is a 64-element HOF over that tiny table
    (interpreted cost bounded by groups^2, never corpus size)."""
    v = sql_strhash("tok")
    w_expr = sql_h2(v, 5)
    u_expr = sql_h2("w", 7)
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    obs = (
        toks.select("g", F.expr(w_expr).alias("w"))
        .select(
            "g",
            (F.col("w") % M_REGS).alias("j"),
            F.expr(u_expr).alias("u"),
        )
        .groupBy("g", "j")
        .agg(F.max(F.expr(_rho_sql("u"))).alias("rho"))
    )
    # NB: the transform lambda variable must NOT be named `j` — it would
    # shadow the obs column inside collect_list(struct(j, rho)) and pair
    # every rho with the sequence value (duplicate-map-key error)
    regs = obs.groupBy("g").agg(
        F.expr(
            f"transform(sequence(0, {M_REGS - 1}), jj -> coalesce("
            "  element_at(map_from_entries("
            "    collect_list(struct(j, rho))), cast(jj as bigint)), 0))"
        ).alias("r")
    ).localCheckpoint(eager=True)
    ssum = (
        f"aggregate(zip_with(ra, rb, (x, y) -> greatest(x, y)),"
        f" cast(0 as bigint),"
        f" (acc, r) -> acc + shiftleft(cast(1 as bigint),"
        f" cast({RHO_CAP} - r as int)))"
    )
    sone = (
        "aggregate({c}, cast(0 as bigint),"
        f" (acc, r) -> acc + shiftleft(cast(1 as bigint),"
        f" cast({RHO_CAP} - r as int)))"
    )
    est = f"cast({_EST_NUM} div ({_EST_DEN} * ({{s}})) as bigint)"
    a = regs.select(F.col("g").alias("lang_a"), F.col("r").alias("ra"))
    b = regs.select(F.col("g").alias("lang_b"), F.col("r").alias("rb"))
    return (
        a.crossJoin(b)
        .where(F.col("lang_a") < F.col("lang_b"))
        .withColumn("sa", F.expr(sone.format(c="ra")))
        .withColumn("sb", F.expr(sone.format(c="rb")))
        .withColumn("su", F.expr(ssum))
        .select(
            "lang_a", "lang_b",
            F.expr(est.format(s="sa")).alias("est_a"),
            F.expr(est.format(s="sb")).alias("est_b"),
            F.expr(est.format(s="su")).alias("est_union"),
        )
        .withColumn(
            "est_inter",
            F.expr(
                "greatest(cast(0 as bigint), est_a + est_b - est_union)"
            ),
        )
        .withColumn(
            "jaccard_e6",
            F.expr("(1000000 * est_inter) div est_union"),
        )
    )


def duck_hll_overlap_sql(
    doc_rel: str = "documents",
    text_col: str = "text",
    group_col: str = "lang",
) -> str:
    """Oracle twin of hll_overlap: the same registers via the certified
    hll token chain, dense 64-cell pair grid with rho 0 for unseen,
    identical integer estimator and inclusion-exclusion."""
    v = sql_strhash("tok")
    w = sql_h2(v, 5)
    u = sql_h2("w", 7)
    rho = _rho_sql("u")
    toks = _tok_rel("duck", doc_rel, text_col, group_col)
    est = f"cast({_EST_NUM} // ({_EST_DEN} * ({{s}})) as bigint)"
    return f"""
with toks as ({toks}),
hs as (select g, {w} as w from toks where tok <> ''),
hs2 as (select g, w % {M_REGS} as j, {u} as u from hs),
obs as (select g, j, max({rho}) as rho from hs2 group by g, j),
grps as (select distinct g from obs),
prs as (select a.g as ga, b.g as gb from grps a join grps b on a.g < b.g),
cells as (
  select p.ga, p.gb, c.j
  from prs p cross join (select unnest(range({M_REGS})) as j) c
),
m as (
  select c.ga, c.gb, c.j,
         coalesce(oa.rho, 0) as rho_a, coalesce(ob.rho, 0) as rho_b
  from cells c
  left join obs oa on oa.g = c.ga and oa.j = c.j
  left join obs ob on ob.g = c.gb and ob.j = c.j
),
s as (
  select ga, gb,
         cast(sum(cast(1 as bigint) << ({RHO_CAP} - rho_a)) as bigint)
           as sa,
         cast(sum(cast(1 as bigint) << ({RHO_CAP} - rho_b)) as bigint)
           as sb,
         cast(sum(cast(1 as bigint)
                  << ({RHO_CAP} - greatest(rho_a, rho_b))) as bigint)
           as su
  from m group by 1, 2
),
e as (
  select ga as lang_a, gb as lang_b,
         {est.format(s='sa')} as est_a,
         {est.format(s='sb')} as est_b,
         {est.format(s='su')} as est_union
  from s
)
select lang_a, lang_b, est_a, est_b, est_union,
       greatest(cast(0 as bigint), est_a + est_b - est_union) as est_inter,
       (1000000 * greatest(cast(0 as bigint), est_a + est_b - est_union))
         // est_union as jaccard_e6
from e
"""
