"""Fixed-point integer log2 — identical in Spark SQL, DuckDB SQL, Python.

The repo's ilog2 idiom (``length(bin(x)) - 1``) quantizes a log to its
integer part — exactly right for surprisal buckets, far too coarse for
ORDERING keys (64 distinct values force every ranking into tie-breaks).
This module adds FRAC_BITS fractional bits by the classical
square-and-compare digit recurrence, using only int64 ``*``, ``>>`` and
compares, so Spark, DuckDB and Python agree bit-for-bit (a float
``log2`` misrounds near powers of two; this never does):

    normalize x to a 30-bit mantissa m in [2^30, 2^31)   # value m/2^30
    repeat FRAC_BITS times:
        m = (m * m) >> 30          # square the mantissa   (< 2^62: safe)
        if m >= 2^31: m >>= 1; emit bit 1 else emit bit 0

``log2fp(x) = ilog2(x) * 2^FRAC_BITS + frac`` — monotone in x, exact to
2^-FRAC_BITS. Inputs must be in [1, 2^31) (every portable-hash value is:
functions/hashing.py keeps the chain below M < 2^31).

Primary consumer: Efraimidis-Spirakis weighted reservoir keys
(textstats.weighted_sample_topk), where the exponential draw
-log2(u) needs enough resolution that the weight division — not the
tie-break — decides the ranking.
"""

from __future__ import annotations

from nerpii_spark.functions.hashing import M

FRAC_BITS = 12
FP_ONE = 1 << FRAC_BITS  # 4096


def log2fp(x: int) -> int:
    """Python mirror: floor(2^FRAC_BITS * log2(x)) for 1 <= x < 2^31
    (up to the digit-recurrence truncation both SQL twins share)."""
    if not 1 <= x < (1 << 31):
        raise ValueError(f"log2fp domain is [1, 2^31): got {x}")
    il = x.bit_length() - 1
    m = x << (30 - il) if il <= 30 else x >> (il - 30)
    frac = 0
    for _ in range(FRAC_BITS):
        m = (m * m) >> 30
        frac <<= 1
        if m >= (1 << 31):
            m >>= 1
            frac |= 1
    return il * FP_ONE + frac


# -log2(u) for u = h/M needs log2(M) in the same fixed point; bake the
# constant so all three implementations share one literal.
LOG2M_FP = log2fp(M)


def spark_log2fp_cols(df, x_col: str, out_col: str):
    """Append ``out_col = log2fp(x_col)`` — all int64 built-ins inside
    whole-stage codegen, zero Python. The FRAC_BITS-step recurrence is
    emitted as ONE selectExpr whose steps reference each other through
    LATERAL COLUMN ALIASES (Spark >= 3.4): one analyzer pass builds the
    whole chain. Two alternatives both measured worse: chained
    withColumn calls re-analyze the growing plan per call (~5.6 s of
    DRIVER time per draw at 2 x (3 + 3*FRAC_BITS) calls — quadratic
    analysis, 7x the actual execution), and inlining into one flat
    expression doubles the tree per step (each step reads the previous
    mantissa twice). Lateral aliases keep each step's mantissa a named,
    multi-referenced column, so Catalyst neither re-analyzes nor
    duplicates — codegen pipelines the resulting projection chain."""
    exprs = [
        f"cast(length(bin({x_col})) - 1 as bigint) as _l2il",
        (
            f"case when _l2il <= 30 then"
            f" shiftleft({x_col}, cast(30 - _l2il as int))"
            f" else shiftright({x_col}, cast(_l2il - 30 as int)) end"
            " as _l2m0"
        ),
        "cast(0 as bigint) as _l2f0",
    ]
    scratch = ["_l2il", "_l2m0", "_l2f0"]
    for i in range(1, FRAC_BITS + 1):
        p = i - 1
        exprs += [
            f"shiftright(_l2m{p} * _l2m{p}, 30) as _l2s{i}",
            (
                f"_l2f{p} * 2 + cast(_l2s{i} >= 2147483648 as bigint)"
                f" as _l2f{i}"
            ),
            (
                f"case when _l2s{i} >= 2147483648"
                f" then shiftright(_l2s{i}, 1) else _l2s{i} end as _l2m{i}"
            ),
        ]
        scratch += [f"_l2s{i}", f"_l2f{i}", f"_l2m{i}"]
    exprs.append(f"_l2il * {FP_ONE} + _l2f{FRAC_BITS} as {out_col}")
    return df.selectExpr("*", *exprs).drop(*scratch)


def duck_log2fp_expr(x_expr: str) -> str:
    """The same recurrence as ONE DuckDB scalar expression: the
    (mantissa, frac) pair packs into a single bigint
    (m * FP_ONE + frac: m < 2^31, frac < 2^FRAC_BITS => < 2^43) folded
    with list_reduce over a FRAC_BITS-long range — runtime recursion,
    so the expression stays constant-size. Oracle-side only (bit-exact
    replay); performance is irrelevant there."""
    il = f"(length(to_base(({x_expr})::BIGINT, 2)) - 1)"
    m0 = (
        f"(case when {il} <= 30"
        f" then (({x_expr})::BIGINT << (30 - {il}))"
        f" else (({x_expr})::BIGINT >> ({il} - 30)) end)"
    )
    sq = f"((acc >> {FRAC_BITS}) * (acc >> {FRAC_BITS}) >> 30)"
    step = (
        f"case when {sq} >= 2147483648"
        f" then (({sq} >> 1) << {FRAC_BITS})"
        f" + ((acc % {FP_ONE}) * 2 + 1)"
        f" else ({sq} << {FRAC_BITS}) + (acc % {FP_ONE}) * 2 end"
    )
    packed = (
        f"list_reduce(list_prepend(({m0} << {FRAC_BITS})::BIGINT,"
        f" list_transform(range(1, {FRAC_BITS} + 1), i -> 0::BIGINT)),"
        f" (acc, i) -> {step})"
    )
    return f"(({il})::BIGINT * {FP_ONE} + ({packed}) % {FP_ONE})"
