"""Distribution diagnostics a 100 TB pipeline publishes per build.

`skew_report` is the pre-flight check before any shuffle-heavy stage:
given the intended join/agg key, it reports the per-key row-count
distribution as a log2 histogram plus each bucket's hottest key — the
numbers that decide between a plain shuffle, a broadcast, salting, or
an AQE skew-join hint. At web scale the HISTOGRAM is what is small
enough to look at (<= 64 rows), not the per-key table; the hot-key
column names the offender so the fix (salt that key, filter that
boilerplate) is actionable without a second scan.

Scale shape: one map-side-combined count per key, then a <= 64-row
groupBy(bucket) whose argmax partial-aggregates as min/max of a struct
— nothing driver-side, no window, no sort. ilog2 via integer
bit-length (length(bin(x)) - 1), exact in both engines (float
floor(log2) misrounds near powers of two; see textstats.lm_surprisal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """(bucket, min_rows, n_keys, n_rows, hot_key, hot_rows) per log2
    bucket of per-key row count. `hot_key` is the bucket's
    highest-count key (ties broken key-desc via struct max — total
    order, deterministic). NULL key parts fold to '' inside a
    '|'-joined composite, matching the oracle."""
    key = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols]
    )
    counts = df.groupBy(key.alias("key")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    return (
        counts.withColumn(
            "bucket", F.expr("cast(length(bin(n)) - 1 as bigint)")
        )
        .groupBy("bucket")
        .agg(
            F.expr("cast(pow(2, bucket) as bigint)").alias("min_rows"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.max(F.struct("n", "key")).alias("_hot"),
        )
        .select(
            "bucket",
            "min_rows",
            "n_keys",
            "n_rows",
            F.col("_hot.key").alias("hot_key"),
            F.col("_hot.n").alias("hot_rows"),
        )
    )


def duck_skew_report_sql(rel_sql: str, key_cols: list[str]) -> str:
    """DuckDB twin over `rel_sql` with the same composite key, bucket
    arithmetic (to_base bit-length) and struct-max hot-key rule
    (arg_max on the (n, key) pair via max_by over a row() is not
    portable — replayed as a row_number pick, an independent
    formulation)."""
    key = " || '|' || ".join(
        f"coalesce(cast({c} as varchar), '')" for c in key_cols
    )
    return f"""
with counts as (
  select {key} as key, cast(count(*) as bigint) as n
  from ({rel_sql}) group by 1
),
b as (
  select key, n, cast(length(to_base(n, 2)) - 1 as bigint) as bucket
  from counts
),
hot as (
  select bucket, key, n,
         row_number() over (partition by bucket
                            order by n desc, key desc) as rk
  from b
)
select b.bucket,
       cast(pow(2, b.bucket) as bigint) as min_rows,
       cast(count(*) as bigint) as n_keys,
       cast(sum(b.n) as bigint) as n_rows,
       max(case when h.rk = 1 then h.key end) as hot_key,
       cast(max(case when h.rk = 1 then h.n end) as bigint) as hot_rows
from b
join hot h on h.bucket = b.bucket and h.key = b.key and h.n = b.n
group by 1
"""


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style per-column profile -> (column, n_rows, n_nulls,
    n_distinct, min_val, max_val): the statistics collection pass a
    lakehouse runs before planning (NDVs feed join-size estimates,
    min/max feed zone-map pruning) and the first data-quality report
    run on any new ingest. min/max compute on the NATIVE type and cast
    to string afterwards (string-casting first would order '10' < '9').
    Float columns are the caller's responsibility to exclude or
    pre-quantize — engine float-to-string formatting differs.

    Scale shape: ONE corpus pass — a single global aggregate carrying
    per-column (count, count-nulls, approx-free exact NDV, min, max);
    the count-distincts expand the input |cols| ways pre-shuffle but
    every leg partially aggregates map-side and the reducer state is
    one row. The long-format output is a driver-side stack of that
    single row — |cols| rows total, no second job."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint")
            .alias(f"{c}__nulls"),
            F.count_distinct(c).cast("bigint").alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__nd, {c}__min, {c}__max" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack})"
            " as (column, n_nulls, n_distinct, min_val, max_val)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct",
             "min_val", "max_val")


def duck_table_profile_sql(rel: str, cols: list[str]) -> str:
    """Oracle twin: one union-all branch per column (DuckDB runs them
    over a shared scan; the comparison is on values, not plan)."""
    branches = [
        f"""select '{c}' as "column",
       cast(count(*) as bigint) as n_rows,
       cast(count(*) - count({c}) as bigint) as n_nulls,
       cast(count(distinct {c}) as bigint) as n_distinct,
       cast(min({c}) as varchar) as min_val,
       cast(max({c}) as varchar) as max_val
from {rel}"""
        for c in cols
    ]
    return "\nunion all\n".join(branches)


def join_estimate(
    left: DataFrame, right: DataFrame, key: str
) -> DataFrame:
    """Optimizer-statistics join-size estimation audit -> ONE row
    (n_left, n_right, ndv_left, ndv_right, est_rows, actual_rows,
    err_e6): the textbook equi-join cardinality estimate
    |L ⋈ R| ≈ |L| * |R| / max(ndv_L, ndv_R) (uniformity + containment
    assumptions — what every cost-based optimizer, Catalyst's CBO
    included, computes from ANALYZE stats) next to the TRUE join
    count, with err_e6 = 1e6 * actual / est. The report that tells
    you whether your stats are good enough to trust the planner's
    join ordering, and by how much skew breaks the uniformity
    assumption (err >> 1e6 = a hot key the estimate halved away).

    Scale shape: two independent map-side-combined single-row aggs
    (count + exact NDV per side) + the actual join count — the join
    is the thing being audited, so its cost is the point; the three
    1-row results combine via broadcast crossJoins (the 1-row
    normalizer pattern). All-bigint; est uses div (floor) in both
    engines."""
    ls = left.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_left"),
        F.count_distinct(key).cast("bigint").alias("ndv_left"),
    )
    rs = right.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_right"),
        F.count_distinct(key).cast("bigint").alias("ndv_right"),
    )
    actual = left.select(key).join(right.select(key), key).agg(
        F.count(F.lit(1)).cast("bigint").alias("actual_rows")
    )
    return (
        ls.crossJoin(F.broadcast(rs))
        .crossJoin(F.broadcast(actual))
        .select(
            "n_left", "n_right", "ndv_left", "ndv_right",
            F.expr(
                "(n_left * n_right) div greatest(ndv_left, ndv_right)"
            ).alias("est_rows"),
            "actual_rows",
            F.expr(
                "(1000000 * actual_rows) div"
                " ((n_left * n_right) div greatest(ndv_left, ndv_right))"
            ).alias("err_e6"),
        )
    )


def duck_join_estimate_sql(left_rel: str, right_rel: str, key: str) -> str:
    """Oracle twin. Literal-int trap: counts are bigint already, so the
    products stay bigint; greatest() exists in both dialects."""
    return f"""
with ls as (
  select cast(count(*) as bigint) as n_left,
         cast(count(distinct {key}) as bigint) as ndv_left
  from {left_rel}
),
rs as (
  select cast(count(*) as bigint) as n_right,
         cast(count(distinct {key}) as bigint) as ndv_right
  from {right_rel}
),
act as (
  select cast(count(*) as bigint) as actual_rows
  from {left_rel} l join {right_rel} r using ({key})
)
select n_left, n_right, ndv_left, ndv_right,
       cast((n_left * n_right) // greatest(ndv_left, ndv_right)
            as bigint) as est_rows,
       actual_rows,
       cast((1000000 * actual_rows) //
            ((n_left * n_right) // greatest(ndv_left, ndv_right))
            as bigint) as err_e6
from ls, rs, act
"""


# ---------------------------------------------------------------------------
# data-quality expectations gate (Deequ-style) over the KG pipeline outputs
# ---------------------------------------------------------------------------

# the planted relation-extraction schema (sources/pages.py:780-782) — the
# predicate vocabulary a shipped triple snapshot must stay inside
KNOWN_PREDS = [
    "works_at", "located_in", "has_email", "has_phone", "lives_in",
]
# the reference's detector entity surface (SURVEY §2.3)
KNOWN_ENTITY_TYPES = [
    "PERSON", "ORGANIZATION", "LOCATION", "EMAIL_ADDRESS", "PHONE_NUMBER",
    "URL", "ADDRESS", "ZIPCODE", "US_SSN", "CREDIT_CARD_NUMBER",
]


def _in_list(col: str, vals: list[str]) -> str:
    return f"{col} in ({', '.join(repr(v) for v in vals)})"


def expectations_report(
    clean: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    langs: list[str] | None = None,
    span_checks: bool = False,
) -> DataFrame:
    """Constraint-suite verification (the Deequ/Great-Expectations gate
    a pipeline runs BEFORE publishing a snapshot) -> one row per check:
    (check_id, n_checked, n_violations, passed). Checks: page text
    non-empty, url uniqueness, lang vocabulary; mention surface
    non-empty, entity-type vocabulary, doc_id referential integrity
    against pages; triple fields non-empty, predicate vocabulary,
    duplicate assertions, doc_id referential integrity. With
    span_checks=True two structural checks on mention offsets are
    added (begin >= 0, end > begin) — excluded from the driver oracle
    because the golden-mention truth carries no offsets.

    Scale shape: each table contributes ONE map-side-combined
    conditional-count agg (uniqueness via count distinct — Spark's
    two-phase expand, never a window); the two FK checks are LEFT
    joins against the distinct page-id set with a null-probe count
    folded in the same pass — the only row-scale exchanges, keyed on
    doc_id (uniform by construction). Output is a constant ~10 rows;
    a failed `passed` bit is what blocks the downstream publish."""
    langs = sorted(langs) if langs else None
    lang_pred = (
        _in_list("lang", langs) if langs else "lang is not null"
    )

    def rows(agg_df, checks):
        # one stack() over the single agg row -> (check_id, n, v)
        stack = ", ".join(
            f"'{cid}', {n}, {v}" for cid, n, v in checks
        )
        return agg_df.selectExpr(
            f"stack({len(checks)}, {stack}) as (check_id, n_checked,"
            " n_violations)"
        )

    p = clean.agg(
        F.expr("cast(count(*) as bigint)").alias("n"),
        F.expr(
            "cast(coalesce(sum(case when text is null or length(text) = 0"
            " then 1 else 0 end), 0) as bigint)"
        ).alias("v_text"),
        F.expr("cast(count(*) - count(distinct url) as bigint)").alias(
            "v_url"
        ),
        F.expr(
            f"cast(coalesce(sum(case when not ({lang_pred}) then 1 else 0"
            " end), 0) as bigint)"
        ).alias("v_lang"),
    )
    p_rows = rows(p, [
        ("pages_text_nonempty", "n", "v_text"),
        ("pages_url_unique", "n", "v_url"),
        ("pages_lang_known", "n", "v_lang"),
    ])

    page_ids = clean.select("doc_id").distinct().withColumn(
        "_hit", F.lit(1)
    )
    m = mentions.join(page_ids, "doc_id", "left").agg(
        F.expr("cast(count(*) as bigint)").alias("n"),
        F.expr(
            "cast(coalesce(sum(case when mention is null or length(mention) = 0"
            " then 1 else 0 end), 0) as bigint)"
        ).alias("v_empty"),
        F.expr(
            f"cast(coalesce(sum(case when not ({_in_list('entity_type', KNOWN_ENTITY_TYPES)})"
            " then 1 else 0 end), 0) as bigint)"
        ).alias("v_type"),
        F.expr(
            "cast(coalesce(sum(case when _hit is null then 1 else 0 end), 0) as bigint)"
        ).alias("v_fk"),
        *(
            [
                F.expr(
                    "cast(coalesce(sum(case when `begin` < 0 then 1 else 0"
                    " end), 0) as bigint)"
                ).alias("v_beg"),
                F.expr(
                    "cast(coalesce(sum(case when `end` <= `begin` then 1"
                    " else 0 end), 0) as bigint)"
                ).alias("v_end"),
            ]
            if span_checks
            else []
        ),
    )
    m_checks = [
        ("mentions_surface_nonempty", "n", "v_empty"),
        ("mentions_type_known", "n", "v_type"),
        ("mentions_doc_fk", "n", "v_fk"),
    ]
    if span_checks:
        m_checks += [
            ("mentions_begin_nonneg", "n", "v_beg"),
            ("mentions_end_after_begin", "n", "v_end"),
        ]
    m_rows = rows(m, m_checks)

    t = triples.join(page_ids, "doc_id", "left").agg(
        F.expr("cast(count(*) as bigint)").alias("n"),
        F.expr(
            "cast(coalesce(sum(case when subj is null or length(subj) = 0"
            " or pred is null or length(pred) = 0"
            " or obj is null or length(obj) = 0 then 1 else 0 end), 0)"
            " as bigint)"
        ).alias("v_empty"),
        F.expr(
            f"cast(coalesce(sum(case when not ({_in_list('pred', KNOWN_PREDS)})"
            " then 1 else 0 end), 0) as bigint)"
        ).alias("v_pred"),
        F.expr(
            "cast(count(*) - count(distinct struct(doc_id, subj, pred, obj))"
            " as bigint)"
        ).alias("v_dup"),
        F.expr(
            "cast(coalesce(sum(case when _hit is null then 1 else 0 end), 0) as bigint)"
        ).alias("v_fk"),
    )
    t_rows = rows(t, [
        ("triples_fields_nonempty", "n", "v_empty"),
        ("triples_pred_known", "n", "v_pred"),
        ("triples_dup_assertions", "n", "v_dup"),
        ("triples_doc_fk", "n", "v_fk"),
    ])

    return (
        p_rows.unionByName(m_rows)
        .unionByName(t_rows)
        .select(
            "check_id",
            "n_checked",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def duck_expectations_sql(
    pages_sql: str,
    mentions_sql: str,
    triples_sql: str,
    langs: list[str] | None = None,
) -> str:
    """Oracle twin of expectations_report (driver check set — no span
    checks, the golden mentions carry no offsets). sum()/count() cast
    back from HUGEINT per the dialect trap."""
    langs = sorted(langs) if langs else None
    lang_pred = _in_list("lang", langs) if langs else "lang is not null"
    tk = _in_list("entity_type", KNOWN_ENTITY_TYPES)
    pk = _in_list("pred", KNOWN_PREDS)
    return f"""
with pages as ({pages_sql}),
mentions as ({mentions_sql}),
triples as ({triples_sql}),
pids as (select distinct doc_id from pages),
p as (
  select cast(count(*) as bigint) as n,
         cast(sum(case when text is null or length(text) = 0
              then 1 else 0 end) as bigint) as v_text,
         cast(count(*) - count(distinct url) as bigint) as v_url,
         cast(sum(case when not ({lang_pred}) then 1 else 0 end)
              as bigint) as v_lang
  from pages
),
m as (
  select cast(count(*) as bigint) as n,
         cast(sum(case when mention is null or length(mention) = 0
              then 1 else 0 end) as bigint) as v_empty,
         cast(sum(case when not ({tk}) then 1 else 0 end) as bigint)
           as v_type,
         cast(sum(case when pids.doc_id is null then 1 else 0 end)
              as bigint) as v_fk
  from mentions left join pids on mentions.doc_id = pids.doc_id
),
t as (
  select cast(count(*) as bigint) as n,
         cast(sum(case when subj is null or length(subj) = 0
              or pred is null or length(pred) = 0
              or obj is null or length(obj) = 0 then 1 else 0 end)
              as bigint) as v_empty,
         cast(sum(case when not ({pk}) then 1 else 0 end) as bigint)
           as v_pred,
         cast(count(*) - count(distinct (triples.doc_id, subj, pred, obj))
              as bigint) as v_dup,
         cast(sum(case when pids.doc_id is null then 1 else 0 end)
              as bigint) as v_fk
  from triples left join pids on triples.doc_id = pids.doc_id
)
select 'pages_text_nonempty' as check_id, n as n_checked,
       v_text as n_violations, v_text = 0 as passed from p
union all select 'pages_url_unique', n, v_url, v_url = 0 from p
union all select 'pages_lang_known', n, v_lang, v_lang = 0 from p
union all select 'mentions_surface_nonempty', n, v_empty, v_empty = 0 from m
union all select 'mentions_type_known', n, v_type, v_type = 0 from m
union all select 'mentions_doc_fk', n, v_fk, v_fk = 0 from m
union all select 'triples_fields_nonempty', n, v_empty, v_empty = 0 from t
union all select 'triples_pred_known', n, v_pred, v_pred = 0 from t
union all select 'triples_dup_assertions', n, v_dup, v_dup = 0 from t
union all select 'triples_doc_fk', n, v_fk, v_fk = 0 from t
"""
