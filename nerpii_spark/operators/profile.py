"""Tabular mode — reproduce the reference's column-profiling pipeline
(`dict_global_entities`) as distributed DataFrame ops.

Reference lifecycle E1/E2 (named_entity_recognizer.py:557-574, README
order presidio -> manual -> model), stage for stage:

  O10/O11 per-value first-entity + 30% threshold   :432-452
  O12     LOCATION >10% override ('name' guard)    :454-474
  O13     majority vote + confidence               :476-489
  O16     column-NAME rules (ZIPCODE/CREDIT_CARD,
          exact boolean precedence, overwrite)     :523-555
  O14/O15 model stage for still-None columns,
          B-ORG tag freq > 10%                     :491-521

Differences (deliberate, documented):
  * detection engines are the deterministic stand-ins of operators/detect.py
    (sandbox has no Presidio/spaCy/BERT); gazetteer PERSON/LOCATION are
    ANCHORED (full-value) in tabular mode, structural regexes are
    contains-mode — mirrors how Presidio/spaCy behave on homogeneous cells
  * mode tie-break is deterministic (count desc, entity asc) instead of
    the reference's set-iteration-order `max(set(l), key=l.count)` (:485)
  * value-level CREDIT_CARD is regex-only (the Luhn checksum stays in the
    page-mode detector)

The whole pipeline is Catalyst-only — one melt (no shuffle), one
groupBy(col, entity) aggregation pass, window mode; no Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from ..functions import gazetteers as G

# ---------------------------------------------------------------------------
# value-level detector suite (dialect-portable regexes: Java + RE2/DuckDB)
# ---------------------------------------------------------------------------


def _alt(words: list[str]) -> str:
    return "|".join(re.escape(w) for w in sorted(words, key=len, reverse=True))


RX_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RX_URL = r"https?://[^\s<>\"']+"
RX_PHONE = r"\(\d{3}\) \d{3}-\d{4}|\d{3}-\d{3}-\d{4}"
RX_SSN = r"\d{3}-\d{2}-\d{4}"
RX_CARD = r"(^|[^0-9-])[0-9]{13,16}($|[^0-9-])"
_DENY = [w for w in G.ADDRESS_DENY_LIST if w != "C/"]
RX_ADDRESS = rf"\b(?:{_alt(_DENY)})\b|C/"
_FIRSTS = G.FIRST_NAMES + [n.upper() for n in G.FIRST_NAMES]
# full name, or a bare first name (tabular first_name columns — the
# reference's spaCy assigns PERSON to those too)
RX_PERSON_FULL = (
    rf"^(?:{_alt(_FIRSTS)}) (?:[A-Z]\. )?[A-Z][a-z]+$|^(?:{_alt(_FIRSTS)})$"
)
_LOCS = G.CITIES + G.STATES + G.COUNTRIES + G.STATE_ABBR
RX_LOC_FULL = rf"^(?:{_alt(_LOCS)})$"
RX_ORG_FULL = rf"^[A-Z][a-z]+ (?:{_alt(G.ORG_SUFFIXES)})$|^University of [A-Z][a-z]+$"

# priority order = the reference's first-result-per-value semantics (:442-446)
VALUE_DETECTORS: list[tuple[str, str]] = [
    ("EMAIL_ADDRESS", RX_EMAIL),
    ("URL", RX_URL),
    ("PHONE_NUMBER", RX_PHONE),
    ("US_SSN", RX_SSN),
    ("CREDIT_CARD_NUMBER", RX_CARD),
    ("ADDRESS", RX_ADDRESS),
    ("PERSON", RX_PERSON_FULL),
    ("LOCATION", RX_LOC_FULL),
]


def value_detectors(lang: str = "en") -> list[tuple[str, str]]:
    """Detector suite for a language — the tabular mirror of the
    reference's per-lang NLP engine construction
    (named_entity_recognizer.py:359-376: it_core_news_lg vs
    en_core_web_lg). lang='it' swaps the PERSON/LOCATION gazetteers for
    the Italian ones; the structural recognizers are language-neutral."""
    if lang != "it":
        return VALUE_DETECTORS
    firsts = G.IT_FIRST_NAMES + [n.upper() for n in G.IT_FIRST_NAMES]
    rx_person = (
        rf"^(?:{_alt(firsts)}) (?:[A-Z]\. )?[A-Z][a-z]+$|^(?:{_alt(firsts)})$"
    )
    locs = _LOCS + G.IT_CITIES
    rx_loc = rf"^(?:{_alt(locs)})$"
    return [
        (e, rx) for e, rx in VALUE_DETECTORS
        if e not in ("PERSON", "LOCATION")
    ] + [("PERSON", rx_person), ("LOCATION", rx_loc)]


NAN_FILLER = "?"  # named_entity_recognizer.py:286


def _rx_match(dialect: str, col_expr: str, pattern: str) -> str:
    p = pattern.replace("'", "''")
    if dialect == "spark":
        # Spark SQL string literals process backslash escapes; DuckDB's don't
        return f"{col_expr} rlike '{p.replace(chr(92), chr(92) * 2)}'"
    return f"regexp_matches({col_expr}, '{p}')"


def value_entity_sql(dialect: str, col_expr: str = "val", lang: str = "en") -> str:
    """CASE expression assigning the first-matching entity to a cell value
    (the stand-in for Presidio's per-value result, :442-446)."""
    whens = " ".join(
        f"when {_rx_match(dialect, col_expr, rx)} then '{ent}'"
        for ent, rx in value_detectors(lang)
    )
    return f"case {whens} else null end"


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------


def string_columns(df: DataFrame) -> list[str]:
    """O3 dtype projection: the reference's select_dtypes(['object']) (:317)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]


def melt_strings(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Wide -> long (col, val) with the reference's NaN fill (:319-321).
    stack() is a generator expression — no shuffle, no UDF."""
    cols = cols if cols is not None else string_columns(df)
    pairs = ", ".join(f"'{c}', `{c}`" for c in cols)
    return df.select(
        F.expr(f"stack({len(cols)}, {pairs}) as (col, raw)")
    ).select("col", F.coalesce(F.col("raw"), F.lit(NAN_FILLER)).alias("val"))


def manual_rule_entity(col_name: str) -> str | None:
    """O16 column-name rules with the reference's exact boolean precedence
    (:538-551): zipcode check first, credit-card check second (overwrites)."""
    c = col_name.lower()
    ent = None
    if (("postal" in c) and ("code" in c)) or ("zip" in c) or ("cap" in c):
        ent = "ZIPCODE"
    if (("credit" in c) or ("card" in c)) and ("number" in c) or (
        ("carta" in c) and ("credito" in c)
    ):
        ent = "CREDIT_CARD_NUMBER"
    return ent


def column_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    manual: bool = True,
    model: bool = True,
    data_sample: int | None = None,
    lang: str = "en",
) -> DataFrame:
    """-> column_profile(col, entity, confidence): the reference's
    dict_global_entities as a DataFrame (None columns -> entity null).
    `manual`/`model` toggle the O16/O14-O15 stages like the reference's
    assign_entities_manually flags and the presidio-only entry point.
    `data_sample` is the reference's working-set cap (O2,
    named_entity_recognizer.py:287,316 — default 500 there): profile over
    a bounded sample instead of the full table. The reference's sample is
    unseeded (nondeterministic); ours is a deterministic limit()."""
    spark = df.sparkSession
    cols = cols if cols is not None else string_columns(df)
    if not cols:
        return spark.createDataFrame(
            [], "col string, entity string, confidence double"
        )
    if data_sample is not None:
        df = df.limit(data_sample)

    # the melt + 8-regex CASE projection is the dominant cost: checkpoint
    # it so the presidio-counts and model-org aggregations (different
    # groupings — exchange reuse cannot share them) evaluate it ONCE, and
    # derive n_rows from it (|typed| = n_rows x n_cols) instead of a
    # third scan of the base table
    long = melt_strings(df, cols)
    typed = long.withColumn(
        "entity", F.expr(value_entity_sql("spark", "val", lang))
    ).localCheckpoint(eager=False)
    n_rows = typed.count() // len(cols)

    # --- presidio stage: counts per (col, entity) -------------------------
    counts = (
        typed.where(F.col("entity").isNotNull())
        .groupBy("col", "entity")
        .agg(F.count("*").alias("c"))
    )
    n_typed = counts.groupBy("col").agg(F.sum("c").alias("n_typed"))
    # 30% threshold over FULL row count (:449)
    assigned = n_typed.where(F.col("n_typed") > 0.3 * n_rows)

    # O12 LOCATION override: freq over the typed list (:465), 'name' guard
    loc = (
        counts.where(F.col("entity") == "LOCATION")
        .join(assigned, "col")
        .withColumn("freq", F.col("c") / F.col("n_typed"))
        .where((F.col("freq") > 0.1) & (~F.lower(F.col("col")).contains("name")))
        .select("col", F.lit("LOCATION").alias("e_loc"), F.col("freq").alias("s_loc"))
    )

    # O13 majority vote, deterministic tie-break
    wv = W.partitionBy("col").orderBy(F.desc("c"), F.asc("entity"))
    mode = (
        counts.join(assigned, "col")
        .withColumn("rk", F.row_number().over(wv))
        .where(F.col("rk") == 1)
        .select(
            "col",
            F.col("entity").alias("e_mode"),
            (F.col("c") / F.col("n_typed")).alias("s_mode"),
        )
    )
    presidio = (
        assigned.select("col")
        .join(loc, "col", "left")
        .join(mode, "col", "left")
        .select(
            "col",
            F.coalesce("e_loc", "e_mode").alias("e_pres"),
            F.coalesce("s_loc", "s_mode").alias("s_pres"),
        )
    )

    # --- O16 manual stage (metadata only, no scan) ------------------------
    manual_rows = [
        (c, manual_rule_entity(c))
        for c in cols
        if manual and manual_rule_entity(c)
    ]
    manual_df = spark.createDataFrame(
        manual_rows or [(None, None)], "col string, e_man string"
    ).where(F.col("col").isNotNull())

    # --- O14/O15 model stage: B-ORG tag freq over all values --------------
    org_stats = typed.groupBy("col").agg(
        F.sum(
            F.when(F.expr(_rx_match("spark", "val", RX_ORG_FULL)), 1).otherwise(0)
        ).alias("n_org"),
        F.sum(F.size(F.split("val", " "))).alias("n_tags"),
    )
    model_df = (
        org_stats.withColumn("freq", F.col("n_org") / F.col("n_tags"))
        .where((F.col("n_org") > 0) & (F.col("freq") > 0.1))
        .select("col", F.lit("ORGANIZATION").alias("e_model"),
                F.col("freq").alias("s_model"))
    )
    if not model:
        model_df = model_df.where(F.lit(False))

    # --- combine: manual overwrites presidio; model fills remaining None --
    all_cols = spark.createDataFrame([(c,) for c in cols], "col string")
    return (
        all_cols.join(manual_df, "col", "left")
        .join(presidio, "col", "left")
        .join(model_df, "col", "left")
        .select(
            "col",
            F.coalesce("e_man", "e_pres", "e_model").alias("entity"),
            F.when(F.col("e_man").isNotNull(), F.lit(1.0))
            .otherwise(F.coalesce("s_pres", "s_model"))
            .alias("confidence"),
        )
    )


def profile_as_dict(
    df: DataFrame,
    cols: list[str] | None = None,
    manual: bool = True,
    model: bool = True,
) -> dict:
    """dict_global_entities-shaped result for reference-golden tests:
    {col: None | {'entity': str, 'confidence_score': float}}."""
    out: dict = {}
    for r in column_profile(df, cols, manual=manual, model=model).collect():
        out[r["col"]] = (
            None
            if r["entity"] is None
            else {"entity": r["entity"], "confidence_score": r["confidence"]}
        )
    return out


# ---------------------------------------------------------------------------
# dual-dialect oracle SQL (independent recomputation for DuckDB)
# ---------------------------------------------------------------------------


def column_profile_sql(
    dialect: str,
    rel_sql: str,
    cols: list[str],
    manual: bool = True,
    model: bool = True,
    lang: str = "en",
) -> str:
    """Full staged pipeline as one SQL query over `rel_sql` (a relation with
    the given string columns) — the DuckDB oracle twin of column_profile."""
    stack_rows = " union all ".join(
        f"select '{c}' as col, coalesce(\"{c}\", '{NAN_FILLER}') as val from rel"
        for c in cols
    )
    manual_rows = [
        f"select '{c}' as col, '{manual_rule_entity(c)}' as e_man"
        for c in cols
        if manual and manual_rule_entity(c)
    ]
    manual_sql = (
        " union all ".join(manual_rows)
        if manual_rows
        else "select null as col, null as e_man where 1=0"
    )
    all_cols = " union all ".join(f"select '{c}' as col" for c in cols)
    org_match = _rx_match(dialect, "val", RX_ORG_FULL)
    n_tokens = (
        "size(split(val, ' '))"
        if dialect == "spark"
        else "len(string_split(val, ' '))"
    )
    # DuckDB inlines non-materialized CTEs at every reference: `rel` is
    # referenced once per stacked column (~14x) and `typed` carries the
    # full regex battery — materialize both there (measured 6.5s -> fast
    # at sf0.01). Spark SQL has no MATERIALIZED keyword; its optimizer
    # handles the reuse, so the spark dialect emits plain CTEs.
    mat = "materialized " if dialect == "duckdb" else ""
    return f"""
with rel as {mat}({rel_sql}),
long as ({stack_rows}),
typed as {mat}(select col, val, {value_entity_sql(dialect, 'val', lang)} as entity from long),
nrows as (select count(*) as n from rel),
counts as (select col, entity, count(*) as c from typed
           where entity is not null group by 1, 2),
ntyped as (select col, sum(c) as n_typed from counts group by 1),
assigned as (select col, n_typed from ntyped, nrows where n_typed > 0.3 * n),
loc as (
  select c0.col, 'LOCATION' as e_loc, c0.c * 1.0 / a.n_typed as s_loc
  from counts c0 join assigned a on c0.col = a.col
  where c0.entity = 'LOCATION' and c0.c * 1.0 / a.n_typed > 0.1
    and lower(c0.col) not like '%name%'
),
mode_r as (
  select c0.col, c0.entity as e_mode, c0.c * 1.0 / a.n_typed as s_mode,
         row_number() over (partition by c0.col
                            order by c0.c desc, c0.entity asc) as rk
  from counts c0 join assigned a on c0.col = a.col
),
presidio as (
  select a.col,
         coalesce(l.e_loc, m.e_mode) as e_pres,
         coalesce(l.s_loc, m.s_mode) as s_pres
  from assigned a
  left join loc l on a.col = l.col
  left join (select * from mode_r where rk = 1) m on a.col = m.col
),
manual as ({manual_sql}),
org_stats as (
  select col,
         sum(case when {org_match} then 1 else 0 end) as n_org,
         sum({n_tokens}) as n_tags
  from typed group by 1
),
model as (
  select col, 'ORGANIZATION' as e_model, n_org * 1.0 / n_tags as s_model
  from org_stats where n_org > 0 and n_org * 1.0 / n_tags > 0.1
    and {str(model).lower()}
),
allc as ({all_cols})
select a.col,
       coalesce(mn.e_man, p.e_pres, mo.e_model) as entity,
       cast(case when mn.e_man is not null then 1.0
            else coalesce(p.s_pres, mo.s_model) end as double) as confidence
from allc a
left join manual mn on a.col = mn.col
left join presidio p on a.col = p.col
left join model mo on a.col = mo.col
"""


# ---------------------------------------------------------------------------
# privacy risk: k-anonymity / l-diversity (beyond-the-reference extra)
# ---------------------------------------------------------------------------


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_expr: str,
    k: int = 10,
    l_div: int = 3,
) -> DataFrame:
    """Per equivalence class of the quasi-identifier columns:
    (quasi..., n_rows, n_sensitive, k_anonymous, l_diverse) — the
    standard re-identification risk report (Sweeney k-anonymity;
    Machanavajjhala et al. l-diversity) a PII pipeline runs over a
    table BEFORE releasing it, and again over mask_table's output to
    verify the synthesis actually broke the quasi-identifier linkage.
    A class is k-anonymous when it hides each member among >= k rows,
    l-diverse when the sensitive attribute (any SQL expression — pass a
    bucketing expression for continuous values, else every class is
    trivially diverse) takes >= l_div distinct values inside it.

    Scale shape: ONE aggregation pass keyed by the quasi tuple —
    count(*) combines map-side and count(distinct) is Spark's two-phase
    expand-aggregate, so the table is read once and the shuffle carries
    only (quasi, sensitive-bucket) keys; quasi-identifier combinations
    are bounded-cardinality by definition (that is what makes them
    quasi-identifiers), so no hot reducer. Row-level risk (which rows
    sit in a sub-k class) is a broadcast join of this report back to
    the table."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct(F.expr(sensitive_expr))
            .cast("bigint")
            .alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "n_rows",
            "n_sensitive",
            (F.col("n_rows") >= k).alias("k_anonymous"),
            (F.col("n_sensitive") >= l_div).alias("l_diverse"),
        )
    )


def duck_k_anonymity_sql(
    rel: str,
    quasi_cols: list[str],
    sensitive_expr: str,
    k: int = 10,
    l_div: int = 3,
) -> str:
    """DuckDB twin of k_anonymity_report (exact SQL semantics — counts
    and thresholds only, nothing engine-specific)."""
    q = ", ".join(quasi_cols)
    return f"""
select {q},
       cast(count(*) as bigint) as n_rows,
       cast(count(distinct {sensitive_expr}) as bigint) as n_sensitive,
       count(*) >= {k} as k_anonymous,
       count(distinct {sensitive_expr}) >= {l_div} as l_diverse
from {rel} group by {q}
"""


# ---------------------------------------------------------------------------
# differentially-private-style noisy count release (discrete Laplace)
# ---------------------------------------------------------------------------

DP_ALPHA_NUM, DP_ALPHA_DEN = 3, 4  # alpha = 3/4  =>  eps = ln(4/3)
DP_SALT_POS, DP_SALT_NEG = 41, 43


def _dp_a_fp() -> int:
    """-log2(alpha) in the intmath fixed point: log2(den/num) =
    log2fp(den * 2^28) - log2fp(num * 2^28) — pure integer constant, one
    value shared by Spark / DuckDB / Python."""
    from ..functions.intmath import log2fp

    return log2fp(DP_ALPHA_DEN << 28) - log2fp(DP_ALPHA_NUM << 28)


def dp_noisy_counts(
    counts: DataFrame,
    key_col: str,
    cnt_col: str,
    out_col: str = "n_noisy",
) -> DataFrame:
    """Noisy count release with DISCRETE LAPLACE (two-sided geometric)
    noise -> (key, out_col): the mechanism behind differentially-private
    histogram publication (Ghosh-Roughgarden-Sundararajan 2009: the
    two-sided geometric is the universally optimal eps-DP mechanism for
    counts; here alpha = DP_ALPHA_NUM/DEN, eps = -ln alpha). The
    engine-convention caveat stated plainly: draws are SEEDED PORTABLE-
    HASH pseudo-randomness keyed by the released cell (the repo's rule
    for everything stochastic — deterministic, resumable, oracle-
    replayable), so this is the DP *mechanism shape* with reproducible
    draws, not a cryptographic noise source; swap the hash for a CSPRNG
    at release time, same plan.

    Sampling identity (pure intmath integers): a one-sided geometric
    G ~ P(G >= k) = alpha^k inverts as G = floor(log2(u) / log2(alpha))
    = e_fp div A_FP, with e_fp = -log2fp(hash-uniform) and A_FP =
    -log2fp(alpha); noise = G_pos - G_neg from two salt-independent
    draws; release = max(count + noise, 0) (post-processing clamp —
    DP-safe). Scale shape: input is an already-aggregated count table
    (one row per released cell); the noise is ~24 chained codegen
    projections per row (two log2fp digit recurrences), zero Python,
    zero shuffle, zero collect."""
    from ..functions.hashing import sql_h2, sql_strhash
    from ..functions.intmath import LOG2M_FP, spark_log2fp_cols

    a_fp = _dp_a_fp()
    df = counts.select(
        F.col(key_col), F.col(cnt_col).cast("bigint").alias("_cnt")
    )
    # each draw chains h2 TWICE: two single-h2 draws differing only in
    # salt are affine-correlated (the shared-slope trap hashing.py
    # documents — their difference is (prev % 3037) * 194, ~0.03% of M,
    # so G_pos - G_neg would be ~always 0); the second h2 breaks the
    # shared slope and the draws decorrelate
    for salt, ecol in ((DP_SALT_POS, "_e_pos"), (DP_SALT_NEG, "_e_neg")):
        df = df.withColumn(
            "_hu",
            F.expr(
                f"{sql_h2(sql_h2(sql_strhash(key_col), salt), salt + 2)}"
                " + 1"
            ),
        )
        df = spark_log2fp_cols(df, "_hu", "_l2")
        df = df.withColumn(
            ecol, F.expr(f"cast({LOG2M_FP} - _l2 as bigint)")
        ).drop("_hu", "_l2")
    return df.select(
        key_col,
        F.expr(
            f"greatest(_cnt + _e_pos div {a_fp} - _e_neg div {a_fp},"
            f" cast(0 as bigint))"
        ).alias(out_col),
    )


def duck_dp_noisy_counts_sql(
    counts_sql: str, key_col: str, cnt_col: str, out_col: str = "n_noisy"
) -> str:
    """Oracle twin of dp_noisy_counts: same hash draws, same fixed-point
    log2 replay, same floor-div geometric inversion and clamp."""
    from ..functions.hashing import sql_h2, sql_strhash
    from ..functions.intmath import LOG2M_FP, duck_log2fp_expr

    a_fp = _dp_a_fp()
    hp = (
        f"({sql_h2(sql_h2(sql_strhash(key_col), DP_SALT_POS), DP_SALT_POS + 2)}"
        " + 1)"
    )
    hn_ = (
        f"({sql_h2(sql_h2(sql_strhash(key_col), DP_SALT_NEG), DP_SALT_NEG + 2)}"
        " + 1)"
    )
    return f"""
with base as ({counts_sql}),
noise as (
  select {key_col}, cast({cnt_col} as bigint) as cnt,
         cast({LOG2M_FP} - {duck_log2fp_expr(hp)} as bigint) as e_pos,
         cast({LOG2M_FP} - {duck_log2fp_expr(hn_)} as bigint) as e_neg
  from base
)
select {key_col},
       greatest(cnt + e_pos // {a_fp} - e_neg // {a_fp},
                cast(0 as bigint)) as {out_col}
from noise
"""


# ---------------------------------------------------------------------------
# privacy risk: aggregate re-identification metrics + generalization ladder
# ---------------------------------------------------------------------------


def reident_risk(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """Table-level re-identification risk summary over the equivalence
    classes of the quasi-identifier tuple -> ONE row:
    (n_rows, n_classes, n_unique_rows, min_k, max_k, uniq_ppm,
    marketer_ppm, journalist_ppm). The standard disclosure-risk triple
    (El Emam & Dankar 2008): journalist risk = 1/min_k (worst-case
    class), marketer risk = n_classes/n_rows (expected fraction
    re-identified by matching every row), uniqueness = population
    uniques (Sweeney's 87%-of-US result is exactly this number over
    (zip, birth date, sex)). All ratios are released as exact integer
    parts-per-million (bigint floor division) — the repo's no-float
    convention, bit-identical across engines.

    Scale shape: one map-side-combined count per quasi tuple, then one
    8-number global fold; nothing but (quasi, count) ever shuffles and
    the final agg is a single-partition fold over already-tiny class
    rows. No collect, no window."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("bigint").alias("k")
    )
    return (
        classes.agg(
            F.sum("k").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum(F.when(F.col("k") == 1, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_unique_rows"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .select(
            "n_rows",
            "n_classes",
            "n_unique_rows",
            "min_k",
            "max_k",
            F.expr("1000000 * n_unique_rows div n_rows").alias("uniq_ppm"),
            F.expr("1000000 * n_classes div n_rows").alias("marketer_ppm"),
            F.expr("1000000 div min_k").alias("journalist_ppm"),
        )
    )


def duck_reident_risk_sql(rel: str, quasi_cols: list[str]) -> str:
    """DuckDB twin of reident_risk (sum(bigint)->HUGEINT recast per the
    dialect trap; // is DuckDB's integer floor division)."""
    q = ", ".join(quasi_cols)
    return f"""
with classes as (
  select cast(count(*) as bigint) as k from {rel} group by {q}
),
agg as (
  select cast(sum(k) as bigint) as n_rows,
         cast(count(*) as bigint) as n_classes,
         cast(sum(case when k = 1 then 1 else 0 end) as bigint)
           as n_unique_rows,
         cast(min(k) as bigint) as min_k,
         cast(max(k) as bigint) as max_k
  from classes
)
select n_rows, n_classes, n_unique_rows, min_k, max_k,
       1000000 * n_unique_rows // n_rows as uniq_ppm,
       1000000 * n_classes // n_rows as marketer_ppm,
       1000000 // min_k as journalist_ppm
from agg
"""


# generalization ladder for the personal-info fixture: each level COARSENS
# the quasi-identifier tuple (zip -> 3-digit prefix -> drop; city -> drop),
# the anonymization move k-anonymity prescribes when classes are too small.
# Every expression is valid in BOTH Spark SQL and DuckDB SQL verbatim.
GENERALIZE_LEVELS: list[tuple[int, list[str]]] = [
    (0, ["city", "state", "zip"]),
    (1, ["state", "substr(zip, 1, 3)"]),
    (2, ["state"]),
    (3, ["'*'"]),
]


def generalization_ladder_sql(
    dialect: str,
    rel: str,
    levels: list[tuple[int, list[str]]] | None = None,
    k: int = 10,
) -> str:
    """Privacy-utility ladder -> one row per generalization level:
    (level, n_classes, min_k, n_unique_rows, anon_ppm) where anon_ppm is
    the ppm of rows already hidden in classes of >= k. Read top-down it
    answers the release question k-anonymity poses: how much do the
    quasi-identifiers have to be coarsened before the table is safe to
    publish (level 0 over (city, state, zip) reproduces the classic
    everyone-is-unique result; dropping zip to its 3-digit prefix barely
    helps; only state-level generalization reaches k).

    Scale shape: one small group-by per level over the same scan (a
    static UNION ALL of L tiny aggregations — Catalyst reuses the
    materialized source via the shared subquery when `rel` is a view);
    each branch shuffles only its class keys. L is a constant (4), so
    this is L map-side-combined aggs, no window, no collect."""
    div = "div" if dialect == "spark" else "//"
    parts = []
    for lvl, exprs in levels or GENERALIZE_LEVELS:
        q = ", ".join(exprs)
        parts.append(
            f"""
select cast({lvl} as bigint) as level,
       cast(count(*) as bigint) as n_classes,
       cast(min(k) as bigint) as min_k,
       cast(sum(case when k = 1 then 1 else 0 end) as bigint)
         as n_unique_rows,
       (1000000 * cast(sum(case when k >= {k} then k else 0 end) as bigint))
         {div} cast(sum(k) as bigint) as anon_ppm
from (select cast(count(*) as bigint) as k from {rel} group by {q}) c{lvl}
"""
        )
    return " union all ".join(parts)
