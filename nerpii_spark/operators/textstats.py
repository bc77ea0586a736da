"""Text analysis for training-data pipelines over `documents`:
language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting.

Everything is a Catalyst expression (higher-order functions over the
token array — no Python, no shuffle); every operator has a DuckDB twin
built from the same constants so the driver oracle recomputes it
independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import gazetteers as G

# BPE-ish word/number/punctuation pieces (portable regex, no backslash-w)
TOKEN_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _toks(dialect: str, text_expr: str) -> str:
    if dialect == "spark":
        return f"split(lower({text_expr}), ' ')"
    return f"string_split(lower({text_expr}), ' ')"


def _hits(dialect: str, text_expr: str, words: list[str]) -> str:
    lst = G.sql_str_list(words)
    if dialect == "spark":
        return f"size(filter({_toks(dialect, text_expr)}, t -> t in ({lst})))"
    return f"len(list_filter({_toks(dialect, text_expr)}, t -> t in ({lst})))"


def lang_id_sql(dialect: str, text_expr: str) -> str:
    """argmax over per-language stopword hit counts; 'und' when no
    language scores > 0. Deterministic tie-break: language code asc
    (the first lang equal to the max wins). O(L) hit expressions —
    each language's count appears once in greatest() and once in its
    own `when`, so the expression stays linear at 50+ languages."""
    langs = sorted(G.LANG_STOPWORDS)
    hit_cols = {
        lang: _hits(dialect, text_expr, G.LANG_STOPWORDS[lang]) for lang in langs
    }
    mx = f"greatest({', '.join(f'({hit_cols[lang]})' for lang in langs)})"
    conds = " ".join(
        f"when ({hit_cols[lang]}) = mx then '{lang}'" for lang in langs
    )
    inner = f"case when mx = 0 then 'und' {conds} else 'und' end"
    return f"(select {inner} from (select {mx} as mx))"


def token_count_sql(dialect: str, text_expr: str) -> str:
    """(ws_tokens, bpe_tokens)."""
    if dialect == "spark":
        ws = f"size(split({text_expr}, ' '))"
        bpe = f"size(regexp_extract_all({text_expr}, '{TOKEN_RX}', 0))"
    else:
        ws = f"len(string_split({text_expr}, ' '))"
        bpe = f"len(regexp_extract_all({text_expr}, '{TOKEN_RX}'))"
    return ws, bpe


def quality_sql(dialect: str, text_expr: str) -> dict:
    """Quality signals: n_chars, ws token count, mean token length,
    stopword ratio (en), alnum ratio (x1e6 ints to avoid float compare
    drift in the oracle)."""
    ws, _ = token_count_sql(dialect, text_expr)
    stop = _hits(dialect, text_expr, G.EN_STOPWORDS)
    if dialect == "spark":
        alnum = f"length(regexp_replace({text_expr}, '[^A-Za-z0-9]', ''))"
    else:
        alnum = f"length(regexp_replace({text_expr}, '[^A-Za-z0-9]', '', 'g'))"
    return {
        "n_chars": f"length({text_expr})",
        "n_tokens": ws,
        "mean_token_len_e6": (
            f"cast(round(length(replace({text_expr}, ' ', '')) * 1000000.0"
            f" / ({ws}), 0) as bigint)"
        ),
        "stopword_ratio_e6": (
            f"cast(round(({stop}) * 1000000.0 / ({ws}), 0) as bigint)"
        ),
        "alnum_ratio_e6": (
            f"cast(round(({alnum}) * 1000000.0 /"
            f" greatest(length({text_expr}), 1), 0) as bigint)"
        ),
    }


def gopher_sql(dialect: str, text_expr: str) -> dict:
    """Gopher/C4-style document quality gates (Rae et al. 2021 §A1.1,
    public filter heuristics), each a scalar expression with an exact
    DuckDB twin: word count bounds, mean word length band, unique-word
    ratio (repetition signal), alphabetic-word ratio, and the combined
    keep flag. Ratios are x1e6 ints so the oracle compare is exact."""
    toks = _toks(dialect, text_expr)
    if dialect == "spark":
        n = f"size({toks})"
        uniq = f"size(array_distinct({toks}))"
        alpha = f"size(filter({toks}, t -> t rlike '^[a-z]+$'))"
        maxlen = f"array_max(transform({toks}, t -> length(t)))"
    else:
        n = f"len({toks})"
        uniq = f"len(list_distinct({toks}))"
        alpha = f"len(list_filter({toks}, t -> regexp_matches(t, '^[a-z]+$')))"
        maxlen = f"list_max(list_transform({toks}, t -> length(t)))"
    mean_e6 = (
        f"cast(round(length(replace({text_expr}, ' ', '')) * 1000000.0"
        f" / ({n}), 0) as bigint)"
    )
    uniq_e6 = f"cast(round(({uniq}) * 1000000.0 / ({n}), 0) as bigint)"
    alpha_e6 = f"cast(round(({alpha}) * 1000000.0 / ({n}), 0) as bigint)"
    keep = (
        f"(({n}) >= 50 and ({n}) <= 100000"
        f" and {mean_e6} >= 3000000 and {mean_e6} <= 10000000"
        f" and {uniq_e6} >= 200000"
        f" and {alpha_e6} >= 800000"
        f" and ({maxlen}) <= 1000)"
    )
    return {
        "n_words": f"cast({n} as bigint)",
        "max_word_len": f"cast({maxlen} as bigint)",
        "mean_word_len_e6": mean_e6,
        "uniq_ratio_e6": uniq_e6,
        "alpha_ratio_e6": alpha_e6,
        "keep": keep,
    }


def domain_expr(dialect: str, url_expr: str) -> str:
    """Registrable-host extraction (same regexp function in both engines)."""
    return f"regexp_extract({url_expr}, 'https?://([^/]+)', 1)"


def fingerprint_sql(dialect: str, text_expr: str) -> str:
    """Content fingerprint: md5 of the whitespace-normalized lowercase
    text (identical built-in in both engines)."""
    if dialect == "spark":
        norm = f"regexp_replace(lower({text_expr}), '\\\\s+', ' ')"
    else:
        norm = f"regexp_replace(lower({text_expr}), '\\s+', ' ', 'g')"
    return f"md5(trim({norm}))"


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id", F.expr(lang_id_sql("spark", text_col)).alias("lang_pred")
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    ws, bpe = token_count_sql("spark", text_col)
    return docs.select(
        "doc_id",
        F.expr(ws).alias("ws_tokens"),
        F.expr(bpe).alias("bpe_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    exprs = quality_sql("spark", text_col)
    return docs.select(
        "doc_id", *[F.expr(e).alias(name) for name, e in exprs.items()]
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id", F.expr(fingerprint_sql("spark", text_col)).alias("fingerprint")
    )


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    exprs = gopher_sql("spark", text_col)
    return docs.select(
        "doc_id", *[F.expr(e).alias(name) for name, e in exprs.items()]
    )


def domain_stats(pages: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Per-domain corpus stats: doc count + total text bytes. One
    partial-aggregated groupBy; the domain key is far lower-cardinality
    than doc_id, and a boilerplate-heavy domain is exactly what the
    dedup/quality stages consume next."""
    return (
        pages.select(
            F.expr(domain_expr("spark", url_col)).alias("domain"),
            F.length(text_col).alias("n_chars"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).cast("bigint").alias(
                "total_chars"
            ),
        )
    )
