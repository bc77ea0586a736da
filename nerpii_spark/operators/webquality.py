"""Content-level quality and provenance audits over the raw crawl.

Three reports a web-scale ingestion pipeline runs on the page stream
BEFORE anything downstream trusts it:

  * `extract_diag`    — boilerplate-extraction accounting per language:
                        html bytes in vs text bytes out, tag / anchor /
                        script densities, text-to-html ppm. The S1
                        byte-identical invariant says WHAT came out;
                        this is the audit of HOW MUCH and whether the
                        markup mix drifts between crawl snapshots (a
                        site-template change shows up here first).
  * `encoding_health` — mojibake / control-character audit per language:
                        U+FFFD replacement-char and C0-control counts,
                        pages affected, ppm. Decode failures upstream
                        of a trillion-token corpus are silent poison;
                        this is the gate that catches a mis-negotiated
                        charset at the batch level.
  * `span_reuse`      — cross-HOST content syndication: host pairs that
                        share >= `min_shared` exact w-token spans. The
                        content-level companion to webgraph's
                        q_host_mirrors (which pairs hosts by out-LINK
                        overlap): syndication networks, scraped-content
                        farms and licensing relationships share TEXT,
                        not links.

Scale shapes: the two audits are single-scan map-side-combined
aggregations with |langs|-bounded output and ZERO corpus-sized
shuffles — every per-row statistic is pure Catalyst string arithmetic
(length/replace difference counting, no regex except the one C0-class
count), so the scan stays inside whole-stage codegen. span_reuse
shuffles only (md5, host) pairs, never text; span keys are df-capped
(a span on > `max_hosts` hosts is template boilerplate, exactly the
non-discriminative-feature rule q_dedup_ngram's docstring argues), so
the pair fan-out per key is <= C(max_hosts, 2) by construction.

Correctness: the DuckDB twins rebuild the page html from the planted
text via sources/pages.html_expr (asserted byte-identical to the Spark
corpus in tests), replay the same injections (encoding_health plants
its corruption IN-QUERY on both engines — the dup_embs_sql discipline)
and the same floor-div ppm arithmetic, so all three carry full
value-hash oracles.

Reference anchor: nerpii has no crawl-side analogs (its input is a
clean DataFrame); these extend the S1 ingestion stage the way
README.md §pipeline describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = "https?://([^/]+)"

# encoding_health planted corruption (in-query, both engines):
#   doc_id % 37 = 3 -> 1 + doc_id % 3 U+FFFD replacement chars appended
#   doc_id % 41 = 5 -> one BEL (chr 7) control char appended
# (a doc hitting both moduli takes the FIRST branch in both dialects)
REPL_CHAR = "�"
REPL_MOD, REPL_AT = 37, 3
CTRL_MOD, CTRL_AT = 41, 5

# C0 controls except TAB/LF/CR (those are legitimate whitespace).
# Spark string literals process backslashes, DuckDB's do not — the
# CLAUDE.md dialect trap — so the class is spelled per dialect.
_CTRL_CLS_SPARK = "[\\\\x01-\\\\x08\\\\x0b\\\\x0c\\\\x0e-\\\\x1f]"
_CTRL_CLS_DUCK = "[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]"

SPAN_REUSE_W = 8        # window width in whitespace tokens
SPAN_REUSE_MIN = 3      # host pair must share >= this many spans
SPAN_REUSE_CAP = 64     # span on > cap hosts = template boilerplate
SPAN_REUSE_TOPK = 100


def extract_diag(clean: DataFrame) -> DataFrame:
    """-> (lang, n_pages, html_bytes, text_bytes, tags, anchors,
    scripts, text_ratio_ppm): per-language boilerplate-extraction
    accounting over clean pages (which keep the raw html next to the
    extracted text — no join needed).

    All counts are replace-difference arithmetic, NOT regex: occurrences
    of '<' / '<a href' / '<script' fall out of character-length deltas,
    which both engines compute identically and Catalyst keeps in
    codegen. Byte counts use length(binary) (Spark counts bytes on
    binary) vs the oracle's strlen; ppm is floor-div. One scan, one
    map-side-combined agg, |langs| rows out."""
    hs = "cast(html as string)"
    rows = clean.select(
        "lang",
        F.expr("cast(length(html) as bigint)").alias("hb"),
        F.expr("cast(octet_length(text) as bigint)").alias("tb"),
        F.expr(
            f"cast(length({hs}) - length(replace({hs}, '<', ''))"
            " as bigint)"
        ).alias("tg"),
        F.expr(
            f"cast((length({hs}) - length(replace({hs}, '<a href', '')))"
            " div 7 as bigint)"
        ).alias("an"),
        F.expr(
            f"cast((length({hs}) - length(replace({hs}, '<script', '')))"
            " div 7 as bigint)"
        ).alias("sc"),
    )
    return (
        rows.groupBy("lang")
        .agg(
            F.expr("cast(count(*) as bigint)").alias("n_pages"),
            F.sum("hb").alias("html_bytes"),
            F.sum("tb").alias("text_bytes"),
            F.sum("tg").alias("tags"),
            F.sum("an").alias("anchors"),
            F.sum("sc").alias("scripts"),
        )
        .withColumn(
            "text_ratio_ppm",
            F.expr("1000000 * text_bytes div html_bytes"),
        )
    )


def duck_extract_diag_sql(pages_sql_duck: str) -> str:
    """Oracle twin: the duck pages relation carries no html column, so
    the html string is REBUILT from the planted text via html_expr —
    the same constructor the Spark corpus encodes to bytes (asserted
    byte-identical in tests), making byte counts engine-exact."""
    from ..sources.pages import html_expr

    h = html_expr("duck", "text", "doc_id")
    return f"""
with p as ({pages_sql_duck}),
r as (
  select lang,
         cast(strlen(hs) as bigint) as hb,
         cast(strlen(text) as bigint) as tb,
         cast(length(hs) - length(replace(hs, '<', '')) as bigint) as tg,
         cast((length(hs) - length(replace(hs, '<a href', ''))) // 7
              as bigint) as an,
         cast((length(hs) - length(replace(hs, '<script', ''))) // 7
              as bigint) as sc
  from (select lang, text, {h} as hs from p)
)
select lang,
       cast(count(*) as bigint) as n_pages,
       cast(sum(hb) as bigint) as html_bytes,
       cast(sum(tb) as bigint) as text_bytes,
       cast(sum(tg) as bigint) as tags,
       cast(sum(an) as bigint) as anchors,
       cast(sum(sc) as bigint) as scripts,
       cast((1000000 * cast(sum(tb) as bigint)) // cast(sum(hb) as bigint)
            as bigint) as text_ratio_ppm
from r group by lang
"""


def _corrupt_expr() -> str:
    """The in-query planted corruption — one dialect-shared expression
    (||, repeat, chr and % behave identically here): CASE order matters
    (a doc hitting both moduli takes the repl branch in both)."""
    rep = f"repeat('{REPL_CHAR}', cast(1 + doc_id % 3 as int))"
    return (
        f"case when doc_id % {REPL_MOD} = {REPL_AT}"
        f" then text || ' ' || {rep}"
        f" when doc_id % {CTRL_MOD} = {CTRL_AT} then text || chr(7)"
        f" else text end"
    )


def encoding_health(clean: DataFrame) -> DataFrame:
    """-> (lang, n_pages, bad_pages, repl_chars, ctrl_chars, bad_ppm):
    per-language decode-health audit. The corpus is clean by
    construction, so corruption is PLANTED in-query (identically on
    both engines — the dup_embs_sql discipline): ~2.7% of pages gain
    1-3 U+FFFD replacement chars, ~2.4% gain one BEL control char.
    Replacement chars are counted by character-length delta (codegen,
    no regex); the C0-class count is the one regex in the module
    (class ranges spelled per dialect — the backslash-literal trap).
    One scan, map-side-combined agg, |langs| rows."""
    t = _corrupt_expr()
    rows = clean.select(
        "lang",
        F.expr(f"{t}").alias("t"),
    ).select(
        "lang",
        F.expr(
            f"cast(length(t) - length(replace(t, '{REPL_CHAR}', ''))"
            " as bigint)"
        ).alias("rp"),
        F.expr(
            f"cast(regexp_count(t, '{_CTRL_CLS_SPARK}') as bigint)"
        ).alias("ct"),
    )
    return (
        rows.groupBy("lang")
        .agg(
            F.expr("cast(count(*) as bigint)").alias("n_pages"),
            F.expr(
                "cast(sum(case when rp + ct > 0 then 1 else 0 end)"
                " as bigint)"
            ).alias("bad_pages"),
            F.sum("rp").alias("repl_chars"),
            F.sum("ct").alias("ctrl_chars"),
        )
        .withColumn("bad_ppm", F.expr("1000000 * bad_pages div n_pages"))
    )


def duck_encoding_health_sql(pages_sql_duck: str) -> str:
    """Oracle twin of encoding_health: same in-query injection, same
    delta/regex counts, same floor-div ppm."""
    t = _corrupt_expr()
    return f"""
with p as ({pages_sql_duck}),
r as (
  select lang,
         cast(length(t) - length(replace(t, '{REPL_CHAR}', ''))
              as bigint) as rp,
         cast(len(regexp_extract_all(t, '{_CTRL_CLS_DUCK}'))
              as bigint) as ct
  from (select lang, {t} as t from p)
)
select lang,
       cast(count(*) as bigint) as n_pages,
       cast(sum(case when rp + ct > 0 then 1 else 0 end)
            as bigint) as bad_pages,
       cast(sum(rp) as bigint) as repl_chars,
       cast(sum(ct) as bigint) as ctrl_chars,
       cast((1000000 * cast(sum(case when rp + ct > 0 then 1 else 0 end)
                            as bigint))
            // cast(count(*) as bigint) as bigint) as bad_ppm
from r group by lang
"""


def span_reuse(
    clean: DataFrame,
    w: int = SPAN_REUSE_W,
    min_shared: int = SPAN_REUSE_MIN,
    max_hosts: int = SPAN_REUSE_CAP,
    k: int = SPAN_REUSE_TOPK,
) -> DataFrame:
    """-> (host_a, host_b, n_shared): top-k host pairs by the number of
    DISTINCT exact w-token spans both serve — the content-syndication
    graph. Pipeline: tokenize once (the split array is materialized as
    its own projection column — the no-CSE HOF rule), window fingerprints
    (md5 over each w-slice, the span_dedup_stats idiom), DISTINCT
    (span, host), df-cap the span vocabulary at `max_hosts` hosts
    (beyond that a span is template boilerplate shared by everyone and
    discriminates nothing — q_dedup_ngram's drop-not-degrade argument
    applies verbatim, and the cap bounds per-key pair fan-out at
    C(max_hosts, 2)), self-join surviving spans, count per ordered host
    pair, threshold, global top-k (TakeOrderedAndProject — per-partition
    heads, no full sort). Shuffles carry (32-char md5, host) pairs only;
    text never leaves the first stage."""
    toks = clean.select(
        F.expr(f"regexp_extract(url, '{_HOST_RE}', 1)").alias("host"),
        F.split(F.col("text"), " ").alias("t"),
    ).withColumn("n", F.size("t"))
    wins = (
        toks.where(F.col("n") >= w)
        .select(
            "host",
            F.explode(
                F.expr(
                    f"transform(sequence(1, n - {w} + 1),"
                    f" i -> md5(concat_ws(' ', slice(t, i, {w}))))"
                )
            ).alias("k"),
        )
        .distinct()
    )
    keep = (
        wins.groupBy("k")
        .agg(F.count("*").alias("nh"))
        .where((F.col("nh") >= 2) & (F.col("nh") <= max_hosts))
        .select("k")
    )
    w2 = wins.join(keep, "k", "left_semi")
    pairs = (
        w2.alias("a")
        .join(w2.alias("b"), "k")
        .where(F.col("a.host") < F.col("b.host"))
        .select(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .groupBy("host_a", "host_b")
        .agg(F.expr("cast(count(*) as bigint)").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs.orderBy(
        F.desc("n_shared"), F.asc("host_a"), F.asc("host_b")
    ).limit(k)


def duck_span_reuse_sql(
    pages_sql_duck: str,
    w: int = SPAN_REUSE_W,
    min_shared: int = SPAN_REUSE_MIN,
    max_hosts: int = SPAN_REUSE_CAP,
    k: int = SPAN_REUSE_TOPK,
) -> str:
    """Oracle twin of span_reuse: same fingerprints (md5 over the same
    space-joined slices), same df-cap, same (n_shared desc, host_a,
    host_b) total order — pair keys are unique so the top-k cut is
    deterministic. DuckDB range(a, b) is end-EXCLUSIVE (vs Spark's
    inclusive sequence), hence the +2."""
    return f"""
with p as ({pages_sql_duck}),
tok as (
  select regexp_extract(url, '{_HOST_RE}', 1) as host,
         string_split(text, ' ') as t
  from p
),
wins as (
  select distinct host,
         md5(array_to_string(t[i:i + {w} - 1], ' ')) as k
  from (select host, t, unnest(range(1, len(t) - {w} + 2)) as i
        from tok where len(t) >= {w})
),
keep as (
  select k from wins group by k
  having count(*) >= 2 and count(*) <= {max_hosts}
),
pairs as (
  select a.host as host_a, b.host as host_b,
         cast(count(*) as bigint) as n_shared
  from wins a
  join keep using (k)
  join wins b on b.k = a.k and a.host < b.host
  group by 1, 2
  having cast(count(*) as bigint) >= {min_shared}
)
select host_a, host_b, n_shared from pairs
order by n_shared desc, host_a asc, host_b asc
limit {k}
"""


def host_lang_mix(pages: DataFrame) -> DataFrame:
    """-> (host, n_langs, n_pages, top_lang, top_share_ppm,
    entropy_milli): per-host language-mix profile — the multilingual-
    site detector a crawl scheduler and the mixture sampler both read
    (a host serving 8 languages is a translation farm or a big portal;
    a 99%-one-lang host can be routed to a single-lang pipeline).

    entropy_milli reuses outlink_entropy's integer floor-log2 identity
    (1000*ilog2(T) - (1000*sum(c*ilog2(c))) div T) over per-lang page
    counts; top_lang is the lexicographic struct-min trick
    (min(struct(-c, lang)) = max count, lang-asc tie-break — verified
    identical in DuckDB). Two chained map-side-combined aggs keyed by
    (host, lang) then host; a million-page host arrives pre-aggregated;
    no window, no join."""
    counts = pages.select(
        F.expr(f"regexp_extract(url, '{_HOST_RE}', 1)").alias("host"),
        "lang",
    ).groupBy("host", "lang").agg(F.count("*").cast("bigint").alias("c"))
    return (
        counts.groupBy("host")
        .agg(
            F.expr("cast(count(*) as bigint)").alias("n_langs"),
            F.sum("c").cast("bigint").alias("n_pages"),
            F.expr("min(struct(-c as nc, lang as lg))").alias("s"),
            F.expr("max(c)").alias("mx"),
            F.expr(
                "cast(1000 * (length(bin(sum(c))) - 1)"
                " - (1000 * sum(c * (length(bin(c)) - 1)))"
                " div sum(c) as bigint)"
            ).alias("entropy_milli"),
        )
        .select(
            "host",
            "n_langs",
            "n_pages",
            F.col("s.lg").alias("top_lang"),
            F.expr("1000000 * mx div n_pages").alias("top_share_ppm"),
            "entropy_milli",
        )
    )


def duck_host_lang_mix_sql(pages_sql_duck: str) -> str:
    """Oracle twin: same two-stage integer arithmetic (to_base bit
    length, HUGEINT casts, struct-min tie-break)."""
    return f"""
with p as ({pages_sql_duck}),
counts as (
  select regexp_extract(url, '{_HOST_RE}', 1) as host, lang,
         cast(count(*) as bigint) as c
  from p group by 1, 2
),
agg as (
  select host,
         cast(count(*) as bigint) as n_langs,
         cast(sum(c) as bigint) as n_pages,
         min(struct_pack(nc := -c, lg := lang)) as s,
         cast(max(c) as bigint) as mx,
         cast(1000 * (length(to_base(cast(sum(c) as bigint), 2)) - 1)
              - (1000 * cast(sum(c * (length(to_base(c, 2)) - 1)) as bigint))
                // cast(sum(c) as bigint) as bigint) as entropy_milli
  from counts group by 1
)
select host, n_langs, n_pages, s.lg as top_lang,
       cast((1000000 * mx) // n_pages as bigint) as top_share_ppm,
       entropy_milli
from agg
"""
