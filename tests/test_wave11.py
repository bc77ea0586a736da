"""Wave-11 operators: extraction diagnostics, encoding health,
cross-host span reuse (nerpii_spark/operators/webquality.py). Oracle
equality is covered by tools/check_oracle.py; these tests pin the
BEHAVIORAL properties the hash-match alone cannot express — the
per-page markup constants the diag must reproduce, the exact planted
corruption totals, hand-computed syndication pairs."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

from nerpii_spark.operators.webquality import (
    CTRL_AT,
    CTRL_MOD,
    REPL_AT,
    REPL_MOD,
    encoding_health,
    extract_diag,
    span_reuse,
)
from nerpii_spark.sources.pages import page_html


def _clean(spark):
    import __spark_entry__ as E

    return E._pipeline(spark, SF)["clean"]


# ---------------------------------------------------------------------------
# extract_diag
# ---------------------------------------------------------------------------


def test_extract_diag_markup_constants(spark):
    """The planted page skeleton is fixed, so per-page markup counts are
    corpus constants: the diag must report exactly n_pages times the
    skeleton's '<' / '<a href' / '<script' counts (the planted text
    itself carries no markup — asserted), and text bytes must equal
    html bytes minus the skeleton bytes."""
    skel = page_html("", 7).decode()  # doc_id only varies digits
    tags_pp = skel.count("<")
    anchors_pp = skel.count("<a href")
    scripts_pp = skel.count("<script")
    assert (tags_pp, anchors_pp, scripts_pp) == (20, 2, 1)

    clean = _clean(spark)
    assert (
        clean.where(F.col("text").contains("<")).count() == 0
    ), "planted text must be markup-free for the constant to hold"
    rows = extract_diag(clean).collect()
    assert rows, "at least one lang row"
    for r in rows:
        assert r["tags"] == tags_pp * r["n_pages"]
        assert r["anchors"] == anchors_pp * r["n_pages"]
        assert r["scripts"] == scripts_pp * r["n_pages"]
        assert 0 < r["text_bytes"] < r["html_bytes"]
        assert (
            r["text_ratio_ppm"]
            == 1_000_000 * r["text_bytes"] // r["html_bytes"]
        )


# ---------------------------------------------------------------------------
# encoding_health
# ---------------------------------------------------------------------------


def test_encoding_health_planted_totals(spark):
    """Python-mirror the planted corruption over the corpus doc_ids:
    per-lang repl/ctrl/bad counts must match exactly (the repl branch
    wins when a doc hits both moduli)."""
    clean = _clean(spark)
    ids = clean.select("doc_id", "lang").collect()
    exp = {}
    for r in ids:
        e = exp.setdefault(
            r["lang"], {"n": 0, "bad": 0, "repl": 0, "ctrl": 0}
        )
        e["n"] += 1
        if r["doc_id"] % REPL_MOD == REPL_AT:
            e["repl"] += 1 + r["doc_id"] % 3
            e["bad"] += 1
        elif r["doc_id"] % CTRL_MOD == CTRL_AT:
            e["ctrl"] += 1
            e["bad"] += 1
    got = {r["lang"]: r for r in encoding_health(clean).collect()}
    assert set(got) == set(exp)
    for lang, e in exp.items():
        g = got[lang]
        assert g["n_pages"] == e["n"]
        assert g["bad_pages"] == e["bad"]
        assert g["repl_chars"] == e["repl"]
        assert g["ctrl_chars"] == e["ctrl"]
        assert g["bad_ppm"] == 1_000_000 * e["bad"] // e["n"]
    # the corruption is real at this SF (not a vacuous all-zero audit)
    assert sum(e["repl"] for e in exp.values()) > 0
    assert sum(e["ctrl"] for e in exp.values()) > 0


# ---------------------------------------------------------------------------
# span_reuse
# ---------------------------------------------------------------------------


def test_span_reuse_hand_graph(spark):
    """Three hosts; a and b share 3 distinct 8-token spans (a 10-token
    common passage = 3 windows), a and c share only 1 -> below
    min_shared. A 4th 'template' host pair shares a span served by MANY
    hosts -> df-capped away when max_hosts is tightened."""
    passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    boiler = "one two three four five six seven eight"
    rows = [
        ("https://a.example/p1", f"{passage} unique-a tail-a pad-a more-a"),
        ("https://b.example/p1", f"{passage} unique-b tail-b pad-b more-b"),
        # c shares only the FIRST 8-token window of the passage
        (
            "https://c.example/p1",
            " ".join(passage.split()[:8]) + " zz yy xx ww vv uu tt ss",
        ),
        ("https://d.example/p1", boiler + " d1 d2 d3 d4 d5 d6 d7"),
        ("https://e.example/p1", boiler + " e1 e2 e3 e4 e5 e6 e7"),
        ("https://f.example/p1", boiler + " f1 f2 f3 f4 f5 f6 f7"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = {
        (r["host_a"], r["host_b"]): r["n_shared"]
        for r in span_reuse(df, w=8, min_shared=3, max_hosts=64).collect()
    }
    # the 10-token passage yields exactly 3 shared 8-token windows
    assert out == {("a.example", "b.example"): 3}
    # with min_shared=1 the boilerplate trio pairs appear...
    out1 = {
        (r["host_a"], r["host_b"]): r["n_shared"]
        for r in span_reuse(df, w=8, min_shared=1, max_hosts=64).collect()
    }
    for pair in [("d.example", "e.example"), ("d.example", "f.example"),
                 ("e.example", "f.example")]:
        assert out1[pair] == 1
    assert out1[("a.example", "c.example")] == 1
    # ...and the df-cap removes spans served by > max_hosts hosts
    out_cap = {
        (r["host_a"], r["host_b"]): r["n_shared"]
        for r in span_reuse(df, w=8, min_shared=1, max_hosts=2).collect()
    }
    assert ("d.example", "e.example") not in out_cap
    # the FIRST passage window lives on a, b AND c -> 3 hosts > cap 2,
    # so it is capped away too; a-b keep their other two windows
    assert out_cap[("a.example", "b.example")] == 2
    assert ("a.example", "c.example") not in out_cap


def test_span_reuse_corpus_shape(spark):
    """On the real corpus: ordered pairs, threshold respected, top-k cap
    respected, deterministic across runs."""
    clean = _clean(spark)
    rows = span_reuse(clean).collect()
    assert 0 < len(rows) <= 100
    assert all(r["host_a"] < r["host_b"] for r in rows)
    assert all(r["n_shared"] >= 3 for r in rows)
    again = span_reuse(clean).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
