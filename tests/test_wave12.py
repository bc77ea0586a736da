"""Wave-12 operators: per-host language mix (webquality.host_lang_mix)
and Hamilton largest-remainder crawl-budget apportionment
(webgraph.crawl_budget). Oracle equality is covered by
tools/check_oracle.py; these tests pin the BEHAVIORAL properties the
hash-match alone cannot express — hand-computed entropy/tie-break
goldens and the apportionment guarantees (sum == budget, within one
fetch of the exact share)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

from nerpii_spark.operators.webgraph import CRAWL_BUDGET, crawl_budget
from nerpii_spark.operators.webquality import host_lang_mix


def _pages(spark):
    import __spark_entry__ as E

    return E._pipeline(spark, SF)["pages"]


# ---------------------------------------------------------------------------
# host_lang_mix
# ---------------------------------------------------------------------------


def test_host_lang_mix_hand_golden(spark):
    """x.example: en=3, it=1 -> top en @ 750000 ppm, entropy_milli =
    1000*ilog2(4) - 1000*(3*ilog2(3) + 1*ilog2(1)) div 4 = 2000 - 750.
    y.example: single-lang -> entropy exactly 0, share exactly 1e6.
    z.example: en=2, de=2 -> tie broken to the LEXICOGRAPHICALLY
    smallest lang (min(struct(-c, lang)))."""
    rows = [
        ("https://x.example/1", "en"),
        ("https://x.example/2", "en"),
        ("https://x.example/3", "en"),
        ("https://x.example/4", "it"),
        ("https://y.example/1", "fr"),
        ("https://y.example/2", "fr"),
        ("https://y.example/3", "fr"),
        ("https://z.example/1", "en"),
        ("https://z.example/2", "en"),
        ("https://z.example/3", "de"),
        ("https://z.example/4", "de"),
    ]
    df = spark.createDataFrame(rows, "url string, lang string")
    got = {r["host"]: r for r in host_lang_mix(df).collect()}
    x = got["x.example"]
    assert (x["n_langs"], x["n_pages"]) == (2, 4)
    assert (x["top_lang"], x["top_share_ppm"]) == ("en", 750_000)
    assert x["entropy_milli"] == 1250
    y = got["y.example"]
    assert (y["n_langs"], y["top_lang"]) == (1, "fr")
    assert y["top_share_ppm"] == 1_000_000
    assert y["entropy_milli"] == 0
    z = got["z.example"]
    assert (z["top_lang"], z["top_share_ppm"]) == ("de", 500_000)
    # balanced 2-way mix at n=4: 1000*2 - 1000*(2*1 + 2*1) div 4 = 1000
    assert z["entropy_milli"] == 1000


def test_host_lang_mix_corpus_invariants(spark):
    """Corpus-wide: one row per host, per-host page counts reconcile
    with the raw table, entropy is 0 iff single-lang, share bounds."""
    pages = _pages(spark)
    out = host_lang_mix(pages).collect()
    n_hosts = pages.select(
        F.expr("regexp_extract(url, 'https?://([^/]+)', 1)")
    ).distinct().count()
    assert len(out) == n_hosts
    assert sum(r["n_pages"] for r in out) == pages.count()
    for r in out:
        assert 1 <= r["n_langs"]
        assert 0 < r["top_share_ppm"] <= 1_000_000
        if r["n_langs"] == 1:
            assert r["entropy_milli"] == 0
            assert r["top_share_ppm"] == 1_000_000
        else:
            assert r["top_share_ppm"] < 1_000_000


# ---------------------------------------------------------------------------
# crawl_budget
# ---------------------------------------------------------------------------


def test_crawl_budget_hand_golden(spark):
    """pages (7, 5, 3), budget 10: quotas 4.67 / 3.33 / 2.0 -> bases
    (4, 3, 2), leftover 1 goes to the largest remainder (host a)."""
    rows = (
        [("https://a.example/%d" % i,) for i in range(7)]
        + [("https://b.example/%d" % i,) for i in range(5)]
        + [("https://c.example/%d" % i,) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "url string")
    got = {r["host"]: r["alloc"] for r in crawl_budget(df, budget=10).collect()}
    assert got == {"a.example": 5, "b.example": 3, "c.example": 2}


def test_crawl_budget_exactness_invariants(spark):
    """The two Hamilton guarantees on the real corpus: sum(alloc) is
    EXACTLY the budget, and every host is within one fetch of its exact
    proportional share (floor(q) <= alloc <= floor(q) + 1)."""
    pages = _pages(spark)
    out = crawl_budget(pages).collect()
    assert sum(r["alloc"] for r in out) == CRAWL_BUDGET
    total = sum(r["n_pages"] for r in out)
    for r in out:
        base = CRAWL_BUDGET * r["n_pages"] // total
        assert base <= r["alloc"] <= base + 1
    # deterministic across runs (the ranking tie-break is total)
    again = crawl_budget(pages).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_crawl_budget_zero_leftover(spark):
    """Exact-proportion corpus (2, 1, 1) at budget 8: no remainder rows,
    every alloc is its exact share."""
    rows = (
        [("https://p.example/%d" % i,) for i in range(2)]
        + [("https://q.example/0",), ("https://r.example/0",)]
    )
    df = spark.createDataFrame(rows, "url string")
    got = {r["host"]: r["alloc"] for r in crawl_budget(df, budget=8).collect()}
    assert got == {"p.example": 4, "q.example": 2, "r.example": 2}
