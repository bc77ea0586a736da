"""Corpus-frequency line dedup (C4/RefinedWeb boilerplate removal):
hand-case semantics + physical-plan guard (broadcast drop list, no
cartesian)."""

def test_line_dedup_hand_case(spark):
    """Boilerplate lines (df > cap) are dropped; per-doc content and
    order survive; counts are exact."""
    from nerpii_spark.operators.dedup import line_dedup

    nav = "<nav>Top Nav</nav>"
    rows = [
        (i, f"<html>{nav}<p>unique {i} words. shared tail {i}.</p></html>"
            .encode())
        for i in range(5)
    ]
    pages = spark.createDataFrame(rows, "doc_id bigint, html binary")
    out = {r["doc_id"]: r for r in line_dedup(pages, df_cap=2).collect()}
    assert len(out) == 5
    for i in range(5):
        r = out[i]
        # 'Top Nav' df=5 > 2 dropped; the two content lines df=1 kept
        assert r["n_dropped"] == 1 and r["n_kept"] == 2
        assert r["text_kept"] == f"unique {i} words shared tail {i}."


def test_line_dedup_plan_broadcasts_drop_list(spark):
    """The high-df drop list joins via broadcast — the corpus-sized line
    stream is never shuffled by line key for membership, and there is no
    cartesian anywhere."""
    import __spark_entry__ as E

    df = E.q_dedup_lines(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the planted-corpus
    # generator's 5-row sentence-index range joins (j < n_sent, one per
    # pass over the generated pages), never the operator itself
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "j#" in line and "< (" in line, line


def test_prefix_filter_exact_where_df_cap_drops(spark):
    """The theorem-backed contrast between the two exact strategies: a
    cluster of docs whose EVERY shingle is hotter than max_df yields
    zero candidates under the df-capped join (documented drop
    semantics) but the complete pair set under prefix filtering —
    and prefix results equal brute-force truth on a mixed corpus."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from nerpii_spark.operators.dedup import (
        ngram_candidate_pairs,
        prefix_filter_pairs,
        with_hashed_shingles,
    )

    same = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, same) for i in range(70)]
        + [(100, "totally unrelated content here"),
           (101, "another disjoint document body")],
        "doc_id bigint, text string",
    )
    assert ngram_candidate_pairs(docs, max_df=64).count() == 0
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_pairs(docs).collect()
    }
    assert got == set(combinations(range(70), 2))
    # exactness on the mixed corpus: every reported pair is J >= tau
    # with true counts (identical docs -> n_inter == n_union)
    full = prefix_filter_pairs(docs).collect()
    assert all(r["n_inter"] == r["n_union"] for r in full)
    n_sh = with_hashed_shingles(docs).where(
        F.col("doc_id") == 0
    ).select(F.expr("size(hsh)")).collect()[0][0]
    assert all(r["n_union"] == n_sh for r in full)


def test_url_normalize_hand_cases(spark):
    from nerpii_spark.operators.dedup import url_normalize

    cases = [
        # scheme+host lowercased, PATH CASE PRESERVED
        ("HTTPS://WWW.Ex.COM/Path/X", "https://www.ex.com/Path/X"),
        # default port stripped per scheme; non-default kept
        ("https://ex.com:443/a", "https://ex.com/a"),
        ("http://ex.com:80/a", "http://ex.com/a"),
        ("http://ex.com:443/a", "http://ex.com:443/a"),
        ("https://ex.com:8443/a", "https://ex.com:8443/a"),
        # fragment dropped, even with a query after it is NOT (fragment
        # terminates the URL)
        ("https://ex.com/a#frag", "https://ex.com/a"),
        ("https://ex.com/a?x=1#frag", "https://ex.com/a?x=1"),
        # utm_* dropped; survivors sorted; all-tracking -> no '?'
        ("https://ex.com/a?b=2&utm_source=s&a=1", "https://ex.com/a?a=1&b=2"),
        ("https://ex.com/a?utm_a=1&utm_b=2", "https://ex.com/a"),
        # empty query / dangling separators collapse
        ("https://ex.com/a?", "https://ex.com/a"),
        ("https://ex.com/a?&b=2&", "https://ex.com/a?b=2"),
        # 'utmost=1' is NOT a tracking param (exact utm_ prefix only)
        ("https://ex.com/a?utmost=1", "https://ex.com/a?utmost=1"),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "i long, url_raw string"
    )
    got = {
        r["i"]: r["url_norm"]
        for r in url_normalize(df).select("i", "url_norm").collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_containment_catches_doc_in_doc_jaccard_misses(spark):
    from nerpii_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon"
    host = (
        quote
        + " zeta eta theta iota kappa lamda mu nu xi omicron pi rho"
        + " sigma tau upsilon phi chi psi omega one two three four five"
    )
    df = spark.createDataFrame(
        [(1, quote, "en"), (2, host, "en"), (3, "unrelated words only", "en")],
        "doc_id long, text string, lang string",
    )
    cont = {
        (r["id_a"], r["id_b"]): r["cont_milli"]
        for r in containment_pairs(df).collect()
    }
    # the quote's shingles are ALL inside the host -> containment 1000
    assert cont == {(1, 2): 1000}
    # symmetric Jaccard misses it: |A|/|B| = 3/28 << tau
    jac = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(df).collect()}
    assert (1, 2) not in jac


def test_quality_survivors_keeps_best_margin_member(spark):
    from nerpii_spark.operators.dedup import quality_survivors
    from nerpii_spark.operators.textstats import quality_classifier

    # two exact copies (same text -> same cluster, same margin -> tie
    # breaks to min id) plus a singleton
    df = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta", "en"),
            (20, "alpha beta gamma delta epsilon zeta", "en"),
            (30, "totally different content here now", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r["keep_id"]: (r["n_members"], r["margin_e6"])
        for r in quality_survivors(df).collect()
    }
    margins = {
        r["doc_id"]: r["margin_e6"] for r in quality_classifier(df).collect()
    }
    assert set(got) == {10, 30}
    assert got[10] == (2, margins[10])
    assert got[30] == (1, margins[30])
