"""Wave-7 operators: EL candidate priors, retention cohorts,
ANALYZE-style table profiling."""

from pyspark.sql import functions as F

from nerpii_spark.operators.diagnose import table_profile
from nerpii_spark.operators.events import retention_cohorts
from nerpii_spark.operators.link import el_candidates


# ---------------------------------------------------------------------------
# el_candidates
# ---------------------------------------------------------------------------


def _mentions(spark, rows):
    """rows: (doc_id, entity_type, mention)."""
    return spark.createDataFrame(
        rows, "doc_id bigint, entity_type string, mention string"
    )


def test_el_candidates_cross_type_prior(spark):
    # "washington" appears 3x as LOCATION, 1x as PERSON -> two ranked
    # candidates with priors 750000 / 250000
    rows = (
        [(i, "LOCATION", "Washington") for i in range(3)]
        + [(9, "PERSON", "Washington")]
        + [(10, "ORGANIZATION", "Acme Corp")]
    )
    out = el_candidates(_mentions(spark, rows)).collect()
    wa = sorted(
        [r for r in out if r["norm"] == "washington"],
        key=lambda r: r["rk"],
    )
    assert [(r["entity_type"], r["n_mentions"], r["prior_e6"], r["rk"])
            for r in wa] == [
        ("LOCATION", 3, 750_000, 1),
        ("PERSON", 1, 250_000, 2),
    ]
    acme = [r for r in out if r["norm"] == "acme corp"]
    assert len(acme) == 1 and acme[0]["prior_e6"] == 1_000_000
    assert acme[0]["rk"] == 1


def test_el_candidates_casing_folds_into_one_surface(spark):
    rows = [(0, "PERSON", "Ada Lovelace"), (1, "PERSON", "ada lovelace"),
            (2, "PERSON", "ADA  LOVELACE")]
    out = el_candidates(_mentions(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["norm"] == "ada lovelace" and r["n_mentions"] == 3
    assert r["prior_e6"] == 1_000_000


# ---------------------------------------------------------------------------
# retention_cohorts
# ---------------------------------------------------------------------------


def test_retention_cohorts_triangle(spark):
    # u1 first seen day0, active day0+day2; u2 first seen day0, only
    # day0; u3 first seen day1, active day1 twice (dedup) + day2
    ev = spark.createDataFrame(
        [
            (0, "2024-01-01 10:00:00", 1),
            (1, "2024-01-03 09:00:00", 1),
            (2, "2024-01-01 23:59:59", 2),
            (3, "2024-01-02 00:00:01", 3),
            (4, "2024-01-02 11:00:00", 3),
            (5, "2024-01-03 05:00:00", 3),
        ],
        "event_id bigint, ts string, user_id bigint",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(str(r["cohort_day"]), r["day_offset"]): r["n_users"]
           for r in retention_cohorts(ev).collect()}
    assert out == {
        ("2024-01-01", 0): 2,   # u1, u2
        ("2024-01-01", 2): 1,   # u1 returns
        ("2024-01-02", 0): 1,   # u3 (same-day dup counted once)
        ("2024-01-02", 1): 1,   # u3 returns
    }


def test_retention_cohorts_calendar_day_boundary(spark):
    # 23:59 -> 00:01 next day is day_offset 1 even though < 1h elapsed
    ev = spark.createDataFrame(
        [(0, "2024-01-01 23:59:00", 7), (1, "2024-01-02 00:01:00", 7)],
        "event_id bigint, ts string, user_id bigint",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(
        (r["day_offset"], r["n_users"])
        for r in retention_cohorts(ev).collect()
    )
    assert out == [(0, 1), (1, 1)]


# ---------------------------------------------------------------------------
# table_profile
# ---------------------------------------------------------------------------


def test_table_profile_stats(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, None), (10, "a"), (2, "a")],
        "k bigint, s string",
    )
    out = {r["column"]: r for r in table_profile(df, ["k", "s"]).collect()}
    k = out["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    # min/max on the NATIVE type: 10 > 9 numerically ('10' < '2' as str)
    assert (k["min_val"], k["max_val"]) == ("1", "10")
    s = out["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_val"], s["max_val"]) == ("a", "b")


# ---------------------------------------------------------------------------
# sssp_weighted
# ---------------------------------------------------------------------------


def _with_fake_web_graph(spark, edges, fn):
    """edges: (src_host, dst_host, n_links). Runs fn() with
    webgraph.web_graph patched to the crafted edge list."""
    import nerpii_spark.operators.webgraph as WG

    e = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links bigint"
    )
    orig = WG.web_graph
    try:
        WG.web_graph = lambda pages: e
        return fn(WG)
    finally:
        WG.web_graph = orig


def test_sssp_cheap_multihop_beats_expensive_direct(spark):
    # seed = s (highest in-degree). s->t direct over 1 stray link
    # costs 500001; s->a->t over massive links costs 2*(1e6//1e6+1+1)
    # = far less. Bellman-Ford must take the 2-hop path.
    edges = [
        ("s", "t", 1),             # w = 1e6//2 + 1 = 500001
        ("s", "a", 999_999),       # w = 1e6//1e6 + 1 = 2
        ("a", "t", 999_999),       # w = 2
        # make s the top-in-degree seed
        ("x1", "s", 1), ("x2", "s", 1), ("x3", "s", 1),
    ]
    out = _with_fake_web_graph(
        spark, edges,
        lambda WG: {r["host"]: r["cost_e6"]
                    for r in WG.sssp_weighted(None, n_seeds=1).collect()},
    )
    assert out["s"] == 0
    assert out["a"] == 2
    assert out["t"] == 4  # NOT 500001


def test_sssp_round_budget_limits_reach(spark):
    # chain s -> c1 -> c2 -> c3 (+ in-links making s the seed);
    # with n_rounds=2 only c1, c2 are reachable
    edges = [
        ("s", "c1", 999_999), ("c1", "c2", 999_999),
        ("c2", "c3", 999_999),
        ("x1", "s", 1), ("x2", "s", 1), ("x3", "s", 1),
    ]
    out = _with_fake_web_graph(
        spark, edges,
        lambda WG: {r["host"]: r["cost_e6"]
                    for r in WG.sssp_weighted(
                        None, n_seeds=1, n_rounds=2).collect()},
    )
    assert set(out) == {"s", "c1", "c2"}
    assert (out["c1"], out["c2"]) == (2, 4)


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_explicit_merges(spark):
    from nerpii_spark.operators.bpe import tokenizer_fertility

    # merges (a,b)->(ab): "ab" encodes as 1 token, "cd" as 2 chars.
    # en corpus: "ab ab cd" -> words 3, tokens 1+1+2 = 4
    # xx corpus: "cd" -> words 1, tokens 2 (fertility 2.0)
    docs = spark.createDataFrame(
        [(0, "en", "ab ab cd"), (1, "xx", "cd")],
        "doc_id bigint, lang string, text string",
    )
    out = {r["lang"]: r for r in tokenizer_fertility(
        docs, merges=[("a", "b")]).collect()}
    en = out["en"]
    assert (en["n_words"], en["n_tokens"]) == (3, 4)
    assert en["fertility_e6"] == 1_333_333
    xx = out["xx"]
    assert (xx["n_words"], xx["n_tokens"], xx["fertility_e6"]) == (
        1, 2, 2_000_000
    )


# ---------------------------------------------------------------------------
# join_estimate
# ---------------------------------------------------------------------------


def test_join_estimate_uniform_vs_skew(spark):
    from nerpii_spark.operators.diagnose import join_estimate

    # uniform: L = 4 rows over 2 keys, R = 2 rows over 2 keys
    # est = 4*2 // 2 = 4 = actual -> err exactly 1e6
    L = spark.createDataFrame([(1,), (1,), (2,), (2,)], "k bigint")
    R = spark.createDataFrame([(1,), (2,)], "k bigint")
    r = join_estimate(L, R, "k").collect()[0]
    assert (r["est_rows"], r["actual_rows"], r["err_e6"]) == (
        4, 4, 1_000_000
    )

    # skew: both sides hot on key 1 -> actual (3*3 + 1 = 10) above
    # the uniform estimate (4*4 // 2 = 8): err = 1.25e6
    L2 = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k bigint")
    R2 = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k bigint")
    r2 = join_estimate(L2, R2, "k").collect()[0]
    assert r2["est_rows"] == 8
    assert r2["actual_rows"] == 10
    assert r2["err_e6"] == 1_250_000
