"""Wave-5 operators: integer k-sigma anomaly flagging, ordered funnel,
AMIE rule mining, bow-tie decomposition, URL path templating, per-host
template lines, Hill power-law fit."""

import math

from pyspark.sql import functions as F

from nerpii_spark.functions.intmath import FP_ONE, log2fp
from nerpii_spark.operators.dedup import host_templates
from nerpii_spark.operators.events import anomaly_events, funnel
from nerpii_spark.operators.extract import rule_mining
from nerpii_spark.operators.textstats import url_templates
from nerpii_spark.operators.webgraph import (
    bowtie_from_edges,
    powerlaw_alpha_from_edges,
)


# ---------------------------------------------------------------------------
# anomaly_events
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, "2024-01-01 00:00:%02d" % (i % 60), u, t, v, None)
            for i, (u, t, v) in enumerate(rows)
        ],
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_anomaly_flags_only_the_spike(spark):
    # user 1: nine 10.0s and one 100.0. A single spike among n-1
    # constants sits at EXACTLY (n-1) sigma^2 * k-independent algebra:
    # (n*v - S1)^2 = 9 * (n*S2 - S1^2) identically here, so k=3 is the
    # strict-inequality boundary (not flagged) and k=2 flags it —
    # pinning both sides of the boundary.
    rows = [(1, "view", 10.0)] * 9 + [(1, "view", 100.0)]
    assert anomaly_events(_events(spark, rows), k=3, min_n=8).count() == 0
    out = anomaly_events(_events(spark, rows), k=2, min_n=8).collect()
    assert [r["event_id"] for r in out] == [9]
    r = out[0]
    n, s1 = 10, 9 * 1000 + 10000
    s2 = 9 * 1000 * 1000 + 10000 * 10000
    assert r["dev2"] == (n * 10000 - s1) ** 2
    assert r["thr2"] == 4 * (n * s2 - s1 * s1)
    assert r["dev2"] == 9 * (n * s2 - s1 * s1)  # the exact-3-sigma identity


def test_anomaly_constant_series_never_flags(spark):
    rows = [(1, "view", 5.0)] * 20
    assert anomaly_events(_events(spark, rows)).count() == 0


def test_anomaly_min_n_gate(spark):
    # same spike but only 5 events: below min_n, nothing flagged
    rows = [(1, "view", 10.0)] * 4 + [(1, "view", 100.0)]
    assert anomaly_events(_events(spark, rows), min_n=8).count() == 0


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def _ts_events(spark, rows):
    # rows: (user, type, second)
    return spark.createDataFrame(
        [
            (i, "2024-01-01 00:00:%02d" % s, u, t, 1.0, None)
            for i, (u, t, s) in enumerate(rows)
        ],
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_funnel_order_matters(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        # user 2: click BEFORE the first view -> stage 2 not completed
        (2, "click", 1), (2, "view", 2), (2, "purchase", 3),
        # user 3: view only
        (3, "view", 5),
        # user 4: click at the EXACT first-view ts -> strictly-after rule
        (4, "view", 7), (4, "click", 7), (4, "purchase", 9),
    ]
    r = funnel(_ts_events(spark, rows)).collect()[0]
    assert (r["n_users"], r["n_s1"], r["n_s2"], r["n_s3"]) == (4, 4, 1, 1)
    assert r["conv2_milli"] == 250
    assert r["conv3_milli"] == 1000


def test_funnel_purchase_needs_prior_click(spark):
    rows = [(1, "view", 1), (1, "purchase", 2), (1, "click", 3)]
    r = funnel(_ts_events(spark, rows)).collect()[0]
    assert (r["n_s1"], r["n_s2"], r["n_s3"]) == (1, 1, 0)


# ---------------------------------------------------------------------------
# rule_mining
# ---------------------------------------------------------------------------


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_rule_mining_pair_rule_confidence(spark):
    # capital_of(x,y) on 2 pairs; city_in(x,y) on 3 pairs, 2 shared:
    #   capital_of => city_in : support 2, n_body 2, conf 1.0
    #   city_in => capital_of : support 2, n_body 3, conf 2/3
    t = _triples(spark, [
        ("paris", "capital_of", "france"),
        ("rome", "capital_of", "italy"),
        ("paris", "city_in", "france"),
        ("rome", "city_in", "italy"),
        ("lyon", "city_in", "france"),
    ])
    got = {
        (r["body1"], r["head"]): (r["support"], r["n_body"], r["conf_e6"])
        for r in rule_mining(t).where("rule_type = 'pair'").collect()
    }
    assert got[("capital_of", "city_in")] == (2, 2, 1_000_000)
    assert got[("city_in", "capital_of")] == (2, 3, 666_666)


def test_rule_mining_path_rule(spark):
    # born_in(x,y) & city_in(y,z) => citizen_of(x,z): 2 bodies, 1 head hit
    t = _triples(spark, [
        ("ada", "born_in", "london"),
        ("bob", "born_in", "paris"),
        ("london", "city_in", "uk"),
        ("paris", "city_in", "france"),
        ("ada", "citizen_of", "uk"),
    ])
    rows = rule_mining(t).where(
        "rule_type = 'path' and head = 'citizen_of'"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["body1"], r["body2"]) == ("born_in", "city_in")
    assert (r["support"], r["n_body"], r["conf_e6"]) == (1, 2, 500_000)
    # PCA confidence: bob has NO citizen_of fact at all, so under the
    # partial-completeness assumption he is not a counterexample —
    # the denominator shrinks to ada's body pair and conf_pca = 1.0
    assert r["conf_pca_e6"] == 1_000_000


def test_rule_mining_dedups_assertions(spark):
    # the same fact asserted 3x counts once (distinct-facts collapse)
    t = _triples(spark, [("a", "p", "b")] * 3 + [("a", "q", "b")])
    got = {
        (r["body1"], r["head"]): r["support"]
        for r in rule_mining(t).where("rule_type = 'pair'").collect()
    }
    assert got == {("p", "q"): 1, ("q", "p"): 1}


# ---------------------------------------------------------------------------
# bowtie
# ---------------------------------------------------------------------------


def test_bowtie_full_anatomy(spark):
    # core cycle a-b-c; feeder in1 -> a; sink c -> out1; tendril t1 -> in1
    # (reaches only IN, classic tendril -> 'other'); iso1 -> iso2 island.
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("in1", "a"), ("c", "out1"), ("t1", "in1"),
        ("iso1", "iso2"),
    ]
    # seed = top in-degree with out-edges: a (indeg 2, has out-edge)
    e = spark.createDataFrame(edges, "u string, v string")
    got = {
        r["host"]: r["component"]
        for r in bowtie_from_edges(e, max_depth=4).collect()
    }
    assert got == {
        "a": "core", "b": "core", "c": "core",
        "in1": "in", "t1": "in",  # t1 reaches the seed through in1
        "out1": "out",
        "iso1": "other", "iso2": "other",
    }


def test_bowtie_sink_never_seeds(spark):
    # hub has max in-degree but no out-edges -> seed must be b (the
    # only in-degree>0 host with an out-edge), not hub
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("a", "b"),
             ("b", "c")]
    e = spark.createDataFrame(edges, "u string, v string")
    got = {
        r["host"]: r["component"]
        for r in bowtie_from_edges(e, max_depth=4).collect()
    }
    # seed = b: F = {b, hub, c}, B = {b, a} -> core {b}
    assert got["b"] == "core"
    assert got["hub"] == "out" and got["c"] == "out"
    assert got["a"] == "in"


# ---------------------------------------------------------------------------
# url_templates
# ---------------------------------------------------------------------------


def test_url_templates_trap_detection(spark):
    urls = (
        [f"https://trap.example/cal/2024/{i}" for i in range(20)]
        + ["https://ok.example/about", "https://ok.example/about"]
        + ["https://ok.example/sess/deadbeefcafe1234"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r["host"], r["path_template"]):
            (r["n_urls"], r["n_pages"], r["is_trap"])
        for r in url_templates(df, trap_min_urls=10).collect()
    }
    assert got[("trap.example", "/cal/N/N")] == (20, 20, True)
    # duplicate fetches of ONE url are not a trap (n_urls=1, n_pages=2)
    assert got[("ok.example", "/about")] == (1, 2, False)
    # long hex id folds to H before digit folding can shred it
    assert got[("ok.example", "/sess/H")] == (1, 1, False)


# ---------------------------------------------------------------------------
# host_templates
# ---------------------------------------------------------------------------


def test_host_templates_host_local_boilerplate(spark):
    # host A: 3 pages sharing a footer line; host B: 1 page (below
    # min_pages); the footer is NOT global boilerplate (absent on B)
    rows = [
        (0, "https://a.example/1", b"<p>unique zero</p><p>A footer</p>"),
        (1, "https://a.example/2", b"<p>unique one</p><p>A footer</p>"),
        (2, "https://a.example/3", b"<p>unique two</p><p>A footer</p>"),
        (3, "https://b.example/1", b"<p>B only</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, html binary")
    got = {
        (r["host"], r["line"]): (r["n_docs"], r["host_pages"], r["df_milli"])
        for r in host_templates(df, ratio_milli=800, min_pages=2).collect()
    }
    assert got == {("a.example", "A footer"): (3, 3, 1000)}


# ---------------------------------------------------------------------------
# powerlaw_alpha
# ---------------------------------------------------------------------------


def test_powerlaw_alpha_matches_python_mirror(spark):
    # degree sequence: node d_i in-edges from distinct sources
    degs = {"h1": 8, "h2": 4, "h3": 4, "h4": 2, "h5": 1}
    edges = [
        (f"src{v}_{i}", v) for v, d in degs.items() for i in range(d)
    ]
    e = spark.createDataFrame(edges, "u string, v string")
    r = powerlaw_alpha_from_edges(e, dmin=2).collect()[0]
    tail = [d for d in degs.values() if d >= 2]
    denom_fp = sum(log2fp(d) - log2fp(2) for d in tail)
    assert (r["n_tail"], r["denom_fp"]) == (len(tail), denom_fp)
    denom_milli = (denom_fp * 693147) // 1_000_000
    assert r["alpha_milli"] == 1000 + (1000 * len(tail) * FP_ONE) // denom_milli
    # sanity: the integer fit tracks the float Hill estimate
    alpha_f = 1 + len(tail) / sum(math.log(d / 2) for d in tail)
    assert abs(r["alpha_milli"] / 1000 - alpha_f) < 0.01


def test_powerlaw_alpha_degenerate_tail_is_null(spark):
    # every tail degree == dmin -> zero denominator -> NULL alpha
    edges = [("s1", "a"), ("s2", "a"), ("s1", "b"), ("s2", "b")]
    e = spark.createDataFrame(edges, "u string, v string")
    r = powerlaw_alpha_from_edges(e, dmin=2).collect()[0]
    assert r["alpha_milli"] is None


# ---------------------------------------------------------------------------
# linkpred_auc
# ---------------------------------------------------------------------------


def test_linkpred_auc_rank_arithmetic(spark):
    # hand-check the integer Mann-Whitney on a crafted histogram path:
    # feed scored candidates through the same operator by monkeypatch
    # is overkill — instead verify the closed form on the operator's
    # own output invariants over a triangle-rich graph below.
    from nerpii_spark.operators.webgraph import linkpred_auc  # noqa: F401


def test_linkpred_auc_triangle_rich_graph(spark):
    # K8 clique: removing any held-out edge leaves its endpoints with
    # 6 common neighbors; pool negatives point at far-away isolated-
    # cluster hosts with 0 common neighbors -> AUC must be ~1.
    from nerpii_spark.operators.webgraph import (
        linkpred_auc, _lp_edge_key, LP_TEST_MOD,
    )
    from nerpii_spark.functions.hashing import strhash, h2

    clique = [f"k{i}" for i in range(8)]
    edges = [(a, b) for a in clique for b in clique if a < b]
    # far cluster: star around z0 (no edges to the clique)
    edges += [("z0", f"z{i}") for i in range(1, 6)]
    # fabricate a pages-free call: reuse the edge-list internals via a
    # tiny shim DataFrame matching distinct_host_edges' output
    e = spark.createDataFrame(edges, "u string, v string")

    # run the operator body on the crafted edges by substituting the
    # extraction step: linkpred_auc only consumes distinct_host_edges,
    # so patch it
    import nerpii_spark.operators.webgraph as WG
    orig = WG.distinct_host_edges
    try:
        WG.distinct_host_edges = lambda pages: e
        out = linkpred_auc(None).collect()[0]
    finally:
        WG.distinct_host_edges = orig
    assert out["n_pos"] >= 1 and out["n_neg"] >= 1
    # positives inside the clique carry 6 common neighbors; negatives
    # (clique -> pool representative) carry 0 -> perfect separation
    # unless a held-out edge fell in the z-star (0 CN there)
    if out["sum_cn_pos"] > 0 and out["sum_cn_neg"] == 0:
        assert out["auc_e6"] >= 900_000


def test_linkpred_python_mirror_of_auc_formula(spark):
    # the rank2 histogram algebra equals sklearn-style tie-averaged
    # AUC on a small mixed-score sample (python mirror, no Spark)
    scores = [(3, 1), (3, 1), (2, 0), (2, 1), (0, 0), (0, 0)]
    from collections import Counter
    hist = Counter()
    for s, lbl in scores:
        hist[s] = hist[s]
    # build (score -> n, np)
    agg = {}
    for s, lbl in scores:
        n, np_ = agg.get(s, (0, 0))
        agg[s] = (n + 1, np_ + lbl)
    cum = 0
    r2p = 0
    n_pos = sum(v[1] for v in agg.values())
    n_neg = sum(v[0] - v[1] for v in agg.values())
    for s in sorted(agg):
        n, np_ = agg[s]
        rank2 = 2 * cum + n + 1
        r2p += np_ * rank2
        cum += n
    auc_e6 = (500000 * (r2p - n_pos * (n_pos + 1))) // (n_pos * n_neg)
    # float reference with tie-averaged ranks
    ranks = {}
    cum = 0
    for s in sorted(agg):
        n, _ = agg[s]
        ranks[s] = cum + (n + 1) / 2
        cum += n
    u = sum(ranks[s] for s, lbl in scores if lbl) - n_pos * (n_pos + 1) / 2
    auc_f = u / (n_pos * n_neg)
    assert abs(auc_e6 / 1e6 - auc_f) < 1e-6


# ---------------------------------------------------------------------------
# classifier_pr_curve
# ---------------------------------------------------------------------------


def test_pr_curve_monotone_and_consistent(spark):
    from nerpii_spark.operators.textstats import classifier_pr_curve

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(
        classifier_pr_curve(docs).collect(), key=lambda r: -r["bucket"]
    )
    # cumulative counts are monotone in descending bucket order and
    # the last row covers the whole corpus
    for a, b in zip(rows, rows[1:]):
        assert b["tp"] >= a["tp"] and b["pp"] >= a["pp"]
    last = rows[-1]
    assert last["pp"] == docs.count()
    assert last["recall_milli"] == 1000
    for r in rows:
        assert r["precision_milli"] == (1000 * r["tp"]) // r["pp"]


# ---------------------------------------------------------------------------
# clustering_coeff
# ---------------------------------------------------------------------------


def test_clustering_coeff_hand_graph(spark):
    # triangle a-b-c plus pendant d attached to a:
    #   a: d=3, 1 triangle, C = 2*1/(3*2) = 1/3
    #   b, c: d=2, 1 triangle, C = 1
    #   d: d=1, C = 0
    import nerpii_spark.operators.webgraph as WG

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")],
        "u string, v string",
    )
    orig = WG.distinct_host_edges
    try:
        WG.distinct_host_edges = lambda pages: e
        got = {
            r["host"]: (r["d"], r["n_tri"], r["coeff_e6"])
            for r in WG.clustering_coeff(None).collect()
        }
    finally:
        WG.distinct_host_edges = orig
    assert got == {
        "a": (3, 1, 333_333),
        "b": (2, 1, 1_000_000),
        "c": (2, 1, 1_000_000),
        "d": (1, 0, 0),
    }


def test_clustering_coeff_star_is_zero(spark):
    # a hub star closes nothing: every coefficient is 0
    import nerpii_spark.operators.webgraph as WG

    e = spark.createDataFrame(
        [("hub", f"s{i}") for i in range(6)], "u string, v string"
    )
    orig = WG.distinct_host_edges
    try:
        WG.distinct_host_edges = lambda pages: e
        rows = WG.clustering_coeff(None).collect()
    finally:
        WG.distinct_host_edges = orig
    assert all(r["coeff_e6"] == 0 and r["n_tri"] == 0 for r in rows)
    assert {r["host"]: r["d"] for r in rows}["hub"] == 6


# ---------------------------------------------------------------------------
# scd2_facts
# ---------------------------------------------------------------------------


def test_scd2_facts_change_point_compression(spark):
    from nerpii_spark.operators.extract import scd2_facts

    # docs 0..4 assert ceo(acme)=A, A, B, A, A:
    # versions A[t0, t2-1], B[t2, t3-1], A[t3, null] — re-assertions
    # extend, flip-flop reopens
    triples = spark.createDataFrame(
        [(0, "acme", "ceo", "A"), (1, "acme", "ceo", "A"),
         (2, "acme", "ceo", "B"), (3, "acme", "ceo", "A"),
         (4, "acme", "ceo", "A")],
        "doc_id bigint, subj string, pred string, obj string",
    )
    pages = spark.createDataFrame(
        [(i, "2025-01-01 00:00:%02d" % i) for i in range(5)],
        "doc_id bigint, warc_ts string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    rows = sorted(
        scd2_facts(triples, pages).collect(), key=lambda r: r["version"]
    )
    t0 = rows[0]["valid_from_s"]
    assert [(r["version"], r["obj"]) for r in rows] == [
        (1, "A"), (2, "B"), (3, "A")
    ]
    assert rows[0]["valid_to_s"] == t0 + 2 - 1
    assert rows[1]["valid_to_s"] == t0 + 3 - 1
    assert rows[2]["valid_to_s"] is None and rows[2]["is_current"]


def test_scd2_facts_duplicate_assertions_collapse(spark):
    from nerpii_spark.operators.extract import scd2_facts

    # the same doc asserting the same fact twice contributes once
    triples = spark.createDataFrame(
        [(0, "s", "p", "X"), (0, "s", "p", "X")],
        "doc_id bigint, subj string, pred string, obj string",
    )
    pages = spark.createDataFrame(
        [(0, "2025-01-01 00:00:00")], "doc_id bigint, warc_ts string"
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    rows = scd2_facts(triples, pages).collect()
    assert len(rows) == 1 and rows[0]["is_current"]
