"""Wave-6 operators: truth discovery (Sums fixed point), point-in-time
as-of reads over the SCD2 fact spine, per-predicate AMIE functionality."""

from pyspark.sql import functions as F

from nerpii_spark.operators.extract import (
    asof_facts,
    pred_cardinality,
    truth_discovery,
)


def _triples(spark, rows):
    """rows: (doc_id, url, subj, pred, obj)."""
    return spark.createDataFrame(
        rows, "doc_id bigint, url string, subj string, pred string, obj string"
    )


# ---------------------------------------------------------------------------
# truth_discovery
# ---------------------------------------------------------------------------


def test_truth_discovery_reliable_host_beats_mirror_majority(spark):
    # Three template mirrors (m1-m3) assert ONLY the wrong CEO; two
    # reliable hosts assert the right CEO plus two uncontested facts
    # each, so round-1 belief flows back into their trust and the
    # round-2 belief of the true claim overtakes the 3-host majority.
    rows = []
    for i, h in enumerate(["m1.com", "m2.com", "m3.com"]):
        rows.append((i, f"http://{h}/a", "acme", "ceo", "WRONG"))
    for i, h in enumerate(["r1.org", "r2.org"]):
        rows += [
            (10 + i, f"http://{h}/a", "acme", "ceo", "RIGHT"),
            (20 + i, f"http://{h}/b", "acme", "hq", "rome"),
            (30 + i, f"http://{h}/c", "acme", "founded", "1999"),
        ]
    out = {
        (r["subj"], r["pred"], r["obj"]): (r["belief"], r["n_hosts"])
        for r in truth_discovery(_triples(spark, rows)).collect()
    }
    b_right, n_right = out[("acme", "ceo", "RIGHT")]
    b_wrong, n_wrong = out[("acme", "ceo", "WRONG")]
    # majority vote says WRONG (3 hosts vs 2) ...
    assert (n_wrong, n_right) == (3, 2)
    # ... but learned trust says RIGHT
    assert b_right > b_wrong


def test_truth_discovery_sums_arithmetic_exact(spark):
    # Hand-computed 2-round Sums on a 2-host, 2-claim instance:
    #   h1 asserts c1; h2 asserts c1 and c2.
    # r1: b(c1)=2e6, b(c2)=1e6; raw(h1)=2e6, raw(h2)=3e6, max=3e6
    #     t(h1)=1e6*2e6//3e6=666666, t(h2)=1e6
    # r2: b(c1)=t1+t2=1666666, b(c2)=1000000
    rows = [
        (0, "http://h1.com/x", "s", "p", "A"),
        (1, "http://h2.com/x", "s", "p", "A"),
        (2, "http://h2.com/y", "s", "q", "B"),
    ]
    out = {
        (r["subj"], r["pred"], r["obj"]): r["belief"]
        for r in truth_discovery(_triples(spark, rows)).collect()
    }
    assert out[("s", "p", "A")] == 1_666_666
    assert out[("s", "q", "B")] == 1_000_000


def test_truth_discovery_dedups_repeated_assertions(spark):
    # one host spamming the same claim 50x counts once
    rows = [
        (i, "http://spam.com/%d" % i, "s", "p", "X") for i in range(50)
    ] + [(100, "http://a.org/1", "s", "p", "Y"),
         (101, "http://b.org/1", "s", "p", "Y")]
    out = {
        r["obj"]: (r["belief"], r["n_hosts"])
        for r in truth_discovery(_triples(spark, rows)).collect()
    }
    assert out["X"][1] == 1
    assert out["Y"][1] == 2
    assert out["Y"][0] > out["X"][0]


# ---------------------------------------------------------------------------
# asof_facts
# ---------------------------------------------------------------------------


def test_asof_facts_probe_semantics(spark):
    # pages 0..8 (clock = :00 .. :08), ceo changes A -> B at t4.
    # probes = lo + (8 * k) div 8 = every second 0..7.
    triples = spark.createDataFrame(
        [(i, "acme", "ceo", "A" if i < 4 else "B") for i in range(9)],
        "doc_id bigint, subj string, pred string, obj string",
    )
    pages = spark.createDataFrame(
        [(i, "2025-01-01 00:00:%02d" % i) for i in range(9)],
        "doc_id bigint, warc_ts string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    rows = asof_facts(triples, pages).collect()
    lo = min(r["probe_s"] for r in rows)
    got = {r["probe_s"] - lo: r["obj"] for r in rows}
    assert got == {0: "A", 1: "A", 2: "A", 3: "A", 4: "B", 5: "B",
                   6: "B", 7: "B"}
    # versions ride along: probe 0 sees v1, probe 7 sees v2
    vers = {r["probe_s"] - lo: r["version"] for r in rows}
    assert (vers[0], vers[7]) == (1, 2)


def test_asof_facts_absent_before_first_assertion(spark):
    # fact first asserted at t6: probes 0..5 must NOT see it
    triples = spark.createDataFrame(
        [(6, "x", "p", "V"), (7, "x", "p", "V")],
        "doc_id bigint, subj string, pred string, obj string",
    )
    pages = spark.createDataFrame(
        [(i, "2025-01-01 00:00:%02d" % i) for i in range(9)],
        "doc_id bigint, warc_ts string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    rows = asof_facts(triples, pages).collect()
    lo = min(r["probe_s"] for r in rows) - 6  # first probe at offset 0
    assert sorted(r["probe_s"] - lo for r in rows) == [6, 7]


# ---------------------------------------------------------------------------
# pred_cardinality
# ---------------------------------------------------------------------------


def test_pred_cardinality_functionality(spark):
    # born_in: functional (each subj one obj); works_at: multi-valued
    rows = [
        (0, "u", "ada", "born_in", "london"),
        (1, "u", "bob", "born_in", "london"),
        (2, "u", "ada", "works_at", "acme"),
        (3, "u", "ada", "works_at", "globex"),
        (4, "u", "ada", "works_at", "acme"),  # corpus dup collapses
    ]
    out = {r["pred"]: r for r in pred_cardinality(
        _triples(spark, rows)).collect()}
    b = out["born_in"]
    assert (b["n_facts"], b["n_subj"], b["n_obj"]) == (2, 2, 1)
    assert b["functionality_e6"] == 1_000_000
    assert b["inv_functionality_e6"] == 500_000
    w = out["works_at"]
    assert (w["n_facts"], w["n_subj"], w["n_obj"]) == (2, 1, 2)
    assert w["functionality_e6"] == 500_000


# ---------------------------------------------------------------------------
# vocab_growth
# ---------------------------------------------------------------------------


def test_vocab_growth_good_turing(spark):
    # corpus: a a a b b c d e -> N_1=3 (c,d,e), N_2=1 (b), N_3=1 (a),
    # total=8. share(1)=3/8, r*(1)=2*N_2/N_1=2/3, r*(2)=3*N_3/N_2=3,
    # r*(3)=NULL (N_4=0).
    from nerpii_spark.operators.textstats import vocab_growth

    docs = spark.createDataFrame(
        [(0, "en", "a a a b b c d e")],
        "doc_id bigint, lang string, text string",
    )
    out = {r["r"]: r for r in vocab_growth(docs).collect()}
    assert out[1]["n_types"] == 3 and out[2]["n_types"] == 1
    assert out[1]["share_e6"] == 1_000_000 * 3 // 8
    assert out[1]["gt_rstar_e6"] == 1_000_000 * 2 * 1 // 3
    assert out[2]["gt_rstar_e6"] == 3_000_000
    assert out[3]["gt_rstar_e6"] is None


def test_vocab_growth_per_lang_isolation(spark):
    from nerpii_spark.operators.textstats import vocab_growth

    docs = spark.createDataFrame(
        [(0, "en", "x x"), (1, "it", "x")],
        "doc_id bigint, lang string, text string",
    )
    out = {(r["lang"], r["r"]): r["n_types"]
           for r in vocab_growth(docs).collect()}
    assert out == {("en", 2): 1, ("it", 1): 1}


# ---------------------------------------------------------------------------
# phrase_search
# ---------------------------------------------------------------------------


def test_phrase_search_three_term_and_overlap(spark):
    from nerpii_spark.operators.textstats import phrase_search

    docs = spark.createDataFrame(
        [
            (0, "the quick fox saw the quick fox run"),  # 2 matches
            (1, "quick the fox"),                        # scrambled: 0
            (2, "THE QUICK FOX"),                        # case-folded: 1
            (3, "the quick dog"),                        # prefix only: 0
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["n_matches"] for r in phrase_search(
        docs, ["the", "quick", "fox"]).collect()}
    assert out == {0: 2, 2: 1}


def test_phrase_search_repeated_term(spark):
    from nerpii_spark.operators.textstats import phrase_search

    # phrase with a repeated token: "b b" occurs at pos 1 and 2 of
    # "a b b b" (overlapping starts both count)
    docs = spark.createDataFrame(
        [(0, "a b b b")], "doc_id bigint, text string"
    )
    out = phrase_search(docs, ["b", "b"]).collect()
    assert [(r["doc_id"], r["n_matches"]) for r in out] == [(0, 2)]


# ---------------------------------------------------------------------------
# split_leakage
# ---------------------------------------------------------------------------


def test_split_leakage_flags_straddling_cluster(spark):
    from nerpii_spark.operators.dedup import split_leakage

    body = ("spark merge join filter window batch stream value "
            "table scan hash group row data key sort agg part")
    docs = spark.createDataFrame(
        [
            (0, body),            # dup cluster {0, 1}: train + test
            (1, body),
            (2, body + " extra"), # near-dup of the pair -> same cluster
            (3, "completely different words entirely unrelated text "
                "nothing shared with anything else at all here now"),
            (4, "another standalone document with its own vocabulary "
                "zero overlap against the duplicated boilerplate body"),
        ],
        "doc_id bigint, text string",
    )
    splits = spark.createDataFrame(
        [(0, "train"), (1, "test"), (2, "train"), (3, "train"),
         (4, "val")],
        "doc_id bigint, split string",
    )
    rows = split_leakage(docs, splits).collect()
    # exactly one multi-member cluster, and it leaks train+test
    assert len(rows) == 1
    r = rows[0]
    assert r["cluster_id"] == 0 and r["n_docs"] == 3
    assert r["leaked"] and r["n_splits"] == 2
    assert r["splits"] == "test,train"


def test_split_leakage_clean_when_cluster_assigned(spark):
    from nerpii_spark.operators.dedup import split_leakage

    body = ("spark merge join filter window batch stream value "
            "table scan hash group row data key sort agg part")
    docs = spark.createDataFrame(
        [(0, body), (1, body)], "doc_id bigint, text string"
    )
    splits = spark.createDataFrame(
        [(0, "train"), (1, "train")], "doc_id bigint, split string"
    )
    rows = split_leakage(docs, splits).collect()
    assert len(rows) == 1 and not rows[0]["leaked"]
    assert rows[0]["splits"] == "train"


def test_vocab_growth_bigram_level(spark):
    from nerpii_spark.operators.textstats import vocab_growth

    # bigrams of "a b a b a": "a b"x2, "b a"x2 -> N_2 = 2, total = 4;
    # one-word doc contributes no bigrams (guard path)
    docs = spark.createDataFrame(
        [(0, "en", "a b a b a"), (1, "en", "solo")],
        "doc_id bigint, lang string, text string",
    )
    rows = vocab_growth(docs, gram=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["r"], r["n_types"]) == (2, 2)
    assert r["share_e6"] == 1_000_000  # all bigram mass at r=2
