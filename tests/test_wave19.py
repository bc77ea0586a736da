"""Wave-19: negation-aware extraction, voice canonicalization,
robots.txt policy evaluation. Corpus-wide parity gates live in
tools/check_oracle.py; behavioral edges pinned here."""

from nerpii_spark.operators.extract import polarity_triples, voice_triples
from nerpii_spark.operators.textstats import robots_verdicts
import nerpii_spark.sources.pages as P


def test_polarity_mirror_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents_w19n")
    n = spark.sql(P.negation_sql("spark", doc_rel="documents_w19n"))
    got = {r.doc_id: (r.subj, r.pred, r.obj, r.polarity)
           for r in polarity_triples(n).collect()}
    pols = set()
    for (d,) in docs.select("doc_id").collect():
        _, truth = P.plant_negation(d)
        assert got[d] == truth, (d, got.get(d), truth)
        pols.add(truth[3])
    assert pols == {"pos", "neg"}


def test_polarity_edges(spark):
    rows = [
        (1, "Ada Smith works at Acme Corp."),
        (2, "Ada Smith does not work at Acme Corp."),
        (3, "Ada Smith no longer works at Acme Corp."),
        (4, "Ada Smith never worked at Acme Corp."),
        (5, "Ada Smith might work at Acme Corp."),  # outside the grammar
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.polarity for r in polarity_triples(docs).collect()}
    assert got == {1: "pos", 2: "neg", 3: "neg", 4: "neg"}


def test_voice_canonicalization(spark):
    rows = [
        (1, "Alpha Corp acquired Beta Inc."),
        (2, "Beta Inc was acquired by Alpha Corp."),
        (3, "Beta Inc acquired Alpha Corp."),  # reversed active
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.subj, r.pred, r.obj)
           for r in voice_triples(docs).collect()}
    # active and passive surface the SAME canonical fact
    assert got[1] == got[2] == ("Alpha Corp", "acquired", "Beta Inc")
    assert got[3] == ("Beta Inc", "acquired", "Alpha Corp")


def test_voice_mirror_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents_w19v")
    v = spark.sql(P.voice_sql("spark", doc_rel="documents_w19v"))
    got = {r.doc_id: (r.subj, r.pred, r.obj)
           for r in voice_triples(v).collect()}
    forms = set()
    for (d,) in docs.select("doc_id").collect():
        _, truth = P.plant_voice(d)
        assert got[d] == truth, (d, got.get(d), truth)
        forms.add(P._voice_vals(d)["form"])
    assert forms == {0, 1}


def test_robots_longest_match_semantics(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://a.example/de/page/1"),   # allow-override wins
            (2, "https://a.example/de/other"),    # disallow /de/ wins
            (3, "https://a.example/en/page/1"),   # no rule matches
            (4, "https://b.example/de/page/1"),   # host without rules
            (5, "https://a.example/x/"),          # tie: allow beats disallow
        ],
        "doc_id bigint, url string",
    )
    rules = spark.createDataFrame(
        [
            ("a.example", "/de/", 0),
            ("a.example", "/de/page/", 1),
            ("a.example", "/x/", 0),
            ("a.example", "/x/", 1),
        ],
        "host string, prefix string, allow bigint",
    )
    got = {r.doc_id: r.allowed for r in
           robots_verdicts(pages, rules).collect()}
    assert got == {1: 1, 2: 0, 3: 1, 4: 1, 5: 1}


def test_robots_corpus_has_all_three_classes(spark):
    import __spark_entry__ as E

    df = E.q_robots(spark, "/root/testdata/sf0.001")
    rules = spark.sql(P.robots_rules_sql("spark"))
    n_blocked = df.where("allowed = 0").count()
    n_allowed = df.where("allowed = 1").count()
    assert n_blocked > 0 and n_allowed > 0
    # at least one page allowed BY the override rule (host has both)
    two_rule_hosts = (
        rules.groupBy("host").count().where("count = 2").select("host")
    )
    overridden = df.join(two_rule_hosts, "host").where("allowed = 1")
    assert overridden.count() > 0
