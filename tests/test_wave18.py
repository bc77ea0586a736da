"""Wave-18: clustering evaluation (pairwise + B-cubed), numeric-fact
extraction, temporal normalization. Corpus-wide parity gates live in
tools/check_oracle.py; here the metric algebra is pinned on crafted
imperfect partitions the (exact-on-corpus) plant cannot reach."""

from nerpii_spark.operators.link import cluster_eval


def _eval(spark, pred, truth):
    members = spark.createDataFrame(
        [("PERSON", n, l) for n, l in pred],
        "entity_type string, norm string, label bigint",
    )
    tr = spark.createDataFrame(
        [("PERSON", k, n) for n, k in truth],
        "entity_type string, k string, norm string",
    )
    rows = cluster_eval(members, tr).collect()
    assert len(rows) == 1
    return rows[0]


def test_cluster_eval_perfect(spark):
    pred = [("a", 1), ("b", 1), ("c", 2)]
    truth = [("a", "X"), ("b", "X"), ("c", "Y")]
    r = _eval(spark, pred, truth)
    assert (r.prec_e6, r.rec_e6) == (1_000_000, 1_000_000)
    assert (r.bcubed_prec_e6, r.bcubed_rec_e6) == (1_000_000, 1_000_000)
    assert (r.tp_pairs, r.pred_pairs, r.true_pairs) == (1, 1, 1)
    assert (r.n_pred_clusters, r.n_true_clusters) == (2, 2)


def test_cluster_eval_overmerge(spark):
    # two true entities {a,b} and {c,d} merged into ONE predicted
    # cluster: recall perfect, precision suffers
    pred = [("a", 1), ("b", 1), ("c", 1), ("d", 1)]
    truth = [("a", "X"), ("b", "X"), ("c", "Y"), ("d", "Y")]
    r = _eval(spark, pred, truth)
    assert r.tp_pairs == 2 and r.pred_pairs == 6 and r.true_pairs == 2
    assert r.prec_e6 == 333_333 and r.rec_e6 == 1_000_000
    # B-cubed precision: each item sees 2 of its 4 cluster-mates
    # correct -> per-item 500000
    assert r.bcubed_prec_e6 == 500_000
    assert r.bcubed_rec_e6 == 1_000_000


def test_cluster_eval_undermerge(spark):
    # one true entity split into two singletons: precision perfect
    # (no wrong pairs), recall suffers
    pred = [("a", 1), ("b", 2)]
    truth = [("a", "X"), ("b", "X")]
    r = _eval(spark, pred, truth)
    assert r.tp_pairs == 0 and r.pred_pairs == 0 and r.true_pairs == 1
    assert r.prec_e6 == 1_000_000  # vacuous precision convention
    assert r.rec_e6 == 0
    assert r.bcubed_prec_e6 == 1_000_000
    assert r.bcubed_rec_e6 == 500_000


def test_cluster_eval_mixed_cell(spark):
    # pred cluster 1 = {a, b, c} where truth says {a, b} + {c}:
    # cell n_kl in {2, 1}; B-cubed prec = (2*2/3 + 1*1/3)/3 = 5/9
    pred = [("a", 1), ("b", 1), ("c", 1)]
    truth = [("a", "X"), ("b", "X"), ("c", "Y")]
    r = _eval(spark, pred, truth)
    assert r.tp_pairs == 1 and r.pred_pairs == 3 and r.true_pairs == 1
    assert r.prec_e6 == 333_333 and r.rec_e6 == 1_000_000
    # integer algebra: (2*((2e6) div 3) + 1*((1e6) div 3)) div 3
    #                = (2*666666 + 333333) div 3 = 555555
    assert r.bcubed_prec_e6 == 555_555
    assert r.bcubed_rec_e6 == 1_000_000


from nerpii_spark.operators.extract import date_facts, numeric_facts
import nerpii_spark.sources.pages as P


def test_numeric_mirror_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents_w18m")
    m = spark.sql(P.metric_sql("spark", doc_rel="documents_w18m"))
    got = {r.doc_id: (r.subj, r.pred, r.value)
           for r in numeric_facts(m).collect()}
    preds = set()
    for (d,) in docs.select("doc_id").collect():
        _, truth = P.plant_metric(d)
        assert got[d] == truth, (d, got.get(d), truth)
        preds.add(truth[1])
    assert preds == {"revenue_usd", "raised_usd", "population"}


def test_numeric_edges(spark):
    rows = [
        (1, "Acme Corp reported revenue of $1.0 billion."),
        (2, "Beta LLC raised $999 million."),
        (3, "Oslo has a population of 10,000."),
        (4, "Gamma Inc reported revenue of about $2 billion."),  # no .d
        (5, "Delta has a population of 1,23."),  # malformed grouping
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.subj, r.pred, r.value)
           for r in numeric_facts(docs).collect()}
    assert got[1] == ("Acme Corp", "revenue_usd", 1_000_000_000)
    assert got[2] == ("Beta LLC", "raised_usd", 999_000_000)
    assert got[3] == ("Oslo", "population", 10_000)
    assert 4 not in got and 5 not in got


def test_timex_mirror_parity_and_forms(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents_w18t")
    tx = spark.sql(P.timex_sql("spark", doc_rel="documents_w18t"))
    got = {r.doc_id: (r.subj, r.pred, r.date_iso)
           for r in date_facts(tx).collect()}
    forms = set()
    for (d,) in docs.select("doc_id").collect():
        _, truth = P.plant_timex(d)
        assert got[d] == truth, (d, got.get(d), truth)
        forms.add(P._timex_vals(d)["form"])
    assert forms == {0, 1, 2}


def test_timex_edges(spark):
    rows = [
        (1, "Acme Corp was founded on March 5, 1999."),
        (2, "Beta LLC was founded on 2001-12-31."),
        (3, "Gamma Inc was founded on 7 August 1987."),
        (4, "Delta was founded on Febuary 1, 2000."),  # misspelled month
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.date_iso for r in date_facts(docs).collect()}
    assert got[1] == "1999-03-05"
    assert got[2] == "2001-12-31"
    assert got[3] == "1987-08-07"
    assert 4 not in got
