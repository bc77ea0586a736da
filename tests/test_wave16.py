"""Wave-16: Hearst hypernyms, coref-lite resolution, community quotient
graph. The planted-corpus parity gates live in tools/check_oracle.py
(q_hearst / q_coref_resolve / q_community_graph); here we pin the
Python mirror and the behavioral edges the plant cannot reach."""

from collections import Counter

import pytest

from nerpii_spark.operators.extract import coref_resolve, hearst_hypernyms
from nerpii_spark.operators.webgraph import community_graph
import nerpii_spark.sources.pages as P

SF = "/root/testdata/sf0.001"


def test_hearst_matches_python_mirror(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.createOrReplaceTempView("documents_w16h")
    h = spark.sql(P.hearst_sql("spark", doc_rel="documents_w16h"))
    got = Counter(tuple(r) for r in hearst_hypernyms(h).collect())
    exp = Counter()
    for (d,) in docs.select("doc_id").collect():
        _, tr = P.plant_hearst(d)
        for hypo, pred, hyper, pat in tr:
            exp[(d, hypo, pred, hyper, pat)] += 1
    assert got == exp
    # every pattern and class occurs at sf0.001 (the plant is mixing)
    pats = {k[4] for k in got}
    clss = {k[3] for k in got}
    assert pats == {"such_as", "including", "other"}
    assert clss == {"companies", "cities", "countries"}


def test_hearst_edges(spark):
    rows = [
        # no pattern at all
        (1, "Acme Corp was founded in 1990."),
        # list stops at the lowercase verb phrase
        (2, "Many rivers such as Nile and Amazon have expanded recently."),
        # 'and other' with two items and a two-word instance
        (3, "New York, Lagos and other megacities were surveyed last year."),
        # trigger word inside a non-matching frame: no capitalized list
        (4, "Many things such as these have expanded recently."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.hyponym, r.hypernym, r.pattern)
        for r in hearst_hypernyms(df).collect()
    }
    assert got == {
        (2, "Nile", "rivers", "such_as"),
        (2, "Amazon", "rivers", "such_as"),
        (3, "New York", "megacities", "other"),
        (3, "Lagos", "megacities", "other"),
    }


def test_coref_matches_python_mirror(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.createOrReplaceTempView("documents_w16c")
    c = spark.sql(P.coref_sql("spark", doc_rel="documents_w16c"))
    got = Counter(tuple(r) for r in coref_resolve(c).collect())
    exp = Counter()
    for (d,) in docs.select("doc_id").collect():
        _, tr = P.plant_coref(d)
        for t in tr:
            exp[t] += 1
    assert got == exp


def test_coref_edges(spark):
    rows = [
        # pronoun with no gender-agreeing antecedent -> dropped
        (1, "Alice Baker works at Acme Corp. He lives in Oslo."),
        # pronoun before any person -> dropped
        (2, "She lives in Oslo. Alice Baker works at Acme Corp."),
        # same gender twice: NEAREST preceding wins
        (
            3,
            "Alice Baker works at Acme Corp. Clara Snow joined Globex Inc."
            " She founded Initech LLC.",
        ),
        # unknown first name (not in either gazetteer) never binds
        (4, "Zorblax Baker works at Acme Corp. He lives in Oslo."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in coref_resolve(df).collect()}
    assert got == {
        (3, 2, "She", "Clara Snow", "founded", "Initech LLC"),
    }
    # custom gazetteers override the frozen defaults
    got2 = {
        tuple(r)
        for r in coref_resolve(
            df, female_names=[], male_names=["Zorblax"]
        ).collect()
    }
    assert (4, 1, "He", "Zorblax Baker", "lives_in", "Oslo") in got2


def test_community_graph_invariants(spark):
    import __spark_entry__ as E

    pages = E._pipeline(spark, SF)["pages"]
    cg = community_graph(pages).collect()
    assert len(cg) >= 1
    # every cross-community edge leaves one community and enters another
    assert sum(r.out_edges for r in cg) == sum(r.in_edges for r in cg)
    # intra + out accounts for every distinct directed inter-host edge
    from nerpii_spark.operators.webgraph import distinct_host_edges

    n_edges = distinct_host_edges(pages).count()
    assert sum(r.intra_edges + r.out_edges for r in cg) == n_edges
    # host partition: community sizes add up to the host count
    from nerpii_spark.operators.webgraph import lpa_communities

    n_hosts = lpa_communities(pages).count()
    assert sum(r.n_hosts for r in cg) == n_hosts
