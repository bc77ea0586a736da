"""Wave-17: AMIE rule application (KG completion), BIO training-data
export, quotation attribution. Corpus-wide parity gates live in
tools/check_oracle.py; here we pin behavioral edges on crafted inputs
the plant cannot reach."""

from collections import Counter

import pytest

from nerpii_spark.operators.extract import rule_infer


def _kg(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_rule_infer_path_rule_fires_and_novelty_holds(spark):
    # works_at & located_in => lives_in: 4 of 5 body pairs have the head
    # asserted; the 5th subject (p4) has NO lives_in fact at all, so
    # under the partial-completeness assumption it is unknown, not a
    # counterexample — PCA conf is 4/4 = 1.0 (std conf would be 4/5)
    # and p4's fact is exactly the novel inference.
    rows = []
    for i in range(5):
        rows.append((f"p{i}", "works_at", "acme"))
    rows.append(("acme", "located_in", "rome"))
    for i in range(4):
        rows.append((f"p{i}", "lives_in", "rome"))
    out = rule_infer(_kg(spark, rows), min_support=2, tau_e6=500_000).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.subj, r.pred, r.obj) == ("p4", "lives_in", "rome")
    assert r.rule_type == "path"
    assert (r.body1, r.body2) == ("works_at", "located_in")
    assert r.conf_pca_e6 == 1_000_000  # PCA: 4/4, the unknown is excluded


def test_rule_infer_pair_rule_and_best_rule_pick(spark):
    # two rules derive the same novel fact; the higher-PCA one must win.
    # pair rule: ceo_of => works_at (2/2 confirmed on seed, conf 1.0)
    # path rule: ceo_of & located_in => based_in ... keep it simple:
    # build pair rule ceo_of=>works_at and a second pair rule
    # chairs=>works_at with lower confidence, both deriving
    # (x, works_at, acme) for a subject that has ceo_of AND chairs.
    rows = [
        # ceo_of => works_at: 3 ceo_of facts, 2 confirmed -> conf 2/3
        # (x's own unconfirmed fact below dilutes the denominator)
        ("a", "ceo_of", "o1"), ("a", "works_at", "o1"),
        ("b", "ceo_of", "o2"), ("b", "works_at", "o2"),
        # chairs => works_at: 4 chairs facts, 2 confirmed -> conf 2/4
        ("c", "chairs", "o3"), ("c", "works_at", "o3"),
        ("d", "chairs", "o4"), ("d", "works_at", "o4"),
        ("e", "chairs", "o5"),
        # x holds both body predicates on o6; works_at(x, o6) is absent
        ("x", "ceo_of", "o6"), ("x", "chairs", "o6"),
    ]
    out = rule_infer(_kg(spark, rows), min_support=2, tau_e6=100_000)
    got = {(r.subj, r.pred, r.obj): r for r in out.collect()}
    assert ("x", "works_at", "o6") in got
    win = got[("x", "works_at", "o6")]
    assert win.body1 == "ceo_of" and win.conf_pca_e6 == 666_666
    # inferred facts never duplicate asserted ones
    asserted = {(s, p, o) for s, p, o in rows}
    assert not (set(got) & asserted)


def test_rule_infer_threshold_gates(spark):
    rows = [
        ("a", "p", "o1"), ("a", "q", "o1"),
        ("b", "p", "o2"), ("b", "q", "o2"),
        ("c", "p", "o3"),  # p=>q confirmed 2/3
    ]
    hi = rule_infer(_kg(spark, rows), min_support=2, tau_e6=700_000)
    lo = rule_infer(_kg(spark, rows), min_support=2, tau_e6=600_000)
    assert hi.count() == 0  # conf 666666 < 700000
    assert {(r.subj, r.pred, r.obj) for r in lo.collect()} == {
        ("c", "q", "o3")
    }


from nerpii_spark.operators.extract import ner_bio_export


def _bio(spark, text, spans):
    clean = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    ments = spark.createDataFrame(
        [(1, b, e, t) for b, e, t in spans],
        "doc_id bigint, begin bigint, end bigint, entity_type string",
    )
    return {
        (r.t, r.token): r.tag
        for r in ner_bio_export(clean, ments).collect()
    }


def test_bio_basic_and_edges(spark):
    #      0123456789012345678901234567890
    text = "Ada Smith works at Acme Inc now"
    got = _bio(spark, text, [(0, 9, "PERSON"), (19, 27, "ORGANIZATION")])
    assert got == {
        (0, "Ada"): "B-PERSON",
        (1, "Smith"): "I-PERSON",
        (2, "works"): "O",
        (3, "at"): "O",
        (4, "Acme"): "B-ORGANIZATION",
        (5, "Inc"): "I-ORGANIZATION",
        (6, "now"): "O",
    }


def test_bio_adjacent_spans_and_trailing_punct(spark):
    # two adjacent single-token spans -> two B- tags, no I- bleed; a
    # trailing comma attached to the token keeps the B- tag (the token
    # STARTS inside the span)
    text = "Oslo Rome, then"
    got = _bio(spark, text, [(0, 4, "LOCATION"), (5, 9, "LOCATION")])
    assert got == {
        (0, "Oslo"): "B-LOCATION",
        (1, "Rome,"): "B-LOCATION",
        (2, "then"): "O",
    }


def test_bio_doc_without_mentions_is_all_O(spark):
    clean = spark.createDataFrame(
        [(1, "no entities here"), (2, "Acme Inc")],
        "doc_id bigint, text string",
    )
    ments = spark.createDataFrame(
        [(2, 0, 8, "ORGANIZATION")],
        "doc_id bigint, begin bigint, end bigint, entity_type string",
    )
    rows = ner_bio_export(clean, ments).collect()
    d1 = {r.tag for r in rows if r.doc_id == 1}
    d2 = [r.tag for r in sorted(rows, key=lambda r: r.t) if r.doc_id == 2]
    assert d1 == {"O"}
    assert d2 == ["B-ORGANIZATION", "I-ORGANIZATION"]


def test_bio_type_filter_drops_non_ne_types(spark):
    text = "SSN 123-45-6789 for Ada Smith"
    got = _bio(
        spark, text, [(4, 15, "US_SSN"), (20, 29, "PERSON")]
    )
    assert got[(1, "123-45-6789")] == "O"  # non-NE type not exported
    assert got[(3, "Ada")] == "B-PERSON"
    assert got[(4, "Smith")] == "I-PERSON"


from nerpii_spark.operators.extract import quote_attribution
import nerpii_spark.sources.pages as P


def test_quote_mirror_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents_w17q")
    q = spark.sql(P.quote_sql("spark", doc_rel="documents_w17q"))
    got = {r.doc_id: (r.speaker, r.verb, r.quote, r.form)
           for r in quote_attribution(q).collect()}
    for (d,) in docs.select("doc_id").collect():
        _, truth = P.plant_quote(d)
        assert got[d] == truth, (d, got.get(d), truth)
    # both forms and all three verbs occur at sf0.001
    assert {v[3] for v in got.values()} == {0, 1}
    assert {v[1] for v in got.values()} == {"said", "announced", "warned"}


def test_quote_edges(spark):
    rows = [
        # mid-text quotation is still found
        (1, 'Earlier today, "the and of to," said Ada Smith. More text.'),
        # no quotation at all
        (2, "Nothing is quoted here by anyone."),
        # quote-first frame wins when both could match
        (3, '"a b c d," warned Eve Jones. Eve Jones said: "x y."'),
        # lowercase speaker does not match the name grammar
        (4, '"the and," said ada smith.'),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.speaker, r.verb, r.quote, r.form)
           for r in quote_attribution(docs).collect()}
    assert got[1] == ("Ada Smith", "said", "the and of to", 0)
    assert 2 not in got
    assert got[3] == ("Eve Jones", "warned", "a b c d", 0)
    assert 4 not in got
