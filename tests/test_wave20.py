"""Wave-20: N-Triples export, SHACL-lite validation, span-level NER
evaluation. Corpus gates in tools/check_oracle.py; crafted edges here."""

from nerpii_spark.operators.extract import (
    ner_eval,
    ntriples_export,
    shacl_report,
)


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_ntriples_iri_and_literal_forms(spark):
    out = {
        r.line
        for r in ntriples_export(
            _t(spark, [
                ("Ada Smith", "works_at", "Acme Inc"),
                ("Ada Smith", "has_email", "ada@x.example"),
            ])
        ).collect()
    }
    assert out == {
        "<http://kg.example/e/Ada%20Smith> <http://kg.example/p/works_at>"
        " <http://kg.example/e/Acme%20Inc> .",
        '<http://kg.example/e/Ada%20Smith> <http://kg.example/p/has_email>'
        ' "ada@x.example" .',
    }


def test_ntriples_literal_escaping_order(spark):
    # backslash must be doubled BEFORE quotes are escaped: the value
    # \" must serialize as \\\" (4 chars: \ \ \ "), not \\" or \"
    val = 'say "hi" \\ now'
    rows = ntriples_export(
        _t(spark, [("X", "has_email", val)])
    ).collect()
    line = rows[0].line
    assert '"say \\"hi\\" \\\\ now"' in line
    # dedup: the same fact twice serializes once
    assert ntriples_export(
        _t(spark, [("A", "works_at", "B"), ("A", "works_at", "B")])
    ).count() == 1


def test_shacl_max_and_required(spark):
    rows = [
        ("p1", "lives_in", "Rome"),
        ("p1", "lives_in", "Oslo"),        # maxCount 1 violated
        ("p2", "works_at", "Acme"),        # employed, no home city
        ("p3", "works_at", "Acme"),
        ("p3", "lives_in", "Rome"),        # compliant
        ("o1", "located_in", "Rome"),
        ("o1", "located_in", "Rome"),      # duplicate fact: distinct first
    ]
    got = {
        (r.focus, r.pred, r.violation): (r.n, r.bound)
        for r in shacl_report(_t(spark, rows)).collect()
    }
    assert got[("p1", "lives_in", "max_exceeded")] == (2, 1)
    assert got[("p2", "lives_in", "missing_required")] == (0, 1)
    assert ("p3", "lives_in", "max_exceeded") not in got
    assert ("o1", "located_in", "max_exceeded") not in got  # deduped
    assert len(got) == 2


def _m(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, entity_type string, mention string"
    )


def test_ner_eval_imperfect_detector(spark):
    truth = _m(spark, [
        (1, "PERSON", "Ada Smith"),
        (1, "PERSON", "Ada Smith"),   # multiset: needed twice
        (1, "LOCATION", "Rome"),
        (2, "PERSON", "Bob Jones"),
    ])
    pred = _m(spark, [
        (1, "PERSON", "Ada Smith"),   # found only once -> 1 FN
        (1, "LOCATION", "Rome"),
        (1, "LOCATION", "Mars"),      # FP
        (2, "ORGANIZATION", "Acme"),  # FP of an absent-type
    ])
    got = {r.entity_type: r for r in ner_eval(pred, truth).collect()}
    p = got["PERSON"]
    assert (p.n_pred, p.n_truth, p.tp) == (1, 3, 1)
    assert (p.prec_e6, p.rec_e6) == (1_000_000, 333_333)
    l = got["LOCATION"]
    assert (l.n_pred, l.n_truth, l.tp) == (2, 1, 1)
    assert (l.prec_e6, l.rec_e6) == (500_000, 1_000_000)
    o = got["ORGANIZATION"]
    assert (o.n_pred, o.n_truth, o.tp) == (1, 0, 0)
    assert (o.prec_e6, o.rec_e6) == (0, 1_000_000)  # vacuous recall
