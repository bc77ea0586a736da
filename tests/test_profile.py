"""Tabular-mode goldens ported from the reference test suite
(/root/reference/tests/test_named_entity_recognizer.py:135-309).

The fixture is the reference's 6-column / 3-row frame verbatim (:137-150);
the expected dicts are the reference's staged goldens. The model-stage
confidence for `university` is OUR deterministic contract (1/3 = B-ORG
tag frequency of the pattern tagger) — the reference skips that assertion
because its BERT output "is not always equal to itself" (:268-269).
"""

import pytest

from nerpii_spark.operators.profile import (
    manual_rule_entity,
    profile_as_dict,
)


@pytest.fixture(scope="module")
def dataset(spark):
    rows = list(
        zip(
            ["John@email.com.", "Snow@email.com", "frank@email.com"],
            ["New York", "Chicago", "Phoenix"],
            ["Washington", "Florida", "Texas"],
            [
                "University of London",
                "University of Georgia",
                "University of California",
            ],
            ["George Bush", None, "Hillary Clinton"],
            ["10145", "N11RG", "56178"],
        )
    )
    return spark.createDataFrame(
        rows,
        "email string, city string, state string, university string,"
        " person string, zipcode string",
    )


def test_presidio_stage_golden(dataset):
    """Reference test_assign_entities_and_score (:254-265): presidio-only
    profile — university and zipcode remain None."""
    got = profile_as_dict(dataset, manual=False, model=False)
    assert got == {
        "email": {"entity": "EMAIL_ADDRESS", "confidence_score": 1.0},
        "city": {"entity": "LOCATION", "confidence_score": 1.0},
        "state": {"entity": "LOCATION", "confidence_score": 1.0},
        "university": None,
        "person": {"entity": "PERSON", "confidence_score": 1.0},
        "zipcode": None,
    }


def test_full_pipeline_golden(dataset):
    """Reference E1+E2 composition (README order presidio->manual->model):
    zipcode via the name rule (:538-546), university via the model stage
    (:505-521)."""
    got = profile_as_dict(dataset)
    assert got == {
        "email": {"entity": "EMAIL_ADDRESS", "confidence_score": 1.0},
        "city": {"entity": "LOCATION", "confidence_score": 1.0},
        "state": {"entity": "LOCATION", "confidence_score": 1.0},
        "university": {
            "entity": "ORGANIZATION",
            "confidence_score": pytest.approx(1 / 3),
        },
        "person": {"entity": "PERSON", "confidence_score": 1.0},
        "zipcode": {"entity": "ZIPCODE", "confidence_score": 1.0},
    }


def test_manual_rule_precedence():
    """O16's exact boolean precedence (:538-551): Python and/or binding
    makes the credit check ((credit|card) & number) | (carta & credito);
    credit-card check runs second and overwrites."""
    assert manual_rule_entity("zip") == "ZIPCODE"
    assert manual_rule_entity("postal_code") == "ZIPCODE"
    assert manual_rule_entity("cap") == "ZIPCODE"
    assert manual_rule_entity("credit card number") == "CREDIT_CARD_NUMBER"
    assert manual_rule_entity("card number") == "CREDIT_CARD_NUMBER"
    assert manual_rule_entity("carta di credito") == "CREDIT_CARD_NUMBER"
    assert manual_rule_entity("credit") is None
    assert manual_rule_entity("number") is None
    # zipcode assigned first, credit-card overwrites (both match)
    assert manual_rule_entity("zip card number") == "CREDIT_CARD_NUMBER"


def test_location_name_guard(spark):
    """O12: a LOCATION-heavy column whose name contains 'name' is NOT
    overridden to LOCATION (:466-470) — majority vote still applies."""
    df = spark.createDataFrame(
        [("Chicago",), ("Paris",), ("Berlin",)], "city_name string"
    )
    got = profile_as_dict(df, manual=False, model=False)
    # mode is still LOCATION here (it is the only entity), but via O13
    assert got == {
        "city_name": {"entity": "LOCATION", "confidence_score": 1.0}
    }


def test_threshold_30_percent(spark):
    """O11: a column with <=30% typed values stays None (:449-452)."""
    df = spark.createDataFrame(
        [("Chicago",), ("zzz",), ("yyy",), ("xxx",)], "mixed string"
    )
    got = profile_as_dict(df, manual=False, model=False)
    assert got == {"mixed": None}  # 1 typed of 4 rows = 25% < 30%


def test_data_sample_cap(spark):
    """O2 working-set cap (named_entity_recognizer.py:287,316): profiling
    a bounded sample; deterministic unlike the reference's unseeded
    sample."""
    rows = [("Chicago",)] * 3 + [("zzz",)] * 97
    df = spark.createDataFrame(rows, "city string")
    # full scan: 3 typed of 100 rows = 3% < 30% -> None
    assert profile_as_dict(df, manual=False, model=False) == {"city": None}
    # capped at the first 3 rows: 3/3 typed -> LOCATION
    from nerpii_spark.operators.profile import column_profile

    capped = column_profile(df, manual=False, model=False, data_sample=3)
    row = {r["col"]: (r["entity"], r["confidence"]) for r in capped.collect()}
    assert row == {"city": ("LOCATION", 1.0)}


def test_split_name_invalid_input():
    import pytest as _pytest

    from nerpii_spark.functions.text import split_name

    with _pytest.raises(ValueError):
        split_name(None, "name")
