"""Reference-parity unit tests (mirrors tests/test_named_entity_recognizer.py)."""

from nerpii_spark.functions import gazetteers as G
from nerpii_spark.functions.text import (
    address_pattern,
    frequency_df,
    split_name,
    with_gender,
)


def test_deny_list_exact():
    # reference tests/test_named_entity_recognizer.py:39-65 (exact content)
    assert G.ADDRESS_DENY_LIST == [
        "Street", "Rue", "Via", "Square", "Avenue", "Place", "Strada", "St",
        "Lane", "Road", "Boulevard", "Ln", "Rd", "HighwayDrive", "Av", "Hwy",
        "Blvd", "Corso", "Piazza", "Calle", "Plaza", "Avenida", "Rambla",
        "Vico", "C/",
    ]


def test_address_pattern_matches():
    import re

    rx = re.compile(address_pattern())
    assert rx.search("123 Main Street apt 4")
    assert rx.search("Piazza Navona 1")
    assert rx.search("C/ Mayor 5")
    assert not rx.search("Streetwise people")  # word boundary
    assert not rx.search("no address here")


def test_frequency(spark):
    # reference tests/test_named_entity_recognizer.py:14-32
    df = spark.createDataFrame([(v,) for v in [2, 5, 5, 5, 7, 8, 9, 10]], "v int")
    out = {r["v"]: r["freq"] for r in frequency_df(df, "v").collect()}
    assert out[5] == 0.375
    fruit = ["apple", "apple", "banana", "pineapple", "apple", "apple", "pear", "peach"]
    df2 = spark.createDataFrame([(v,) for v in fruit], "v string")
    out2 = {r["v"]: r["freq"] for r in frequency_df(df2, "v").collect()}
    assert out2["apple"] == 0.5


def test_split_name(spark):
    # reference tests/test_named_entity_recognizer.py:158-167
    df = spark.createDataFrame(
        [("George Bush",), (None,), ("Hillary Clinton",)], "person string"
    )
    rows = split_name(df, "person").collect()
    got = [(r["first_name"], r["last_name"]) for r in rows]
    assert ("George", "Bush") in got
    assert ("-", "-") in got
    assert ("Hillary", "Clinton") in got
    assert "person" not in split_name(df, "person").columns


def test_with_gender(spark):
    df = spark.createDataFrame(
        [("George",), ("Hillary",), ("Zzyzx",), (None,)], "first_name string"
    )
    out = {r["first_name"]: r["first_name_gender"] for r in with_gender(df, "first_name").collect()}
    assert out["George"] == "male"
    assert out["Hillary"] == "female"
    assert out["Zzyzx"] == "unknown"
    assert out[None] == "Nan value"
