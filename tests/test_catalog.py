"""Catalog layer + reference O1 input coercion."""

import pytest

from nerpii_spark.sources.catalog import TableCatalog, load_table


def test_load_table_csv_and_df(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    # DataFrame passes through untouched (named_entity_recognizer.py:310)
    assert load_table(spark, df) is df
    # CSV path coerced like pd.read_csv (header + inferred schema)
    p = str(tmp_path / "t.csv")
    df.toPandas().to_csv(p, index=False)
    got = load_table(spark, p)
    assert sorted((r["id"], r["v"]) for r in got.collect()) == [(1, "a"), (2, "b")]
    assert dict(got.dtypes)["id"] in ("int", "bigint")
    with pytest.raises(ValueError):
        load_table(spark, 42)


def test_catalog_roundtrip_and_exists(spark, tmp_path):
    cat = TableCatalog(root=str(tmp_path))
    df = spark.createDataFrame(
        [(1, "en", 0), (2, "it", 1)], "doc_id bigint, lang string, bucket int"
    )
    assert not cat.exists(spark, "t")
    cat.write(df, "t", partition_by=("lang",))
    assert cat.exists(spark, "t")
    back = cat.read(spark, "t")
    assert back.count() == 2
    # append mode accumulates
    cat.write(df, "t2")
    cat.write(df, "t2", mode="append")
    assert cat.read(spark, "t2").count() == 4
