"""Portable LCG: Python / DuckDB / Spark-SQL expression parity."""

import duckdb

from nerpii_spark.functions.hashing import M, h1, h2, hn, sql_h1, sql_h2, sql_hn


def test_python_bounds():
    for k in [0, 1, 42, 10**9, 2**31]:
        for s in range(5):
            assert 0 <= h1(k, s) < M
            assert 0 <= h2(h1(k, s), s + 7) < M


def test_duckdb_parity():
    con = duckdb.connect()
    for k in [0, 5, 999, 123456789]:
        got = con.sql(f"select {sql_h1(str(k), 3)}, {sql_hn(str(k), 1, 2, 3)}").fetchone()
        assert got == (h1(k, 3), hn(k, 1, 2, 3))


def test_duckdb_parity_expr_salt():
    con = duckdb.connect()
    for j in range(5):
        expr = sql_h2(sql_h1("7", 1), "j + 1").replace("j", str(j))
        assert con.sql(f"select {expr}").fetchone()[0] == h2(h1(7, 1), j + 1)


def test_spark_parity(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(
        "id", F.expr(sql_hn("id", 1, 2)).alias("h")
    )
    for r in df.collect():
        assert r["h"] == hn(r["id"], 1, 2)
