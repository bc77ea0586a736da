"""Wave-30: TPC-H Q21 (waiting suppliers) and Q22 (dormant high-value
customers) shapes. The Q21 gate re-derives the answer with an
INDEPENDENT Spark formulation (semi/anti joins — the textbook
EXISTS/NOT-EXISTS pair) and asserts set equality with the decorrelated
aggregate form; the Q22 gate recomputes membership row-by-row in plain
Python."""

from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_q21_decorrelated_equals_semi_anti_form(spark):
    got = {
        (r["suppkey"], r["n_waits"])
        for r in E.q_tpch_waiting(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        F.expr("l_shipdate > o_orderdate + interval 60 days").alias("late"),
    ).cache()
    late = lo.where("late").select("l_orderkey", "l_suppkey").distinct()
    others = lo.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).distinct()
    other_late = late.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    # EXISTS another supplier in the order
    ex = late.join(
        others,
        (late.l_orderkey == others.ok) & (late.l_suppkey != others.sk),
        "left_semi",
    )
    # NOT EXISTS another LATE supplier in the order
    nx = ex.join(
        other_late,
        (ex.l_orderkey == other_late.ok) & (ex.l_suppkey != other_late.sk),
        "left_anti",
    )
    want_full = {
        (r["l_suppkey"], r["n"])
        for r in nx.groupBy("l_suppkey")
        .agg(F.count("*").cast("bigint").alias("n"))
        .collect()
    }
    # the query returns the top-10 slice of this set
    assert got <= want_full
    top = sorted(want_full, key=lambda t: (-t[1], t[0]))[:10]
    assert got == set(top)


def test_q22_membership_recomputed_in_python(spark):
    rows = E.q_tpch_idle(spark, SF).collect()
    c = spark.read.parquet(f"{SF}/customer.parquet").collect()
    o = spark.read.parquet(f"{SF}/orders.parquet").collect()
    recent = {
        r["o_custkey"] for r in o
        if str(r["o_orderdate"]) >= "2001-01-01"
    }
    pos = [round(r["c_acctbal"] * 100) for r in c if r["c_acctbal"] > 0]
    sp, np_ = sum(pos), len(pos)
    want = {}
    for r in c:
        bal = round(r["c_acctbal"] * 100)
        if bal * np_ > sp and r["c_custkey"] not in recent:
            k = r["c_nationkey"]
            n, t = want.get(k, (0, 0))
            want[k] = (n + 1, t + bal)
    got = {r["nationkey"]: (r["n_custs"], r["total_bal_c"]) for r in rows}
    assert got == want and len(got) > 0
