"""Wave-33: explicit GROUPING SETS + time-RANGE window frame."""

from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_grouping_sets_structure(spark):
    rows = E.q_grouping_sets(spark, SF).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # gid 0 = (flag, status) cells; gid 1 = (flag) subtotals with
    # status NULL; gid 3 = grand total with both NULL
    assert set(by_gid) == {0, 1, 3}
    assert all(r["l_linestatus"] is None for r in by_gid[1])
    gt = by_gid[3]
    assert len(gt) == 1 and gt[0]["l_returnflag"] is None
    # subtotal consistency: flag subtotals sum to the grand total
    assert sum(r["n_rows"] for r in by_gid[1]) == gt[0]["n_rows"]
    assert sum(r["sum_price_c"] for r in by_gid[1]) == gt[0]["sum_price_c"]
    assert sum(r["n_rows"] for r in by_gid[0]) == gt[0]["n_rows"]


def test_range_frame_recomputed_per_user(spark):
    rows = E.q_range_frame(spark, SF).collect()
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
        .alias("ts_s"),
        F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
    ).collect()
    by_user = {}
    for r in events:
        by_user.setdefault(r["user_id"], []).append(r)
    ts_of = {r["event_id"]: r for r in events}
    import random

    rng = random.Random(7)
    for r in rng.sample(rows, 200):
        me = ts_of[r["event_id"]]
        peers = [
            p for p in by_user[r["user_id"]]
            if me["ts_s"] - 3600 <= p["ts_s"] <= me["ts_s"]
        ]
        assert r["n_1h"] == len(peers), r
        assert r["sum_1h_c"] == sum(p["v_c"] for p in peers), r


def test_range_frame_differs_from_rows_frame(spark):
    # a RANGE frame includes ALL rows at equal ts-distance and excludes
    # row-adjacent-but-time-distant rows — on the real corpus the two
    # framings must disagree somewhere, else the feature is redundant
    e = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
        .alias("ts_s"),
    )
    from pyspark.sql import Window as W

    wr = W.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    ww = W.partitionBy("user_id").orderBy("ts_s").rowsBetween(-3, 0)
    both = e.select(
        "event_id",
        F.count("*").over(wr).alias("nr"),
        F.count("*").over(ww).alias("nw"),
    )
    assert both.where("nr <> nw").count() > 0
