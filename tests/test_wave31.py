"""Wave-31: Poisson-bootstrap CI + left-outer watermarked
stream-stream join.

The bootstrap gate recomputes a replica by hand, derives the
percentile CI and pins the point estimate inside it, and checks the
Poisson weight distribution is the quantized pmf. The outer-join gate
is the append-mode seal contract: with a watermark-advancing flush the
streaming result equals the batch left-outer join; the flush event
itself (past the final watermark) is the documented un-drainable
tail."""

import shutil

from pyspark.sql import functions as F

from nerpii_spark.functions.hashing import h1
from nerpii_spark.operators import textstats as TS

SF = "/root/testdata/sf0.001"


def test_bootstrap_replica_hand_recomputed(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = {r["b"]: r for r in TS.bootstrap_agreement(docs).collect()}
    assert len(rows) == TS.BOOT_N
    cls = {r["doc_id"]: r["label"]
           for r in TS.quality_classifier(docs).collect()}
    gop = {r["doc_id"]: int(r["keep"])
           for r in TS.gopher_quality(docs).select("doc_id", "keep").collect()}

    def w_of(doc_id, b):
        u = h1(doc_id * TS.BOOT_N + b, TS.BOOT_SALT) % 1000
        for i, c in enumerate(TS._BOOT_CUM):
            if u < c:
                return i
        return 6

    for b in (0, 17, 63):
        n_eff = n_agree = 0
        for d in cls:
            w = w_of(d, b)
            n_eff += w
            n_agree += w * int(cls[d] == gop[d])
        assert rows[b]["n_eff"] == n_eff
        assert rows[b]["n_agree_eff"] == n_agree
        assert rows[b]["acc_ppm"] == 1_000_000 * n_agree // n_eff

    # CI: point estimate sits inside the replica p5..p95 band
    point_agree = sum(int(cls[d] == gop[d]) for d in cls)
    point = 1_000_000 * point_agree // len(cls)
    accs = sorted(r["acc_ppm"] for r in rows.values())
    p5, p95 = accs[3], accs[60]  # 64 replicas
    assert p5 < p95  # genuine spread (the metric is not degenerate)
    assert p5 <= point <= p95


def test_bootstrap_weights_are_quantized_poisson():
    # over many draws the weight histogram matches the quantized pmf
    from collections import Counter

    n = 20000
    cnt = Counter()
    for i in range(n):
        u = h1(i, TS.BOOT_SALT) % 1000
        w = next(
            (j for j, c in enumerate(TS._BOOT_CUM) if u < c), 6
        )
        cnt[w] += 1
    assert abs(cnt[0] / n - 0.368) < 0.02
    assert abs(cnt[1] / n - 0.368) < 0.02
    assert abs(cnt[2] / n - 0.184) < 0.015


def test_outer_stream_join_equals_batch_after_flush(spark, tmp_path):
    from nerpii_spark.streaming.joins import view_click_attribution_outer

    events = spark.read.parquet(f"{SF}/events.parquet")
    # flush events far past everything: one per SIDE, because the
    # query watermark is the MIN across the views and clicks watermark
    # operators (multipleWatermarkPolicy=min) — a view-only flush
    # leaves the click side's watermark at its last real click and
    # strands any later view's seal point (observed: exactly the
    # latest unmatched view stayed buffered)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [
            (10**9, str(max_ts), 0, "view", 0.0, "{}"),
            (10**9 + 1, str(max_ts), 0, "click", 0.0, "{}"),
        ],
        "event_id bigint, ts string, user_id bigint,"
        " event_type string, value double, props string",
    ).select(
        "event_id",
        F.expr("ts :: timestamp_ntz + interval 10 hours").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    all_events = events.unionByName(flush)

    cols = ["user_id", "view_id", "click_id", "gap_s"]
    batch = sorted(
        (
            (r["user_id"], r["view_id"], r["click_id"], r["gap_s"])
            for r in view_click_attribution_outer(events).collect()
        )
    )
    assert any(r[2] is None for r in batch)  # unmatched views exist
    assert any(r[2] is not None for r in batch)

    src = str(tmp_path / "outer_stream")
    events.withColumn("bb", F.expr("event_id % 3")).write.partitionBy(
        "bb"
    ).mode("overwrite").parquet(src)

    # NO maxFilesPerTrigger: all real files must form ONE micro-batch.
    # Unlike the inner join (test_stream_stream_join_equals_batch),
    # an OUTER join drops late input rows — Spark cannot both admit a
    # row below the watermark and stand by already-emitted NULLs — so
    # real events split across watermark-advancing batches would be
    # (correctly!) discarded. That asymmetry is part of the contract
    # this test documents.
    stream = (
        spark.readStream.schema(all_events.schema)
        .parquet(src + "/bb=*")
    )
    q = (
        view_click_attribution_outer(stream)
        .writeStream.format("memory")
        .queryName("outer_attr")
        .outputMode("append")
        .start()
    )
    try:
        # phase 1: ALL real events in one batch (watermark still at
        # zero while they are admitted; tail rows stay buffered).
        # phase 2: the flush lands in a strictly later micro-batch,
        # advancing the watermark past every real seal point so the
        # buffered unmatched views emit their NULL rows.
        q.processAllAvailable()
        flush.withColumn("bb", F.lit(99)).write.partitionBy("bb").mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        got = sorted(
            (r["user_id"], r["view_id"], r["click_id"], r["gap_s"])
            for r in spark.sql(
                "select * from outer_attr where view_id < 1000000000"
            ).collect()
        )
    finally:
        q.stop()
    assert got == batch
    shutil.rmtree(src, ignore_errors=True)
