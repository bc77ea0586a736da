"""Structured Streaming equivalence: the same operators over readStream
produce the same results as batch (windowed agg with watermark; the
pandas-UDF clean + mapInPandas detect stages compose on streams)."""

import shutil

from pyspark.sql import functions as F

from nerpii_spark.streaming.windows import (
    stream_events_from_dir,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _collect_sorted(df, cols):
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_stream_windowed_counts_equal_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    src_dir = str(tmp_path / "events_stream")
    events.repartition(4).write.mode("overwrite").parquet(src_dir)

    cols = ["window_start", "event_type", "n", "sum_value_c"]
    batch = _collect_sorted(
        windowed_event_counts(spark.read.parquet(src_dir)), cols
    )

    stream = windowed_event_counts(
        stream_events_from_dir(spark, src_dir), watermark="1 hour"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _collect_sorted(spark.sql("select * from win_counts"), cols)
    finally:
        q.stop()
    assert got == batch
    shutil.rmtree(src_dir, ignore_errors=True)


def test_stream_mention_detection_equal_batch(spark, tmp_path):
    """S1+S2 run unchanged on a streaming DataFrame."""
    from nerpii_spark.operators.clean import clean_pages
    from nerpii_spark.operators.detect import detect_mentions
    from nerpii_spark.sources import pages as P
    from test_corpus_and_detect import base_text

    rows = [(i, base_text(i), "en") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    docs.createOrReplaceTempView("s_documents")
    pages = (
        spark.sql(P.pages_sql("spark", doc_rel="s_documents", with_html=True))
        .drop("text")
        .withColumn("text", F.lit(None).cast("string"))
    )
    src_dir = str(tmp_path / "pages_stream")
    pages.repartition(3).write.mode("overwrite").parquet(src_dir)

    batch = _collect_sorted(
        detect_mentions(clean_pages(spark.read.parquet(src_dir))),
        ["doc_id", "entity_type", "mention", "begin"],
    )
    stream_pages = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        detect_mentions(clean_pages(stream_pages))
        .writeStream.format("memory")
        .queryName("stream_mentions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _collect_sorted(
            spark.sql("select * from stream_mentions"),
            ["doc_id", "entity_type", "mention", "begin"],
        )
    finally:
        q.stop()
    assert got == batch
    shutil.rmtree(src_dir, ignore_errors=True)


def test_stateful_stream_dedup(spark, tmp_path):
    """applyInPandasWithState: duplicates dropped ACROSS micro-batches
    (file source with maxFilesPerTrigger=1 forces multiple batches)."""
    from nerpii_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "dup_stream")
    # batch files written separately -> separate micro-batches; doc 100
    # duplicates doc 1's content, doc 101 duplicates doc 2's
    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text")], "doc_id bigint, text string"
    )
    b2 = spark.createDataFrame(
        [(100, "alpha text"), (3, "gamma text")], "doc_id bigint, text string"
    )
    b3 = spark.createDataFrame(
        [(101, "beta text"), (102, "gamma text"), (4, "delta text")],
        "doc_id bigint, text string",
    )
    b1.coalesce(1).write.parquet(src + "/f1")
    import shutil, glob, os

    os.makedirs(src + "/in", exist_ok=True)
    for i, b in enumerate((b1, b2, b3)):
        d = src + f"/tmp{i}"
        b.coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, src + f"/in/batch{i}.parquet")

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/in")
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["doc_id"], r["text"])
            for r in spark.sql("select * from dedup_out").collect()
        }
    finally:
        q.stop()
    assert got == {
        (1, "alpha text"),
        (2, "beta text"),
        (3, "gamma text"),
        (4, "delta text"),
    }
    shutil.rmtree(src, ignore_errors=True)


def test_stateful_dedup_survivor_min_across_chunks(spark, tmp_path):
    """The survivor is the min doc_id of the WHOLE first-seen batch, even
    when applyInPandasWithState splits the group across Arrow chunks."""
    from nerpii_spark.streaming.stateful import dedup_stream

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        src = str(tmp_path / "chunk_stream")
        rows = [(i, "same text") for i in (9, 8, 7, 3, 6, 5)]
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id bigint, text string").parquet(src)
        )
        q = (
            dedup_stream(stream, state_ttl_ms=None)
            .writeStream.format("memory")
            .queryName("chunk_dedup")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = [r["doc_id"] for r in spark.sql(
                "select * from chunk_dedup").collect()]
        finally:
            q.stop()
        assert got == [3]  # min across all chunks, not min of first chunk
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_stateful_dedup_state_ttl_eviction(spark, tmp_path):
    """ProcessingTimeTimeout bounds the state: a fingerprint idle past the
    TTL is evicted and re-emits on recurrence."""
    import os
    import time

    from nerpii_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "ttl_stream")
    os.makedirs(src, exist_ok=True)

    def write_batch(name, rows):
        d = str(tmp_path / f"ttl_tmp_{name}")
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(d)
        import glob
        import shutil as sh

        sh.copy(glob.glob(d + "/part-*.parquet")[0], f"{src}/{name}.parquet")

    def wait_for(n_rows, deadline_s=60):
        end = time.time() + deadline_s
        while time.time() < end:
            if spark.sql("select * from ttl_dedup").count() >= n_rows:
                return
            time.sleep(0.2)
        raise AssertionError(f"timed out waiting for {n_rows} rows")

    write_batch("b1", [(1, "alpha text")])
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # a timer-driven query never quiesces: use a trigger interval + polling
    # (processAllAvailable would block forever — see stateful.py docstring)
    q = (
        dedup_stream(stream, state_ttl_ms=500)
        .writeStream.format("memory")
        .queryName("ttl_dedup")
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        wait_for(1)
        time.sleep(1.5)  # let alpha's 500ms TTL expire on the wall clock
        # deterministic eviction: process an unrelated tick batch — the
        # trigger that handles it also fires the timeout pass for alpha
        # (robust even if the host stalled every timer-driven trigger
        # during the sleep)
        write_batch("b2", [(2, "beta tick")])
        wait_for(2)
        # alpha recurs AFTER eviction: re-emitted
        write_batch("b3", [(100, "alpha text")])
        wait_for(3)
        got = {
            (r["doc_id"], r["text"])
            for r in spark.sql("select * from ttl_dedup").collect()
        }
    finally:
        q.stop()
    assert got == {
        (1, "alpha text"),
        (2, "beta tick"),
        (100, "alpha text"),
    }


def test_stream_static_broadcast_enrich(spark, tmp_path):
    """Stream-static join: a streaming fact feed enriched against a
    broadcast dimension produces exactly the batch result (the standard
    dimension-enrichment pattern; the static side is re-read per
    micro-batch, broadcast by AQE)."""
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{SF}/events.parquet").limit(500)
    src = str(tmp_path / "enrich_stream")
    events.repartition(3).write.mode("overwrite").parquet(src)

    dim = (
        spark.read.parquet(src)
        .select("user_id").distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(3)))
    )
    cols = ["event_id", "user_id", "segment"]

    batch = _collect_sorted(
        spark.read.parquet(src).join(F.broadcast(dim), "user_id")
        .select(*cols),
        cols,
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .join(F.broadcast(dim), "user_id")
        .select(*cols)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _collect_sorted(spark.sql("select * from enriched"), cols)
    finally:
        q.stop()
    assert got == batch


def test_stream_triple_factory_equal_batch(spark, tmp_path):
    """The FUSED S1->S3 extractor (extract_triples_inline, one
    Arrow-batched zero-shuffle pass) runs unchanged on a streaming
    DataFrame — the incremental triple factory: new page files arriving
    in the source directory become triples with no batch re-run, and the
    stream emits exactly the batch result."""
    from nerpii_spark.operators.extract import extract_triples_inline
    from nerpii_spark.sources import pages as P
    from test_corpus_and_detect import base_text

    rows = [(i, base_text(i), "en") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    docs.createOrReplaceTempView("s3_documents")
    pages = (
        spark.sql(P.pages_sql("spark", doc_rel="s3_documents", with_html=True))
        .drop("text")
        .withColumn("text", F.lit(None).cast("string"))
    )
    src_dir = str(tmp_path / "pages_stream3")
    pages.repartition(3).write.mode("overwrite").parquet(src_dir)

    key = ["doc_id", "subj", "pred", "obj"]
    batch = _collect_sorted(
        extract_triples_inline(spark.read.parquet(src_dir)).select(*key), key
    )
    stream_pages = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        extract_triples_inline(stream_pages)
        .select(*key)
        .writeStream.format("memory")
        .queryName("stream_triples")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _collect_sorted(spark.sql("select * from stream_triples"), key)
    finally:
        q.stop()
    assert got == batch and len(batch) > 0
    shutil.rmtree(src_dir, ignore_errors=True)


def test_exactly_once_triple_sink(spark, tmp_path):
    """The foreachBatch sink is exactly-once end to end: (1) the drained
    stream's output equals the batch pipeline's, (2) replaying a
    micro-batch (the at-least-once crash case) rewrites its partition
    instead of duplicating, (3) re-running against the same checkpoint
    ingests nothing new."""
    from nerpii_spark.operators.extract import extract_triples_inline
    from nerpii_spark.sources import pages as P
    from nerpii_spark.streaming.sink import (
        idempotent_batch_sink,
        run_triple_stream,
    )
    from test_corpus_and_detect import base_text

    rows = [(i, base_text(i), "en") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    docs.createOrReplaceTempView("sink_documents")
    pages = (
        spark.sql(P.pages_sql("spark", doc_rel="sink_documents", with_html=True))
        .drop("text")
        .withColumn("text", F.lit(None).cast("string"))
    )
    src_dir = str(tmp_path / "pages_src")
    pages.repartition(3).write.mode("overwrite").parquet(src_dir)
    out_root = str(tmp_path / "triples_out")
    ckpt = str(tmp_path / "ckpt")

    key = ["doc_id", "subj", "pred", "obj"]
    run_triple_stream(spark, src_dir, out_root, ckpt)
    got = _collect_sorted(spark.read.parquet(out_root).select(*key), key)
    want = _collect_sorted(
        extract_triples_inline(spark.read.parquet(src_dir)).select(*key), key
    )
    assert got == want

    # (2) crash-replay: re-deliver batch 0's data with the same batch_id
    sink = idempotent_batch_sink(out_root)
    replay = (
        spark.read.parquet(out_root)
        .where(F.col("batch_id") == 0)
        .drop("batch_id")
    )
    n_before = spark.read.parquet(out_root).count()
    sink(replay, 0)
    assert spark.read.parquet(out_root).count() == n_before
    assert _collect_sorted(
        spark.read.parquet(out_root).select(*key), key
    ) == want

    # (3) resume with committed offsets: nothing re-ingested
    run_triple_stream(spark, src_dir, out_root, ckpt)
    assert spark.read.parquet(out_root).count() == n_before


def test_sink_output_compacts(spark, tmp_path):
    """Composition: the micro-batch sink's many small batch_id files
    compact into the metadata-derived count with rows intact — the
    maintenance pass an incremental ingest runs periodically."""
    from nerpii_spark.sources import pages as P
    from nerpii_spark.sources.catalog import TableCatalog
    from nerpii_spark.streaming.sink import run_triple_stream
    from test_corpus_and_detect import base_text

    rows = [(i, base_text(i), "en") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    docs.createOrReplaceTempView("sc_documents")
    pages = (
        spark.sql(P.pages_sql("spark", doc_rel="sc_documents", with_html=True))
        .drop("text")
        .withColumn("text", F.lit(None).cast("string"))
    )
    src = str(tmp_path / "src")
    pages.repartition(4).write.mode("overwrite").parquet(src)
    cat = TableCatalog(root=str(tmp_path))
    out = cat.path("triples_stream")
    run_triple_stream(spark, src, out, str(tmp_path / "ck"))
    n_before = spark.read.parquet(out).count()
    assert n_before > 0
    # fold the accumulated per-batch partitions into the flat base
    # layout (batch_id survives as a regular column = lineage)
    stats = cat.compact(spark, "triples_stream", target_bytes=1 << 40)
    assert stats["files_before"] > 1 and stats["files_after"] == 1
    after = spark.read.parquet(out)
    assert after.count() == n_before
    assert "batch_id" in after.columns


def test_stateful_stream_sessionize(spark, tmp_path):
    """Event-time sessionization emits exactly when the watermark passes
    a session's end — through the data invocation for keys with traffic
    and the EventTimeTimeout (incl. the trailing no-data round) for
    quiescent keys — and the emitted set equals the native batch
    session_window restricted to sessions the final watermark closed.
    Sessions the watermark has not passed must NOT be emitted."""
    import glob
    import os
    import shutil
    from datetime import datetime, timezone

    from nerpii_spark.streaming.sessionize import sessionize_stream

    def ts(s):
        return datetime.fromtimestamp(s, tz=timezone.utc)

    gap = 1800
    # batch1: u1 one open session; u3 gap-split in batch (two pending
    # segments); u2's event pushes the watermark for batch2's closes
    b1 = [(1, ts(100)), (1, ts(200)), (3, ts(100)), (3, ts(3000)),
          (2, ts(10000))]
    # batch2: u2 returns past the gap (second pending segment); u1/u3
    # close by timeout (watermark 9999 passes their ends); u2's first
    # segment closes in the trailing no-data round (watermark 19999)
    b2 = [(2, ts(20000))]
    src = str(tmp_path / "sess_stream")
    os.makedirs(src + "/in", exist_ok=True)
    for i, rows in enumerate((b1, b2)):
        d = src + f"/tmp{i}"
        spark.createDataFrame(
            rows, "user_id bigint, ts timestamp"
        ).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, src + f"/in/batch{i}.parquet")

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/in")
    )
    q = (
        sessionize_stream(stream, gap_s=gap)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"].timestamp(),
             r["session_end"].timestamp(), r["n_events"])
            for r in spark.sql("select * from sess_out").collect()
        }
    finally:
        q.stop()
    assert got == {
        (3, 100.0, 1900.0, 1),     # timeout close, batch 2
        (1, 100.0, 2000.0, 2),     # timeout close, batch 2
        (3, 3000.0, 4800.0, 1),    # timeout close, batch 2
        (2, 10000.0, 11800.0, 1),  # close in the trailing no-data round
    }  # u2's (20000, ...) session is still open: not emitted

    # batch equivalence: native session_window over the same events,
    # restricted to sessions closed by the final watermark (19999s)
    import pyspark.sql.functions as F

    all_events = spark.createDataFrame(
        b1 + b2, "user_id bigint, ts timestamp"
    )
    native = {
        (r["user_id"], r["s"].timestamp(), r["e"].timestamp(), r["n"])
        for r in all_events.groupBy(
            "user_id", F.session_window("ts", f"{gap} seconds")
        )
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s"),
            F.col("session_window.end").alias("e"),
            "n",
        )
        .collect()
        if r["e"].timestamp() <= 19999
    }
    assert got == native
    shutil.rmtree(src, ignore_errors=True)


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream view->click attribution: the inner
    time-range join over two streaming sides (buffered in state, evicted
    past watermark + horizon) must emit exactly the batch inequality
    join's rows. Multiple micro-batches force cross-batch matches — a
    click arriving in a later batch than its view only matches through
    the join state."""
    from nerpii_spark.streaming.joins import view_click_attribution

    events = spark.read.parquet(f"{SF}/events.parquet")
    cols = ["user_id", "view_id", "click_id", "gap_s"]
    batch = _collect_sorted(view_click_attribution(events), cols)
    assert batch  # planted events produce real attributions

    src = str(tmp_path / "attr_stream")
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1; the split is
    # by event_id range, so many view/click pairs straddle batches
    events.withColumn(
        "b", F.expr("event_id % 3")
    ).write.partitionBy("b").mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    q = (
        view_click_attribution(stream)
        .writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _collect_sorted(spark.sql("select * from attr_out"), cols)
    finally:
        q.stop()
    assert got == batch
    import shutil

    shutil.rmtree(src, ignore_errors=True)


def test_stateful_sessionize_out_of_order_and_late(spark, tmp_path):
    """Review repro, under the sound watermark-driven contract: (1) an
    out-of-order event ABOVE the watermark forms its own exact earlier
    session — never absorbed into a later one, and crucially never
    clipped by an earlier premature emission (emission waits for the
    watermark, the only point after which no in-gap arrival is
    possible); (2) an event BELOW the watermark is late and dropped,
    the native streaming session_window contract; (3) quiescent keys
    emit through the no-data timeout batch once the watermark
    advances."""
    import glob
    import os
    import shutil
    from datetime import datetime, timezone

    from nerpii_spark.streaming.sessionize import sessionize_stream

    def ts(s):
        return datetime.fromtimestamp(s, tz=timezone.utc)

    gap = 60
    # watermark delay 45000s: after batch1 (max ts 50000) wm = 5000
    b1 = [(1, ts(12000)), (9, ts(50000))]
    # batch2 at wm=5000: u1@10000 is out of order but above wm -> its
    # own session; u1@12030 merges into 12000's; u1@3000 is BELOW wm ->
    # dropped late
    b2 = [(1, ts(10000)), (1, ts(12030)), (1, ts(3000))]
    # batch3 pushes wm to 55000 -> the no-data timeout round closes
    # every session ending before 55000
    b3 = [(9, ts(100000))]
    src = str(tmp_path / "sess_ooo")
    os.makedirs(src + "/in", exist_ok=True)
    for i, rows in enumerate((b1, b2, b3)):
        d = src + f"/tmp{i}"
        spark.createDataFrame(
            rows, "user_id bigint, ts timestamp"
        ).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, src + f"/in/batch{i}.parquet")
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/in")
    )
    q = (
        sessionize_stream(stream, gap_s=gap,
                          watermark_delay="45000 seconds")
        .writeStream.format("memory")
        .queryName("sess_ooo_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"].timestamp(),
             r["session_end"].timestamp(), r["n_events"])
            for r in spark.sql("select * from sess_ooo_out").collect()
        }
    finally:
        q.stop()
    assert got == {
        (1, 10000.0, 10060.0, 1),   # out-of-order earlier session, exact
        (1, 12000.0, 12090.0, 2),   # 12000+12030 merged; 3000 dropped
        (9, 50000.0, 50060.0, 1),   # closed by the advanced watermark
    }  # u9's 100000 session stays open (wm never passes 100060)
    shutil.rmtree(src, ignore_errors=True)


def test_stateful_sessionize_random_streams_match_native(spark, tmp_path):
    """Randomized equivalence under ARBITRARY batch splits (events reach
    the operator out of order across batches): with the per-batch
    watermark ratchet and its late-event drops replayed exactly in
    Python, the emitted set must EQUAL native session_window over the
    kept events restricted to sessions the final watermark closed
    (trailing no-data rounds fire the remaining expired timers —
    processAllAvailable drains them)."""
    import glob
    import os
    import random
    import shutil
    from datetime import datetime, timezone

    import pyspark.sql.functions as F

    from nerpii_spark.streaming.sessionize import sessionize_stream

    gap = 300
    for seed in (11, 29):
        rng = random.Random(seed)
        rows = [
            (rng.randrange(4), datetime.fromtimestamp(
                rng.randrange(0, 10000), tz=timezone.utc))
            for _ in range(25)
        ]
        src = str(tmp_path / f"sess_rand{seed}")
        os.makedirs(src + "/in", exist_ok=True)
        batches = [[], [], []]
        for i, r in enumerate(rows):
            batches[rng.randrange(3)].append(r)
        for i, b in enumerate(b for b in batches if b):
            d = src + f"/tmp{i}"
            spark.createDataFrame(
                b, "user_id bigint, ts timestamp"
            ).coalesce(1).write.parquet(d)
            part = glob.glob(d + "/part-*.parquet")[0]
            shutil.copy(part, src + f"/in/batch{i}.parquet")
        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/in")
        )
        q = (
            sessionize_stream(stream, gap_s=gap,
                              watermark_delay="0 seconds")
            .writeStream.format("memory")
            .queryName(f"sess_rand_out{seed}")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r["user_id"], r["session_start"].timestamp(),
                 r["session_end"].timestamp(), r["n_events"])
                for r in spark.sql(
                    f"select * from sess_rand_out{seed}"
                ).collect()
            }
        finally:
            q.stop()
        # replay the watermark ratchet + late drops exactly: the
        # operator keeps ts >= the ENTERING wm (batch N's entering wm =
        # max event ts of batches 1..N-1, delay 0) — but Spark's own
        # late-record filter for event-time-timeout stateful ops runs
        # FIRST, strictly (ts > wm) against a one-batch-LAGGED wm
        # (measured in the ratelimit probes), so a tie with a
        # STATIONARY watermark is dropped upstream before the operator
        # can keep it: kept iff ts >= wm_entering AND ts > wm_lagged
        wm, wm_lag = 0.0, 0.0
        kept = []
        for b in (b for b in batches if b):
            for u, t in b:
                if t.timestamp() >= wm and t.timestamp() > wm_lag:
                    kept.append((u, t))
            wm_lag = wm
            wm = max(wm, max(t.timestamp() for _, t in b))
        final_wm = wm
        kept_df = spark.createDataFrame(
            kept, "user_id bigint, ts timestamp"
        )
        native_rows = (
            kept_df.groupBy(
                "user_id", F.session_window("ts", f"{gap} seconds")
            )
            .agg(F.count("*").alias("n"))
            .select(
                "user_id",
                F.col("session_window.start").alias("s"),
                F.col("session_window.end").alias("e"),
                "n",
            )
            .collect()
        )
        expected = {
            (r["user_id"], r["s"].timestamp(), r["e"].timestamp(), r["n"])
            for r in native_rows
            if r["e"].timestamp() < final_wm
        }
        assert got == expected, (seed, got ^ expected)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_quarantine_sink_splits_and_reasons(spark, tmp_path):
    """Dead-letter gate: valid rows publish, malformed rows land in
    quarantine with the exact tripped check ids; re-running with the
    same checkpoint is a no-op (idempotent replay contract)."""
    from nerpii_spark.streaming.sink import run_validated_page_stream

    rows = [
        (1, "http://a.example/x", "en", "good text"),
        (2, "http://a.example/y", "en", ""),            # empty_text
        (3, "ftp://bad.example/z", "en", "text"),       # bad_url
        (4, "http://b.example/w", None, "text"),        # missing_lang
        (5, None, "", None),                            # all three
    ]
    src = str(tmp_path / "vpages_src")
    spark.createDataFrame(
        rows, "doc_id bigint, url string, lang string, text string"
    ).coalesce(1).write.parquet(src)
    out = str(tmp_path / "vpages_out")
    quar = str(tmp_path / "vpages_quar")
    ckpt = str(tmp_path / "vpages_ckpt")

    run_validated_page_stream(spark, src, out, quar, ckpt)

    ok = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert ok == {1}
    bad = {
        r["doc_id"]: sorted(r["reasons"])
        for r in spark.read.parquet(quar).collect()
    }
    assert bad == {
        2: ["empty_text"],
        3: ["bad_url"],
        4: ["missing_lang"],
        5: ["bad_url", "empty_text", "missing_lang"],
    }

    # replay: same checkpoint -> no new batches, outputs unchanged
    before = sorted(
        map(tuple, spark.read.parquet(out).drop("batch_id").collect())
    )
    run_validated_page_stream(spark, src, out, quar, ckpt)
    after = sorted(
        map(tuple, spark.read.parquet(out).drop("batch_id").collect())
    )
    assert before == after
    assert spark.read.parquet(quar).count() == 4


def test_windowed_hll_registers_stream_equals_batch_and_estimates(
    spark, tmp_path
):
    """The mergeable-sketch streaming pattern: register maxima
    maintained BY a streaming windowed agg equal the batch registers
    bit-for-bit, and the estimate-on-read rollup lands within HLL
    error of the exact windowed distinct-user counts."""
    from nerpii_spark.operators.sketch import hll_estimate_from_registers
    from nerpii_spark.streaming.windows import (
        stream_events_from_dir,
        windowed_user_hll_registers,
    )

    events = spark.read.parquet(f"{SF}/events.parquet")
    src_dir = str(tmp_path / "hll_stream")
    events.repartition(4).write.mode("overwrite").parquet(src_dir)

    cols = ["window_start", "event_type", "j", "rho"]
    batch_regs = _collect_sorted(
        windowed_user_hll_registers(spark.read.parquet(src_dir)), cols
    )
    q = (
        windowed_user_hll_registers(
            stream_events_from_dir(spark, src_dir), watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _collect_sorted(spark.sql("select * from hll_regs"), cols)
    finally:
        q.stop()
    assert got == batch_regs  # merge op == max -> bit-identical state

    # estimate-on-read vs exact truth, standard HLL error bound
    est = {
        (r["window_start"], r["event_type"]): r["est_distinct"]
        for r in hll_estimate_from_registers(
            spark.sql("select * from hll_regs"),
            ["window_start", "event_type"],
        ).collect()
    }
    truth = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(src_dir)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect()
    }
    assert set(est) == set(truth)
    for k, n in truth.items():
        # 64 registers -> ~13% std error; allow 3 sigma + small-n slack
        assert abs(est[k] - n) <= max(0.4 * n, 8), (k, est[k], n)


def test_rate_limit_stream_matches_batch_fold(spark, tmp_path):
    """Token-bucket admission under ARBITRARY batch splits: with the
    watermark ratchet + late drops replayed in Python, the streaming
    decisions must EQUAL the pure batch fold over kept events with
    ts < final watermark — order-sensitivity is exactly why decisions
    wait for the seal (the sessionize lesson)."""
    import glob
    import os
    import random
    import shutil
    from datetime import datetime, timezone

    from nerpii_spark.streaming.ratelimit import (
        rate_limit_batch,
        rate_limit_stream,
    )

    cap, tps = 2, 1
    for seed in (7, 23):
        rng = random.Random(seed)
        rows = [
            (
                f"h{rng.randrange(3)}",
                rng.randrange(0, 40) * 1000,  # ms, second granularity
                i,
            )
            for i in range(30)
        ]
        src = str(tmp_path / f"rl{seed}")
        os.makedirs(src + "/in", exist_ok=True)
        batches = [[], [], []]
        for r in rows:
            batches[rng.randrange(3)].append(r)
        for i, b in enumerate(b for b in batches if b):
            d = src + f"/tmp{i}"
            spark.createDataFrame(
                [
                    (h, datetime.fromtimestamp(t // 1000, tz=timezone.utc), x)
                    for h, t, x in b
                ],
                "host string, ts timestamp, doc_id bigint",
            ).coalesce(1).write.parquet(d)
            part = glob.glob(d + "/part-*.parquet")[0]
            shutil.copy(part, src + f"/in/batch{i}.parquet")
        stream = (
            spark.readStream.schema("host string, ts timestamp, doc_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/in")
        )
        q = (
            rate_limit_stream(stream, capacity=cap, rate_tps=tps,
                              watermark_delay="0 seconds")
            .writeStream.format("memory")
            .queryName(f"rl_out{seed}")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (
                    r["host"],
                    int(r["ts"].timestamp() * 1000),
                    r["doc_id"],
                    r["admitted"],
                    r["tokens_milli_after"],
                )
                for r in spark.sql(f"select * from rl_out{seed}").collect()
            }
        finally:
            q.stop()
        # replay the ratchet: wm entering batch N = max ts of batches
        # 1..N-1 (delay 0); arrivals NOT strictly past it drop (the
        # operator's strict gate — see ratelimit.py on Spark's own
        # strict lagged filter)
        wm = 0
        kept = []
        for b in (b for b in batches if b):
            for h, t, x in b:
                if t > wm:
                    kept.append((h, t, x))
            wm = max(wm, max(t for _, t, _ in b))
        final_wm = wm
        sealed = [(h, t, x) for h, t, x in kept if t < final_wm]
        expected = rate_limit_batch(sealed, cap, tps)
        assert got == expected, (seed, got ^ expected)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_rate_limit_bucket_fold_semantics():
    """Hand golden: capacity 2, 1 token/s. Burst of 3 at t=0 admits 2,
    defers 1; after 1.5s one token has refilled (exact integer micro-
    token arithmetic: 500 milli remain after spending it)."""
    from nerpii_spark.streaming.ratelimit import bucket_fold

    evs = [(0, 1), (0, 2), (0, 3), (1500, 4)]
    out, tokens_u, clock = bucket_fold(evs, capacity=2, rate_tps=1)
    assert [(i, a) for _, i, a, _ in out] == [
        (1, True), (2, True), (3, False), (4, True)]
    assert out[2][3] == 0  # drained
    assert out[3][3] == 500  # 1500ms refill - 1 token spent = 0.5 left
    assert clock == 1500 and tokens_u == 500_000


def test_rate_limit_idle_host_state_evicted(spark, tmp_path):
    """A host whose bucket refills to capacity while idle is forgotten
    (state bounded by the active working set); decisions afterwards are
    identical to a fresh bucket — asserted through the batch-fold
    equality on a stream with a long idle gap."""
    import glob
    import os
    import shutil
    from datetime import datetime, timezone

    from nerpii_spark.streaming.ratelimit import (
        rate_limit_batch,
        rate_limit_stream,
    )

    rows = [
        ("h", 0, 1), ("h", 1000, 2), ("h", 2000, 3),   # burn the bucket
        ("h", 600_000, 4), ("h", 600_000, 5),           # long-idle return
        ("z", 650_000, 6),                               # wm pusher
    ]
    src = str(tmp_path / "rl_idle")
    os.makedirs(src + "/in", exist_ok=True)
    batches = [rows[:3], rows[3:]]
    for i, b in enumerate(batches):
        d = src + f"/tmp{i}"
        spark.createDataFrame(
            [
                (h, datetime.fromtimestamp(t // 1000, tz=timezone.utc), x)
                for h, t, x in b
            ],
            "host string, ts timestamp, doc_id bigint",
        ).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, src + f"/in/batch{i}.parquet")
    stream = (
        spark.readStream.schema("host string, ts timestamp, doc_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/in")
    )
    q = (
        rate_limit_stream(stream, capacity=2, rate_tps=1,
                          watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("rl_idle_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["host"], int(r["ts"].timestamp() * 1000), r["doc_id"],
             r["admitted"], r["tokens_milli_after"])
            for r in spark.sql("select * from rl_idle_out").collect()
        }
    finally:
        q.stop()
    final_wm = 650_000
    # ts=0 arrives at wm=0: dropped by the strict gate (and by Spark's
    # own strict filter — the measured epoch-0 corner)
    sealed = [(h, t, x) for h, t, x in rows if 0 < t < final_wm]
    assert got == rate_limit_batch(sealed, 2, 1)
    # the long-idle return finds a FULL bucket again
    by_id = {i: (a, m) for _, _, i, a, m in got}
    assert by_id[4] == (True, 1000) and by_id[5] == (True, 0)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_derived_watermark_seals_planted_lateness(spark, tmp_path):
    """VERDICT r3 #8: the watermark-audit -> settings loop. The delay
    derived from the measured (global-runmax, arrival-order) lateness
    profile must SEAL the planted delay distribution on a live append-
    mode stream — bit-equal to batch — while a smaller delay measurably
    drops rows (so the gate can fail)."""
    import os

    from nerpii_spark.functions.hashing import sql_h1
    from nerpii_spark.operators.events import (
        WM_JITTER_S,
        WM_SALT,
        derive_watermark,
        derive_watermark_delay,
    )

    n = 600
    base_s = 1_704_067_200  # 2024-01-01
    events = spark.createDataFrame(
        [(i, base_s + 7 * i, 100 + (i % 5), f"t{i % 3}", float(i % 11))
         for i in range(n)],
        "event_id bigint, ts_s bigint, user_id bigint,"
        " event_type string, value double",
    ).selectExpr(
        "event_id", "timestamp_seconds(ts_s) as ts", "user_id",
        "event_type", "value", "cast(null as string) as props",
    )
    d = derive_watermark_delay(events)
    assert 0 < d <= WM_JITTER_S
    assert derive_watermark(events) == f"{d} seconds"
    # a tolerated drop rate can only shrink the delay
    assert derive_watermark_delay(events, tolerated_drop=0.10) <= d

    # arrival order = planted audit model (ts + h1(event_id) % jitter)
    arrival = events.selectExpr(
        "*",
        f"unix_micros(cast(ts as timestamp))"
        f" + (({sql_h1('event_id', WM_SALT)}) % {WM_JITTER_S}) * 1000000"
        " as arr_us",
    ).orderBy("arr_us", "event_id").drop("arr_us").collect()
    max_ts_s = base_s + 7 * (n - 1)
    sentinel_ts = max_ts_s + d + 7200  # pushes the watermark past all
    cols = ["window_start", "event_type", "n", "sum_value_c"]
    batch = _collect_sorted(windowed_event_counts(events), cols)

    def run_stream(name, watermark, chunks=6):
        src = str(tmp_path / name)
        os.makedirs(src)
        stream = windowed_event_counts(
            stream_events_from_dir(spark, src), watermark=watermark
        )
        q = (
            stream.writeStream.format("memory").queryName(name)
            .outputMode("append").start()
        )
        try:
            per = (len(arrival) + chunks - 1) // chunks
            from datetime import datetime, timezone

            feeds = [
                arrival[i * per:(i + 1) * per] for i in range(chunks)
            ] + [
                # tz-AWARE: a naive datetime is read as system-local by
                # the non-Arrow createDataFrame path, shifting the
                # sentinel hours on non-UTC hosts and stranding the
                # tail windows unsealed
                [(10_000_000 + k,
                  datetime.fromtimestamp(sentinel_ts + k, tz=timezone.utc),
                  1, "zz_sentinel", 0.0, None)]
                for k in range(2)
            ]
            for rows in feeds:
                if not rows:
                    continue
                spark.createDataFrame(
                    rows, events.schema
                ).coalesce(1).write.mode("append").parquet(src)
                q.processAllAvailable()
            got = spark.sql(f"select * from {name}").where(
                F.col("event_type") != "zz_sentinel"
            )
            return _collect_sorted(got, cols)
        finally:
            q.stop()

    sealed = run_stream("wm_sealed", f"{d} seconds")
    assert sealed == batch
    # negative control: an under-sized watermark drops late rows
    leaky = run_stream("wm_leaky", f"{max(0, d // 8)} seconds")
    assert leaky != batch
    assert sum(int(r[2]) for r in leaky) < sum(int(r[2]) for r in batch)


def test_derive_watermark_delay_edge_cases(spark):
    """Empty calibration set -> 0; full drop tolerance -> 0; the
    derived delay is monotone non-increasing in the tolerance."""
    from nerpii_spark.operators.events import derive_watermark_delay

    schema = (
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string"
    )
    empty = spark.createDataFrame([], schema)
    assert derive_watermark_delay(empty) == 0
    ev = spark.createDataFrame(
        [(i, 1_704_067_200 + 5 * i) for i in range(200)],
        "event_id bigint, ts_s bigint",
    ).selectExpr("event_id", "timestamp_seconds(ts_s) as ts")
    d0 = derive_watermark_delay(ev, tolerated_drop=0.0)
    prev = d0
    for tol in (0.01, 0.05, 0.25, 1.0):
        d = derive_watermark_delay(ev, tolerated_drop=tol)
        assert d <= prev
        prev = d
    assert derive_watermark_delay(ev, tolerated_drop=1.0) == 0
