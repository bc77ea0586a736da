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
