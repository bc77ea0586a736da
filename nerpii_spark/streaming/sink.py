"""Exactly-once streaming sink for the incremental triple factory.

foreachBatch gives at-least-once delivery: after a crash between "sink
wrote" and "offsets committed", Structured Streaming REPLAYS the last
micro-batch with the same deterministic batch_id. The sink therefore
must be idempotent per batch_id, and the standard lakehouse recipe is
exactly that: partition the output by batch_id and make each write a
DYNAMIC partition overwrite — a replay rewrites its own partition
byte-identically instead of appending duplicates. (The same contract an
Iceberg `replacePartitions` commit gives; Parquet dynamic overwrite is
the local stand-in, swapped by catalog config like every other write in
this repo.)

Scale shape: the sink adds no shuffle — each micro-batch's triples
stream straight from the fused S1->S3 extractor's map tasks to
partition files; overwrite granularity is one batch directory, so
replays never touch other batches' data, and downstream consumers read
the union of batch partitions (or compact them with the catalog's
bucketed writer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def idempotent_batch_sink(out_root: str):
    """foreachBatch callback: write the micro-batch under
    batch_id=<epoch_id> with dynamic partition overwrite — safe under
    Structured Streaming's replay semantics (same batch_id -> same
    partition rewritten, never duplicated)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.partitionBy("batch_id")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_root)
        )

    return _write


def run_triple_stream(
    spark: SparkSession,
    pages_dir: str,
    out_root: str,
    checkpoint_dir: str,
) -> None:
    """Drain all available page files through the fused S1->S3 extractor
    into the idempotent sink, committing source offsets to
    `checkpoint_dir` (availableNow trigger: process everything pending,
    then stop — the batch-sized unit of an incremental crawl ingest).
    Re-running with the same checkpoint is a no-op until new files
    arrive; killing it mid-drain and re-running replays at most the
    uncommitted batch, which the sink absorbs."""
    from nerpii_spark.operators.extract import extract_triples_inline

    schema = spark.read.parquet(pages_dir).schema
    stream_pages = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    q = (
        extract_triples_inline(stream_pages)
        .select("doc_id", "url", "subj", "pred", "obj")
        .writeStream.foreachBatch(idempotent_batch_sink(out_root))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def quarantine_batch_sink(
    out_root: str,
    quarantine_root: str,
    checks: list[tuple[str, str]],
):
    """foreachBatch callback implementing the streaming half of the
    expectations gate (operators/diagnose.expectations_report): rows
    passing every check stream to the main sink, rows tripping any
    check divert to a quarantine table carrying `reasons` (the array of
    tripped check ids) — the dead-letter-queue pattern, so one malformed
    crawl record can neither poison the published table nor kill the
    stream. `checks` is [(check_id, violation_predicate_sql)].

    Both writes stay idempotent under micro-batch replay exactly like
    idempotent_batch_sink: partitioned by batch_id, dynamic partition
    overwrite, so a crash-replayed batch rewrites its own two
    partitions byte-identically. Scale shape: the reasons array is one
    chained-projection pass over the micro-batch (whole-stage codegen,
    no shuffle); the batch is cached once so the two filtered writes
    do not recompute the upstream extractor."""
    reasons = (
        "filter(array("
        + ", ".join(
            f"case when ({pred}) then '{cid}' end" for cid, pred in checks
        )
        + "), x -> x is not null)"
    )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        classified = (
            batch_df.withColumn("reasons", F.expr(reasons))
            .withColumn("batch_id", F.lit(batch_id))
            .cache()
        )
        try:
            (
                classified.where(F.size("reasons") == 0)
                .drop("reasons")
                .write.partitionBy("batch_id")
                .mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(out_root)
            )
            (
                classified.where(F.size("reasons") > 0)
                .write.partitionBy("batch_id")
                .mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(quarantine_root)
            )
        finally:
            classified.unpersist()

    return _write


# default check set for the page stream: the streaming subset of
# diagnose.expectations_report's per-row constraints (table-level
# checks — uniqueness, FK — stay in the batch gate; a micro-batch
# cannot see global state)
PAGE_STREAM_CHECKS: list[tuple[str, str]] = [
    ("empty_text", "text is null or length(text) = 0"),
    ("bad_url", "url is null or url not rlike '^https?://'"),
    ("missing_lang", "lang is null or length(lang) = 0"),
]


def run_validated_page_stream(
    spark: SparkSession,
    pages_dir: str,
    out_root: str,
    quarantine_root: str,
    checkpoint_dir: str,
    checks: list[tuple[str, str]] | None = None,
) -> None:
    """Drain pending page files through the quarantine gate
    (availableNow trigger, same incremental-ingest unit as
    run_triple_stream): valid pages publish, malformed pages land in
    the dead-letter table with their tripped check ids."""
    schema = spark.read.parquet(pages_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            quarantine_batch_sink(
                out_root, quarantine_root, checks or PAGE_STREAM_CHECKS
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
