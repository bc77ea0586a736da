"""Wave-25: streaming Misra-Gries heavy hitters. The summary CONTENTS
legitimately depend on micro-batch segmentation, so the gates assert
the MG INVARIANTS (the sessionize lesson): the additive-underestimate
bound under randomized batch splits, and that every true heavy hitter
above the threshold survives in the merged summary."""

import random
import shutil
from collections import Counter

from pyspark.sql import functions as F

from nerpii_spark.streaming.heavyhitters import (
    MG_K,
    MG_SHARDS,
    mg_fold,
    mg_merge,
    mg_stream,
)

SF = "/root/testdata/sf0.001"


def test_mg_fold_pure_invariants():
    rng = random.Random(3)
    items = [f"i{j}" for j in range(30)]
    weights = [1 + (j % 7) * 5 for j in range(30)]
    stream = rng.choices(items, weights=weights, k=5000)
    exact = Counter(stream)
    for k in (4, 8, 16):
        for n_chunks in (1, 7, 23):
            chunks = [
                stream[i::n_chunks] for i in range(n_chunks)
            ]
            s: dict = {}
            for ch in chunks:
                s = mg_fold(s, Counter(ch), k)
            assert len(s) <= k
            n = len(stream)
            for item, est in s.items():
                # MG: 0 <= exact - est <= N/k, and est never overcounts
                assert 0 <= exact[item] - est <= n // k + 1, (k, item)
            # every item with exact count > N/k must survive
            for item, c in exact.items():
                if c > n // k + n // k:  # comfortably above threshold
                    assert item in s, (k, item, c)


def test_mg_stream_guarantee_under_random_batch_splits(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    src_dir = str(tmp_path / "mg_stream_src")
    # randomized segmentation: many small files -> many micro-batches
    events.repartition(13).write.mode("overwrite").parquet(src_dir)

    exact = {
        r.event_type: r.n
        for r in spark.read.parquet(src_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_total = sum(exact.values())

    stream = mg_stream(
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("mg_hh")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "select shard, item, est_count from ("
            " select *, max(upd) over (partition by shard) as mx"
            " from mg_hh) where upd = mx"
        ).collect()
    finally:
        q.stop()
    # newest snapshot per shard, selected by the update ordinal
    per_shard: dict = {}
    for r in rows:
        per_shard.setdefault(r.shard, {})[r.item] = r.est_count
    merged = mg_merge(list(per_shard.values()), MG_K)
    assert len(merged) <= MG_K
    # global guarantee: error budgets add across shards
    budget = sum(
        (sum(s.values()) // MG_K + 1) for s in per_shard.values()
    ) + n_total // MG_K + 1
    for item, est in merged.items():
        assert item in exact and 0 <= exact[item] - est <= budget
    # the event feed has ~5 types, k=8 per shard: every true type
    # must be present in the merged candidate set
    for item in exact:
        assert item in merged, item
    shutil.rmtree(src_dir, ignore_errors=True)
