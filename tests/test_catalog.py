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


def test_bucketed_join_and_agg_skip_exchange(spark, tmp_path):
    """Two tables bucketed by the same key and count sort-merge-join with
    ZERO Exchange nodes, and a groupBy on the bucket key aggregates
    without its shuffle — the write-once-shuffle-never property
    write_bucketed exists for."""
    cat = TableCatalog(root=str(tmp_path))
    triples = spark.createDataFrame(
        [(f"s{i % 7}", "p", f"o{i}") for i in range(100)],
        "subj string, pred string, obj string",
    )
    ents = spark.createDataFrame(
        [(f"s{i}", i) for i in range(7)], "subj string, entity_id bigint"
    )
    cat.write_bucketed(triples, "tb_triples", bucket_by="subj", n_buckets=4)
    cat.write_bucketed(ents, "tb_ents", bucket_by="subj", n_buckets=4)
    a = cat.read_bucketed(spark, "tb_triples")
    b = cat.read_bucketed(spark, "tb_ents")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "subj")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 100
        g = a.groupBy("subj").count()
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in gplan
        assert g.count() == 7
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("tb_triples", "tb_ents"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compact_reduces_files_preserves_data(spark, tmp_path):
    """Compaction merges a fragmented table to the metadata-computed
    file count, preserves every row byte-for-byte, and swaps the
    directory atomically (old layout fully replaced)."""
    from nerpii_spark.sources.catalog import TableCatalog

    cat = TableCatalog(root=str(tmp_path))
    df = spark.range(0, 10000).selectExpr(
        "id", "id % 7 as k", "cast(id * 3 as string) as v"
    )
    # fragment: 64 tiny files
    df.repartition(64).write.parquet(cat.path("frag"))
    import glob

    before = glob.glob(f"{tmp_path}/frag/*.parquet")
    assert len(before) == 64
    stats = cat.compact(spark, "frag", target_bytes=1 << 40)
    after = glob.glob(f"{tmp_path}/frag/*.parquet")
    assert stats["files_before"] == 64
    assert stats["files_after"] == len(after) == 1
    got = sorted(
        tuple(r) for r in spark.read.parquet(cat.path("frag")).collect()
    )
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


def test_compact_partitioned_table(spark, tmp_path):
    """Partitioned compaction keeps the partition layout (one exchange
    on the partition key) and the data."""
    from nerpii_spark.sources.catalog import TableCatalog

    cat = TableCatalog(root=str(tmp_path))
    df = spark.range(0, 5000).selectExpr("id", "id % 3 as p")
    df.repartition(32).write.partitionBy("p").parquet(cat.path("pt"))
    stats = cat.compact(
        spark, "pt", target_bytes=1 << 40, partition_by=("p",)
    )
    assert stats["files_after"] < stats["files_before"]
    out = spark.read.parquet(cat.path("pt"))
    assert out.count() == 5000
    assert sorted(r["p"] for r in out.select("p").distinct().collect()) == [0, 1, 2]


def test_compact_splits_oversized_partition(spark, tmp_path):
    """A single huge partition value must split across multiple files
    (hashing on partition columns alone would collapse it to one file
    and one writer task)."""
    from nerpii_spark.sources.catalog import TableCatalog

    cat = TableCatalog(root=str(tmp_path))
    # one dominant partition value
    df = spark.range(0, 20000).selectExpr(
        "id", "0 as p", "repeat(cast(id as string), 50) as pad"
    )
    df.repartition(40).write.partitionBy("p").parquet(cat.path("big"))
    import glob
    import os

    sz = sum(
        os.path.getsize(f)
        for f in glob.glob(f"{tmp_path}/big/**/*.parquet", recursive=True)
    )
    stats = cat.compact(
        spark, "big", target_bytes=max(1, sz // 8), partition_by=("p",)
    )
    files = glob.glob(f"{tmp_path}/big/p=0/*.parquet")
    assert len(files) > 1, stats  # split, not one straggler file
    assert spark.read.parquet(cat.path("big")).count() == 20000


def test_compact_refuses_bucketed_tables(spark, tmp_path):
    from nerpii_spark.sources.catalog import TableCatalog

    import pytest as _pytest

    cat = TableCatalog(root=str(tmp_path))
    df = spark.range(0, 100).selectExpr("id", "id % 5 as k")
    cat.write_bucketed(df, "bkt_tbl", bucket_by="k", n_buckets=4)
    try:
        with _pytest.raises(ValueError, match="bucket"):
            cat.compact(spark, "bkt_tbl")
    finally:
        spark.sql("drop table if exists bkt_tbl")


def test_compact_recovers_from_crashed_swap(spark, tmp_path):
    """A leftover .__old__/.__compact__ from a crash mid-swap must not
    wedge the next compaction."""
    import os
    import shutil

    from nerpii_spark.sources.catalog import TableCatalog

    cat = TableCatalog(root=str(tmp_path))
    df = spark.range(0, 1000).selectExpr("id")
    df.repartition(8).write.parquet(cat.path("cr"))
    path = cat.path("cr")
    # simulate: crash after first rename (table dir missing, old present)
    os.rename(path, path + ".__old__")
    os.makedirs(path + ".__compact__")
    stats = cat.compact(spark, "cr", target_bytes=1 << 40)
    assert stats["files_after"] == 1
    assert spark.read.parquet(path).count() == 1000
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__compact__")


def test_merge_upsert_insert_update_delete(spark, tmp_path):
    from nerpii_spark.sources.catalog import TableCatalog

    cat = TableCatalog(root=str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    base.write.parquet(cat.path("m"))
    changes = spark.createDataFrame(
        [(2, "B", "upsert"), (3, None, "delete"), (4, "d", "upsert")],
        "id long, v string, op string",
    )
    stats = cat.merge_upsert(spark, "m", changes, ("id",))
    assert stats == {
        "rows_before": 3, "rows_after": 3, "n_upserts": 2, "n_deletes": 1,
    }
    got = {
        (r["id"], r["v"]) for r in spark.read.parquet(cat.path("m")).collect()
    }
    assert got == {(1, "a"), (2, "B"), (4, "d")}
    # idempotent: re-applying the same batch changes nothing
    stats2 = cat.merge_upsert(spark, "m", changes, ("id",))
    assert stats2["rows_after"] == 3
    got2 = {
        (r["id"], r["v"]) for r in spark.read.parquet(cat.path("m")).collect()
    }
    assert got2 == got


def test_merge_upsert_latest_seq_wins(spark, tmp_path):
    from nerpii_spark.sources.catalog import TableCatalog

    cat = TableCatalog(root=str(tmp_path))
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        cat.path("ms")
    )
    # three changes for one key in one batch: seq 30 (a delete) wins
    changes = spark.createDataFrame(
        [
            (1, "x", "upsert", 10),
            (1, "y", "upsert", 20),
            (1, None, "delete", 30),
            (2, "z", "upsert", 5),
        ],
        "id long, v string, op string, seq long",
    )
    stats = cat.merge_upsert(spark, "ms", changes, ("id",), seq_col="seq")
    assert stats["rows_after"] == 1 and stats["n_deletes"] == 1
    got = {
        (r["id"], r["v"])
        for r in spark.read.parquet(cat.path("ms")).collect()
    }
    assert got == {(2, "z")}
