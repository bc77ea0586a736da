"""Z-order layout: rectangle bound + clustered-write pruning proof."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nerpii_spark.operators import layout as L

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_bucket_rectangle_bound(spark, events):
    """256 buckets = top 4 bits of each dimension fixed -> every bucket's
    bounding box is <= 4096 on each side (the min/max-pruning guarantee,
    by construction — this is what makes footer stats selective on BOTH
    dimensions)."""
    rows = L.zorder_stats(events).collect()
    assert rows
    side = 1 << (16 - L.N_BUCKETS_BITS // 2)
    for r in rows:
        assert r["max_x"] - r["min_x"] < side, r
        assert r["max_y"] - r["min_y"] < side, r
        assert 0 <= r["bucket"] < (1 << L.N_BUCKETS_BITS)


def test_write_zordered_files_are_clustered(spark, events, tmp_path):
    """The written layout actually prunes: per-file (x, y) bounding-box
    areas sum to a small multiple of the global area (an unclustered
    16-file layout sums to ~16x), and file z-ranges are disjoint
    (repartitionByRange produced real range partitions)."""
    path = str(tmp_path / "zordered")
    L.write_zordered(events, path, n_files=16)
    x = F.expr(L.X_SQL["spark"])
    y = F.expr(L.Y_SQL)

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) > 4
    spans, areas = [], []
    gx0, gx1, gy0, gy1 = None, None, None, None
    for f in files:
        d = (
            spark.read.parquet(f)
            .select(x.alias("x"), y.alias("y"), "z")
            .agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y"),
                F.min("z"), F.max("z"),
            )
            .collect()[0]
        )
        x0, x1, y0, y1, z0, z1 = d
        if x0 is None:
            continue
        spans.append((z0, z1))
        areas.append((x1 - x0 + 1) * (y1 - y0 + 1))
        gx0 = x0 if gx0 is None else min(gx0, x0)
        gx1 = x1 if gx1 is None else max(gx1, x1)
        gy0 = y0 if gy0 is None else min(gy0, y0)
        gy1 = y1 if gy1 is None else max(gy1, y1)
    global_area = (gx1 - gx0 + 1) * (gy1 - gy0 + 1)
    # clustered: sum of per-file boxes ~ O(1) x global; random: ~n_files x
    assert sum(areas) < 4 * global_area, (sum(areas), global_area)
    # real range partitioning: file z-ranges are pairwise disjoint
    spans.sort()
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0, (a0, a1, b0, b1)
    # parquet footers carry the stats scans prune on
    meta = pq.ParquetFile(files[0]).metadata
    assert meta.row_group(0).column(0).statistics is not None
