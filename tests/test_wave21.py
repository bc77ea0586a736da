"""Wave-21: KG pattern query, distributed skyline, TPC-H Q2 argmin
shape. The skyline's suffix-maxima algebra is subtle, so it gets a
randomized brute-force cross-validation on top of the corpus oracle."""

import random

from pyspark.sql import functions as F

from nerpii_spark.operators.extract import kg_pattern_residence
from nerpii_spark.operators.webgraph import host_skyline


def _brute_skyline(points):
    out = []
    for a in points:
        if not any(
            b[0] >= a[0] and b[1] >= a[1] and (b[0] > a[0] or b[1] > a[1])
            for b in points
        ):
            out.append(a)
    return sorted(out)


def _run_skyline(spark, pts, n_buckets=4):
    # feed host_skyline synthetic per-host metrics by constructing a
    # pages frame with the right (host, lang) multiset: n_pages rows,
    # n_langs distinct langs (n_langs <= n_pages by construction)
    rows = []
    for i, (x, y) in enumerate(pts):
        for j in range(x):
            rows.append((f"https://h{i}.example/p/{j}", f"l{min(j, y - 1)}"))
    pages = spark.createDataFrame(rows, "url string, lang string")
    got = sorted(
        (r.n_pages, r.n_langs)
        for r in host_skyline(pages, n_buckets=n_buckets).collect()
    )
    return got


def test_skyline_randomized_vs_brute_force(spark):
    rng = random.Random(42)
    for trial in range(4):
        pts = [
            (rng.randint(1, 12), rng.randint(1, 4)) for _ in range(30)
        ]
        # clamp langs <= pages (construction constraint)
        pts = [(x, min(y, x)) for x, y in pts]
        got = _run_skyline(spark, pts)
        exp = sorted(_brute_skyline(pts))
        assert got == sorted(exp), (trial, got, exp)


def test_skyline_duplicates_cokept_and_boundaries(spark):
    # duplicate optimal points are all kept; a point equal in y to a
    # higher-x point is dominated; single point trivially kept
    pts = [(5, 2), (5, 2), (3, 2), (1, 1)]
    got = _run_skyline(spark, pts)
    assert got == [(5, 2), (5, 2)]
    assert _run_skyline(spark, [(4, 1)]) == [(4, 1)]


def test_kg_pattern_optional_and_consistency(spark):
    t = spark.createDataFrame(
        [
            ("ada", "works_at", "acme"),
            ("acme", "located_in", "rome"),
            ("ada", "lives_in", "rome"),       # consistent
            ("bob", "works_at", "acme"),
            ("bob", "lives_in", "oslo"),       # inconsistent
            ("eve", "works_at", "acme"),       # OPTIONAL leg NULL
            ("zed", "works_at", "ghost"),      # employer city unknown
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r.person): (r.work_city, r.home_city, r.consistent)
        for r in kg_pattern_residence(t).collect()
    }
    assert got["ada"] == ("rome", "rome", 1)
    assert got["bob"] == ("rome", "oslo", 0)
    assert got["eve"] == ("rome", None, 0)
    assert "zed" not in got  # inner join on the located_in leg


def test_tpch_minsupp_argmin_determinism(spark):
    import __spark_entry__ as E

    df = E.q_tpch_minsupp(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    # exactly one supplier per part, offers >= 1, cents positive
    assert len({r.partkey for r in rows}) == len(rows)
    assert all(r.n_offers >= 1 and r.min_price_cents > 0 for r in rows)
