"""Wave-23: fused multi-frame extraction with cross-talk
certification. The corpus-wide zero-false-positive property is the
driver oracle's hash gate; here each grammar is run against every
OTHER family's full sf0.001 corpus as an explicit negative control."""

import pytest

from nerpii_spark.operators.extract import (
    date_facts,
    hearst_hypernyms,
    numeric_facts,
    polarity_triples,
    quote_attribution,
    voice_triples,
)
import nerpii_spark.sources.pages as P

SF = "/root/testdata/sf0.001"

FAMILIES = {
    "hearst": (P.hearst_sql, hearst_hypernyms),
    "quote": (P.quote_sql, quote_attribution),
    "metric": (P.metric_sql, numeric_facts),
    "timex": (P.timex_sql, date_facts),
    "negation": (P.negation_sql, polarity_triples),
    "voice": (P.voice_sql, voice_triples),
}


def test_every_grammar_silent_on_other_families(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.createOrReplaceTempView("documents_w23")
    corpora = {
        name: spark.sql(gen("spark", doc_rel="documents_w23"))
        .localCheckpoint(eager=True)
        for name, (gen, _) in FAMILIES.items()
    }
    for target, (_, extractor) in FAMILIES.items():
        for source, corpus in corpora.items():
            n = extractor(corpus).count()
            if source == target:
                assert n > 0, (target, source)
            else:
                assert n == 0, (
                    f"{target} grammar fired {n}x on the {source} corpus"
                )


def test_mixed_corpus_families_partition_docs(spark):
    import __spark_entry__ as E

    df = E.q_extract_mixed(spark, SF)
    rows = df.select("doc_id", "family").distinct().collect()
    # every doc contributes to exactly one family, determined by doc_id % 6
    expect = dict(enumerate(P.MIXED_FAMILIES))
    for r in rows:
        assert r.family == expect[r.doc_id % 6], (r.doc_id, r.family)
    assert {r.family for r in rows} == set(P.MIXED_FAMILIES)


# --- Hilbert layout (wave-23 second half) -----------------------------------

from nerpii_spark.operators.layout import (
    hilbert_py,
    hilbert_sql,
    hilbert_stats,
    zorder_stats,
)


def test_hilbert_lut_matches_reference_loop_exhaustively():
    # the classic xy2d loop, independent of the LUT derivation
    def xy2d(order, x, y):
        d = 0
        s = 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s >>= 1
        return d

    for x in range(32):
        for y in range(32):
            assert hilbert_py(x, y, bits=5) == xy2d(5, x, y)
    # unit-step adjacency: consecutive d are grid neighbours
    inv = {hilbert_py(x, y, bits=5): (x, y)
           for x in range(32) for y in range(32)}
    for d in range(1, 1024):
        (x0, y0), (x1, y1) = inv[d - 1], inv[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d


def test_hilbert_spark_expression_matches_mirror(spark):
    import random

    rng = random.Random(11)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16))
           for _ in range(300)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    rows = df.selectExpr(
        "x", "y", hilbert_sql("spark", "x", "y") + " as h"
    ).collect()
    for r in rows:
        assert r.h == hilbert_py(r.x, r.y), (r.x, r.y)


def test_hilbert_locality_beats_zorder(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    def avg_halfperim(rows):
        ps = [(r.max_x - r.min_x) + (r.max_y - r.min_y) for r in rows]
        return sum(ps) / len(ps)

    hz = avg_halfperim(hilbert_stats(ev).collect())
    zz = avg_halfperim(zorder_stats(ev).collect())
    # Hilbert's unit-step property: bucket bounding boxes no looser
    # than Morton's on the same dimensions (strictly tighter on this
    # data; allow equality to keep the gate robust)
    assert hz <= zz, (hz, zz)
