"""Wave-24: HLL set-algebra overlap. The driver oracle certifies the
register merge bit-for-bit; this gates what a replay cannot — that the
union / intersection / Jaccard estimates track the exact values within
the sketch's error budget (m=64 -> ~13% stderr on cardinalities;
inclusion-exclusion compounds that on intersections)."""

from pyspark.sql import functions as F

from nerpii_spark.functions.hashing import sql_strhash
from nerpii_spark.operators.sketch import hll_overlap
import nerpii_spark.sources.pages as P


def test_hll_overlap_accuracy(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs.createOrReplaceTempView("hllov_documents")
    pg = spark.sql(P.pages_sql("spark", doc_rel="hllov_documents")).cache()
    est = {
        (r.lang_a, r.lang_b): r for r in hll_overlap(pg).collect()
    }
    toks = (
        pg.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select("lang", F.expr(sql_strhash("tok")).alias("h"))
        .distinct()
        .cache()
    )
    langs = sorted(r.lang for r in toks.select("lang").distinct().collect())
    sets = {
        lang: {r.h for r in toks.where(F.col("lang") == lang).collect()}
        for lang in langs
    }
    assert len(est) == len(langs) * (len(langs) - 1) // 2
    for i, la in enumerate(langs):
        for lb in langs[i + 1:]:
            r = est[(la, lb)]
            xu = len(sets[la] | sets[lb])
            xi = len(sets[la] & sets[lb])
            assert abs(r.est_union - xu) <= 0.35 * xu, (la, lb, r, xu)
            # inclusion-exclusion compounds three ~13%-stderr terms:
            # absolute intersection error scales with the UNION size
            assert abs(r.est_inter - xi) <= 0.45 * xu, (la, lb, r, xi, xu)
            assert abs(r.jaccard_e6 / 1e6 - xi / xu) <= 0.25, (la, lb)


def test_hll_overlap_union_bounds(spark):
    # union estimate >= each side's estimate (register max dominates),
    # and intersection <= min side estimate after clamping
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("hllov_docs2")
    pg = spark.sql(P.pages_sql("spark", doc_rel="hllov_docs2"))
    for r in hll_overlap(pg).collect():
        assert r.est_union >= max(r.est_a, r.est_b)
        assert 0 <= r.est_inter <= min(r.est_a, r.est_b)
        assert 0 <= r.jaccard_e6 <= 1_000_000
