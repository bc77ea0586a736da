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
