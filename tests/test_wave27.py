"""Wave-27: Kneser-Ney bigram LM + Soundex phonetic blocking.

The KN gate hand-computes the interpolated-KN arithmetic on a tiny
corpus and checks the discount-mass identity (probabilities over the
full vocabulary sum to 1 up to integer truncation). The soundex gate
pins the Python mirror == Spark's soundex() expression over the FULL
gazetteer surface space (base + ALL-CAPS + initials) and 34 probed
edge cases — the mirror is what inlines oracle truth, so drift here
would silently break the q_soundex_blocks oracle."""

from pyspark.sql import functions as F

from nerpii_spark.functions import gazetteers as G
from nerpii_spark.functions.text import spark_soundex
from nerpii_spark.operators import link as L
from nerpii_spark.operators.textstats import kn_bigram_topk

SF = "/root/testdata/sf0.001"

EDGE_CASES = {
    "Ashcraft": "A261", "Tymczak": "T522", "Pfister": "P236",
    "Honeyman": "H555", "Robert": "R163", "Rupert": "R163",
    "Jackson": "J250", "VanDeusen": "V532", "Gutierrez": "G362",
    "Washington": "W252", "Lee": "L000", "O'Brien": "O165",
    "McDonald": "M235", "Smith": "S530", "Smythe": "S530",
    "Schmidt": "S530", "Aaa": "A000", "Hhh": "H000", "Wu": "W000",
    "X": "X000", "As-sa": "A220", "Assa": "A200", "Hah": "H000",
    "Hwsa": "H200", "123": "123", "a": "A000", "Ng": "N200",
    "Zzyzx": "Z200", "D'Arcy": "D620", "Mueller-Lyer": "M464",
    "van der Berg": "V536", "O": "O000", "W": "W000",
    "Csikszentmihalyi": "C253",
}


def test_soundex_mirror_equals_spark_everywhere(spark):
    base = {
        t
        for n in (
            G.FIRST_NAMES + G.LAST_NAMES
            + G.IT_FIRST_NAMES + G.IT_LAST_NAMES
        )
        for t in n.split()
    }
    surfaces = sorted(
        base
        | {t.upper() for t in base}
        | {f"{chr(65 + i)}." for i in range(26)}
        | set(EDGE_CASES)
    )
    got = {
        r["n"]: r["s"]
        for r in spark.createDataFrame([(s,) for s in surfaces], "n string")
        .selectExpr("n", "soundex(n) as s")
        .collect()
    }
    for s in surfaces:
        assert spark_soundex(s) == got[s], s
    for s, want in EDGE_CASES.items():
        assert spark_soundex(s) == want, s


def test_phonetic_blocks_collapse_variants(spark):
    mentions = spark.createDataFrame(
        [
            ("PERSON", "Alice Smith"),
            ("PERSON", "ALICE Smythe"),
            ("PERSON", "Bob Q. Schmidt"),
            ("ORGANIZATION", "Smith Corp"),  # non-PERSON ignored
        ],
        "entity_type string, mention string",
    )
    rows = {r["block_key"]: r for r in L.phonetic_blocks(mentions).collect()}
    # Smith / Smythe / Schmidt all S530 — the variant-collapsing block
    assert rows["S530"]["n_surfaces"] == 3
    assert rows["S530"]["n_mentions"] == 3
    assert rows["S530"]["min_surface"] == "Schmidt"
    assert rows["S530"]["max_surface"] == "Smythe"
    # Alice vs ALICE: distinct surfaces, same block
    assert rows["A420"]["n_surfaces"] == 2
    # the middle initial blocks alone
    assert rows["Q000"]["n_mentions"] == 1
    assert set(rows) == {"A420", "B100", "Q000", "S530"}


def test_kn_bigram_hand_golden(spark):
    docs = spark.createDataFrame([("a b a b a c",)], "text string")
    rows = {
        (r["w1"], r["w2"]): r for r in kn_bigram_topk(docs, k=10).collect()
    }
    # c12: ab=2 ba=2 ac=1; c1: a=3 b=2; N1+(a.)=2 N1+(b.)=1
    # N1+(.a)=1 N1+(.b)=1 N1+(.c)=1; n_types=3 -> pcont_e6=333333 each
    ab = rows[("a", "b")]
    assert (ab["c12"], ab["c1"], ab["n1p_right"]) == (2, 3, 2)
    assert ab["pcont_e6"] == 333333
    # term1 = 1e6*125 // 300 = 416666; term2 = 75*2*333333 // 300 = 166666
    assert ab["pkn_e6"] == 416666 + 166666
    ac = rows[("a", "c")]
    assert ac["pkn_e6"] == 1_000_000 * 25 // 300 + 166666
    ba = rows[("b", "a")]
    assert ba["pkn_e6"] == 1_000_000 * 125 // 200 + (
        75 * 1 * 333333
    ) // 200
    # discount-mass identity: sum over the FULL vocab for w1='a' is 1
    # up to integer truncation: observed (b, c) + unseen a's backoff
    # lambda(a)*pcont(a) = (75*2 // (100*3) in exact rational) * 1/3
    unseen_a = (75 * 2 * 333333) // 300  # same backoff weight, pcont(a)
    total = ab["pkn_e6"] + ac["pkn_e6"] + unseen_a
    assert 1_000_000 - 10 <= total <= 1_000_000


def test_kn_bigram_corpus_ranking_sane(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = kn_bigram_topk(docs).collect()
    assert len(rows) == 20
    probs = [r["pkn_e6"] for r in rows]
    assert probs == sorted(probs, reverse=True)
    assert all(0 < p <= 1_000_000 for p in probs)
    assert [r["rank"] for r in rows] == list(range(1, 21))
