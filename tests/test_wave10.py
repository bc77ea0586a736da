"""Wave-10 operators: Fellegi-Sunter linkage weights (sorted-
neighborhood blocking), TextRank keywords, HDR-style mergeable quantile
sketch, Flesch readability bands. Oracle equality is covered by
tools/check_oracle.py; these tests pin the BEHAVIORAL properties the
hash-match alone cannot express."""

import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

from nerpii_spark.operators.link import (
    SNM_WINDOW,
    fellegi_sunter_weights,
)
from nerpii_spark.operators.sketch import hdr_quantiles
from nerpii_spark.operators.textstats import readability_bands, textrank_topk


def _mentions(spark, rows):
    """rows: (entity_type, mention)."""
    return spark.createDataFrame(rows, "entity_type string, mention string")


# ---------------------------------------------------------------------------
# fellegi_sunter_weights
# ---------------------------------------------------------------------------


def test_fs_hand_computed(spark):
    # block 'smith' sorted: [ann smith, ann t. smith, bob smith];
    # pairs (w=12): (ann, ann t.) match, (ann, bob) unmatch,
    # (ann t., bob) unmatch. block 'jones': [cara jones] -> no pairs.
    rows = [
        ("PERSON", "Ann Smith"),
        ("PERSON", "ann smith"),  # caps variant collapses pre-pairing
        ("PERSON", "Ann T. Smith"),
        ("PERSON", "Bob Smith"),
        ("PERSON", "Cara Jones"),
        ("ORGANIZATION", "Ann Smith"),  # wrong type: ignored
    ]
    out = {
        r["feature"]: r
        for r in fellegi_sunter_weights(_mentions(spark, rows)).collect()
    }
    assert set(out) == {"f_first", "f_pre3", "f_ntok", "f_lev2"}
    for r in out.values():
        assert (r["n_match"], r["n_unmatch"]) == (1, 2)
    # the match pair is a middle-initial variant: first tokens agree,
    # token counts differ, levenshtein('ann smith','ann t. smith') = 3
    assert out["f_first"]["m_ppm"] == 1_000_000
    assert out["f_first"]["u_ppm"] == 0
    assert out["f_ntok"]["agree_match"] == 0 and out["f_ntok"]["m_ppm"] == 0
    assert out["f_lev2"]["agree_match"] == 0
    # 'ann t. smith' vs 'bob smith' and 'ann smith' vs 'bob smith'
    # disagree on every feature except token count (one pair agrees)
    assert out["f_ntok"]["agree_unmatch"] == 1
    assert out["f_ntok"]["u_ppm"] == 500_000


def test_fs_empty_class_sentinel(spark):
    # one lone surface per block -> zero pairs in both classes -> the
    # aggregation is empty (no feature rows), never a division error
    rows = [("PERSON", "Ann Smith"), ("PERSON", "Bob Jones")]
    assert fellegi_sunter_weights(_mentions(spark, rows)).count() == 0


def test_fs_pair_bound_on_corpus(spark):
    """Pair count is <= window * n_surfaces BY CONSTRUCTION (the
    sorted-neighborhood linearity claim) on the real sf0.001 corpus."""
    import __spark_entry__ as E

    m = E._pipeline(spark, SF)["mentions"]
    surfaces = (
        m.where(F.col("entity_type") == "PERSON")
        .select(F.expr("lower(regexp_replace(trim(mention), '\\\\s+', ' '))"))
        .distinct()
        .count()
    )
    out = fellegi_sunter_weights(m).collect()
    n_pairs = out[0]["n_match"] + out[0]["n_unmatch"]
    assert 0 < n_pairs <= SNM_WINDOW * surfaces
    # and every feature row sees the same pair base
    assert len({r["n_match"] + r["n_unmatch"] for r in out}) == 1


# ---------------------------------------------------------------------------
# textrank_topk
# ---------------------------------------------------------------------------


def test_textrank_shape_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = textrank_topk(docs, k=10).collect()
    assert len(a) == 10
    assert [r["rk"] for r in a] == list(range(1, 11))
    # ranks are positive and sorted under the deterministic order
    assert all(r["rank_e12"] > 0 for r in a)
    pairs = [(r["rank_e12"], r["word"]) for r in a]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
    b = textrank_topk(docs, k=10).collect()
    assert a == b


def test_textrank_hub_word_wins(spark):
    # 'hub' cooccurs with every other word; TextRank must rank it first
    docs = spark.createDataFrame(
        [("hub aa", ), ("hub bb", ), ("hub cc", ), ("aa bb", )] * 3,
        "text string",
    )
    top = textrank_topk(docs, k=4, min_pair=1).collect()
    assert top[0]["word"] == "hub"


# ---------------------------------------------------------------------------
# hdr_quantiles
# ---------------------------------------------------------------------------


def test_hdr_bands_contain_exact_quantiles(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    vals = sorted(
        r[0]
        for r in li.select(
            F.expr("cast(round(l_extendedprice * 100) as bigint)")
        ).collect()
    )
    n = len(vals)
    out = hdr_quantiles(li, "cast(round(l_extendedprice * 100) as bigint)")
    for r in out.collect():
        exact = vals[-(-r["p"] * n // 100) - 1]  # ceil-rank element
        assert r["est_lo"] <= exact < r["est_hi"]
        # <= 12.5% relative band width (the 3-bit mantissa guarantee)
        assert (r["est_hi"] - r["est_lo"]) * 8 <= r["est_lo"] + 7
        assert r["n"] == n


def test_hdr_sketch_merges_by_addition(spark):
    """Sharded sketches folded by adding bucket counts equal the
    one-shot sketch — the mergeability property that makes this a
    sketch rather than a histogram of a single partition's values."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    expr = "cast(round(l_extendedprice * 100) as bigint)"
    whole = {
        (r["p"]): (r["bucket"], r["cum_n"], r["n"])
        for r in hdr_quantiles(li, expr).collect()
    }
    sharded = hdr_quantiles(
        li.where("l_orderkey % 2 = 0").unionAll(
            li.where("l_orderkey % 2 != 0")
        ),
        expr,
    )
    assert {
        (r["p"]): (r["bucket"], r["cum_n"], r["n"])
        for r in sharded.collect()
    } == whole


# ---------------------------------------------------------------------------
# readability_bands
# ---------------------------------------------------------------------------


def _score_m(text: str) -> int:
    w = len(text.split(" "))
    s = max(text.count("."), 1)
    syl = len(re.findall(r"[aeiouy]+", text.lower()))
    return max(206835 - (1015 * w) // s - (84600 * syl) // w, 0)


def test_readability_hand_computed(spark):
    texts = [
        "The cat sat on the mat.",
        "Intercontinental organizations systematically disambiguate.",
        "go. go. go.",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["band"]: (r["n_docs"], r["sum_words"], r["sum_sentences"],
                    r["sum_syllables"])
        for r in readability_bands(docs).collect()
    }
    import collections

    exp = collections.defaultdict(lambda: [0, 0, 0, 0])
    for t in texts:
        b = _score_m(t) // 10000
        e = exp[b]
        e[0] += 1
        e[1] += len(t.split(" "))
        e[2] += max(t.count("."), 1)
        e[3] += len(re.findall(r"[aeiouy]+", t.lower()))
    assert got == {b: tuple(v) for b, v in exp.items()}
    # the polysyllabic doc must land in a strictly lower band
    assert _score_m(texts[1]) < _score_m(texts[0])


# ---------------------------------------------------------------------------
# frequent_itemsets
# ---------------------------------------------------------------------------


def test_itemsets_hand_computed(spark):
    # 5 hosts; {x,y} co-hosted on 4, {x,y,z} on 3, {w} on 2.
    # floor = max(3, rows div 1000) = 3.
    rows = []
    for h in ("h1", "h2", "h3"):
        rows += [(h, "x"), (h, "y"), (h, "z")]
    rows += [("h4", "x"), ("h4", "y"), ("h4", "w"), ("h5", "w")]
    from nerpii_spark.operators.extract import frequent_itemsets

    mentions = spark.createDataFrame(
        [(i, "ORGANIZATION", it) for i, (h, it) in enumerate(rows)],
        "doc_id long, entity_type string, mention string",
    )
    pages = spark.createDataFrame(
        [(i, f"https://{h}.example/p") for i, (h, it) in enumerate(rows)],
        "doc_id long, url string",
    )
    got = {
        (r["k"], r["items"]): r["support"]
        for r in frequent_itemsets(mentions, pages).collect()
    }
    assert got == {
        (1, "x"): 4, (1, "y"): 4, (1, "z"): 3,
        (2, "x|y"): 4, (2, "x|z"): 3, (2, "y|z"): 3,
        (3, "x|y|z"): 3,
    }
    # 'w' (support 2) is below the floor everywhere; no pair with it


def test_itemsets_apriori_prune_blocks_triad(spark):
    # {a,b} and {b,c} frequent but {a,c} never co-hosted >= floor:
    # the (a,c) semi-join must prune the a|b|c candidate even though
    # a,b,c are all L1-frequent and a|b, b|c are L2-frequent.
    rows = []
    for h in ("h1", "h2", "h3"):
        rows += [(h, "a"), (h, "b")]
    for h in ("h4", "h5", "h6"):
        rows += [(h, "b"), (h, "c")]
    rows += [("h7", "a"), ("h7", "c"), ("h8", "a"), ("h8", "c")]
    from nerpii_spark.operators.extract import frequent_itemsets

    mentions = spark.createDataFrame(
        [(i, "LOCATION", it) for i, (h, it) in enumerate(rows)],
        "doc_id long, entity_type string, mention string",
    )
    pages = spark.createDataFrame(
        [(i, f"https://{h}.example/p") for i, (h, it) in enumerate(rows)],
        "doc_id long, url string",
    )
    got = {(r["k"], r["items"]) for r in
           frequent_itemsets(mentions, pages).collect()}
    assert (2, "a|b") in got and (2, "b|c") in got
    assert (2, "a|c") not in got  # support 2 < floor 3
    assert all(k != 3 for k, _ in got)


def test_itemsets_sf001_consistency(spark):
    """On the real corpus every k=2/k=3 set's support is <= the min
    support of its subsets (the Apriori anti-monotone invariant)."""
    import __spark_entry__ as E

    out = E.queries()["q_itemsets"](spark, SF).collect()
    sup = {r["items"]: r["support"] for r in out}
    for r in out:
        parts = r["items"].split("|")
        if len(parts) >= 2:
            for p in parts:
                assert p in sup and r["support"] <= sup[p]
        if len(parts) == 3:
            a, b, c = parts
            for pair in (f"{a}|{b}", f"{b}|{c}", f"{a}|{c}"):
                assert pair in sup and r["support"] <= sup[pair]


# ---------------------------------------------------------------------------
# luby_mis
# ---------------------------------------------------------------------------


def test_mis_wave_independence_and_partition(spark):
    """On the real sf0.001 host graph: (1) no two hosts sharing a wave
    are adjacent — each wave is an independent set of the residual
    graph (local minima, so independent but not necessarily maximal);
    (2) waves partition the linked-host set; (3) re-running yields the
    identical assignment — determinism of the strhash tie-broken rule."""
    import __spark_entry__ as E
    from nerpii_spark.operators.webgraph import luby_mis, sym_host_edges

    pages = E._pipeline(spark, SF)["pages"]
    edges = {
        (r["node"], r["nbr"]) for r in sym_host_edges(pages).collect()
    }
    hosts = {u for u, _ in edges}
    out = luby_mis(pages).collect()
    wave = {r["host"]: r["wave"] for r in out}
    assert set(wave) == hosts  # partition of the linked hosts
    assert all(w == -1 or w >= 1 for w in wave.values())
    # independence WITHIN each resolved wave (the scheduling guarantee:
    # no two directly-linked hosts fetch in the same wave)
    for u, v in edges:
        if wave[u] > 0 and wave[u] == wave[v]:
            raise AssertionError(f"adjacent {u},{v} share wave {wave[u]}")
    # the fresh-per-round rehash should clear nearly everything in 8
    # rounds on a bounded-degree graph; allow a small tail
    unresolved = sum(1 for w in wave.values() if w == -1)
    assert unresolved <= max(2, len(hosts) // 20)
    # determinism
    assert {(r["host"], r["wave"]) for r in luby_mis(pages).collect()} == {
        (r["host"], r["wave"]) for r in out
    }


def test_mis_hand_graph(spark):
    """Path a-b-c: waves are independent sets (b never shares a wave
    with a or c) and, with at least one node resolving per round (the
    global minimum is always a local minimum), all 3 resolve in <=3
    rounds — no -1 tail."""
    from nerpii_spark.operators.webgraph import luby_mis

    html = '<a href="https://%s/">x</a>'
    rows = [
        (1, "https://a.example/p", (html % "b.example").encode()),
        (2, "https://b.example/p", (html % "c.example").encode()),
    ]
    pages = spark.createDataFrame(
        rows, "doc_id long, url string, html binary"
    )
    wave = {r["host"]: r["wave"] for r in luby_mis(pages).collect()}
    assert set(wave) == {"a.example", "b.example", "c.example"}
    assert all(w >= 1 for w in wave.values())
    assert wave["b.example"] != wave["a.example"]
    assert wave["b.example"] != wave["c.example"]
