"""Training-data extras: dedup recall, ANN recall, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from nerpii_spark.operators import dedup as D
from nerpii_spark.operators import multimodal as MM
from nerpii_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dup_docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.createOrReplaceTempView("x_documents")
    return spark.sql(D.dup_docs_sql("spark", doc_rel="x_documents")).cache()


def test_exact_dedup_survivors(dup_docs):
    groups = D.exact_dedup_groups(dup_docs).collect()
    n_docs = dup_docs.count()
    dup_groups = [g for g in groups if g["n_copies"] > 1]
    # every planted exact copy collapses onto its base doc (min id)
    assert all(g["keep_id"] < D.DUP_EXACT_OFF for g in dup_groups)
    assert sum(g["n_copies"] for g in groups) == n_docs


def test_minhash_finds_planted_pairs(dup_docs):
    got = {(r["id_a"], r["id_b"]) for r in D.minhash_dup_pairs(dup_docs).collect()}
    base_ids = [
        r["doc_id"] for r in dup_docs.where(
            F.col("doc_id") < D.DUP_EXACT_OFF
        ).collect()
    ]
    for d in base_ids:
        if d % 10 == 0:
            assert (d, d + D.DUP_EXACT_OFF) in got
        if d % 7 == 3:
            assert (d, d + D.DUP_NEAR_OFF) in got


def test_ngram_hot_shingle_guard(spark):
    """A shingle present in every doc must NOT produce O(n^2) candidates:
    the df cap drops it from candidate generation, and dissimilar docs
    yield no pairs. Counts stay exact for real pairs (verified from the
    full shingle sets, not the capped ones)."""
    n = 40
    rows = [(i, f"u{i}a u{i}b u{i}c u{i}d common boiler plate") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # every doc shares the hot shingles; with max_df < n they generate 0
    # candidates, and no doc-specific shingle is shared
    cand = D.ngram_candidate_pairs(docs, max_df=8)
    assert cand.count() == 0
    assert D.ngram_jaccard_pairs(docs, max_df=8).count() == 0
    # two genuine near-dups are still found exactly through their shared
    # doc-specific shingles, with counts from the FULL sets
    rows.append((1000, rows[0][1] + " tail"))
    docs2 = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = D.ngram_jaccard_pairs(docs2, max_df=8).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(0, 1000)]
    # full sets: doc0 has 5 shingles (7 words), doc1000 has 6, sharing all
    # 5 of doc0's — including the hot one the candidate stage dropped
    assert got[0].n_inter == 5 and got[0].n_union == 6


def test_simhash_python_spark_parity(spark, dup_docs):
    sigs = {r["doc_id"]: r["simhash"]
            for r in D.simhash_signatures(dup_docs.limit(30)).collect()}
    rows = {r["doc_id"]: r["text"] for r in dup_docs.limit(30).collect()}
    for d, text in rows.items():
        ws = text.lower().split(" ")
        n = max(len(ws) - 2, 1)
        shingles = list(dict.fromkeys(
            " ".join([ws[i], ws[min(i + 1, len(ws) - 1)],
                      ws[min(i + 2, len(ws) - 1)]])
            for i in range(n)
        ))
        assert sigs[d] == D.simhash_py(shingles)


def test_lsh_topk_recall(spark):
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    brute = SIM.cosine_topk(embs, "vec_id < 16", k=3).collect()
    ann = SIM.hyperplane_lsh_topk(embs, "vec_id < 16", k=3).collect()
    b = {(r["query_id"], r["neighbor_id"]) for r in brute}
    a = {(r["query_id"], r["neighbor_id"]) for r in ann}
    assert len(a & b) / len(b) >= 0.5  # noisy embeddings: modest-tau regime


def test_ivf_topk_recall(spark):
    """IVF coarse-quantized ANN: recall vs brute force at default
    n_probe; near-exact when probing (almost) all cells."""
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    b = {(r["query_id"], r["neighbor_id"])
         for r in SIM.cosine_topk(embs, "vec_id < 16", k=3).collect()}
    a = {(r["query_id"], r["neighbor_id"])
         for r in SIM.ivf_topk(embs, "vec_id < 16", k=3).collect()}
    assert len(a & b) / len(b) >= 0.7  # random (clusterless) vectors
    full = {(r["query_id"], r["neighbor_id"])
            for r in SIM.ivf_topk(embs, "vec_id < 16", k=3,
                                  n_probe=16).collect()}
    assert full == b  # probing every cell degenerates to exact search


def test_embed_dup_pairs_lsh_matches_brute(spark):
    """The verified (driver) path is LSH band-join + exact cosine verify;
    precision is exact by construction, so equality with brute force
    certifies recall = 1.0 on the planted dup-emb corpus."""
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    embs.createOrReplaceTempView("e_embeddings")
    dup = spark.sql(SIM.dup_embs_sql("spark", emb_rel="e_embeddings"))
    lsh_df = SIM.embedding_dup_pairs(dup, tau=SIM.DUP_TAU, method="lsh")
    plan = lsh_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    lsh = {tuple(r) for r in lsh_df.collect()}
    brute = {tuple(r) for r in SIM.embedding_dup_pairs(
        dup, tau=SIM.DUP_TAU, method="brute").collect()}
    assert lsh == brute
    assert lsh  # planted pairs exist even at sf0.001
    # every planted (orig, copy) pair is found
    planted = {r["vec_id"] for r in embs.collect() if r["vec_id"] % 5 == 2}
    assert {(v, v + SIM.DUP_VEC_OFF) for v in planted} <= {
        (a, b) for a, b, _ in lsh
    }


def test_media_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"not-an-image", "image")


def test_media_feature_plumbing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.createOrReplaceTempView("m_documents")
    media = spark.sql(MM.media_sql("spark", doc_rel="m_documents"))
    feats = MM.extract_features(media)
    assert feats.schema.simpleString() == (
        "struct<doc_id:bigint,kind:string,n_bytes:int,"
        "head_hash:bigint,n_frames:int>"
    )
    rows = feats.collect()
    assert len(rows) == docs.count()
    by_kind = {r["kind"] for r in rows}
    assert by_kind == {"image", "audio", "video"}
    assert all(r["n_bytes"] <= 64 for r in rows)
    assert all((r["n_frames"] > 0) == (r["kind"] == "video") for r in rows)
    # deterministic across runs
    again = MM.extract_features(media).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_frame_offsets_spacing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.createOrReplaceTempView("f_documents")
    media = spark.sql(MM.media_sql("spark", doc_rel="f_documents"))
    offs = MM.frame_sample_offsets(media).groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("offset_ms").alias("mx")
    )
    meta = media.where(F.col("kind") == "video").select(
        "doc_id", F.col("meta.duration_ms").alias("d")
    )
    joined = offs.join(meta, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["mx"] < r["d"]
        assert r["n"] == (r["d"] - 1) // 40 + 1


def test_repetition_stats_exact(spark):
    """Hand-computable top-bigram fractions; <2-word docs excluded."""
    from nerpii_spark.operators import textstats as TS

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),       # bigrams: ab ba ab ba -> top 2/4
            (2, "x x x x"),         # xx xx xx -> top 3/3
            (3, "one"),             # no bigrams -> excluded
            (4, "p q r"),           # pq qr -> top 1/2
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in TS.repetition_stats(df).collect()}
    assert set(got) == {1, 2, 4}
    assert (got[1]["n_bigrams"], got[1]["top_bigram_n"]) == (4, 2)
    assert got[1]["top_frac_e6"] == 500000
    assert (got[2]["n_bigrams"], got[2]["top_bigram_n"]) == (3, 3)
    assert got[2]["top_frac_e6"] == 1000000
    assert got[4]["top_frac_e6"] == 500000


def test_vocab_topk_rank_and_ties(spark):
    """Per-lang counts with deterministic token-asc tie-break."""
    from nerpii_spark.operators import textstats as TS

    df = spark.createDataFrame(
        [
            (1, "en", "b a b c a b"),
            (2, "en", "c a"),
            (3, "it", "z z y"),
        ],
        "doc_id bigint, lang string, text string",
    )
    got = [
        (r["lang"], r["token"], r["n"], r["rk"])
        for r in TS.vocab_topk(df, k=2).orderBy("lang", "rk").collect()
    ]
    # en: a=3 b=3 c=2 -> tie at n=3 broken token-asc
    assert got == [
        ("en", "a", 3, 1),
        ("en", "b", 3, 2),
        ("it", "z", 2, 1),
        ("it", "y", 1, 2),
    ]


def test_decontaminate_flags_copies_only(spark):
    """Planted copies of eval docs are contaminated; unrelated training
    docs are not; eval originals never appear in the output."""
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id bigint, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),   # exact copy
            (2, "alpha beta gamma delta epsilon zeta theta"), # near copy
            (3, "totally unrelated words about something else"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in D.decontaminate(train, ev).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["contaminated"] and got[1]["n_matched"] == got[1]["n_shingles"]
    assert got[2]["contaminated"]       # 4 of 5 shingles shared
    assert not got[3]["contaminated"] and got[3]["n_matched"] == 0
    # the plan broadcasts the eval side: no shuffle of train by shingle key
    plan = (
        D.decontaminate(train, ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_gopher_keep_flag_edges(spark):
    """Quality gates reject short docs and degenerate repetition, keep
    normal prose-like text."""
    from nerpii_spark.operators import textstats as TS

    normal = " ".join(f"word{i % 37} plus some more tokens" for i in range(20))
    repeated = " ".join(["the"] * 200)
    short = "too short"
    longword = ("x" * 2000 + " ") * 60
    df = spark.createDataFrame(
        [(1, normal), (2, repeated), (3, short), (4, longword)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in TS.gopher_quality(df).collect()}
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False      # uniq_ratio ~ 1/200
    assert got[3]["keep"] is False      # n_words < 50
    assert got[4]["keep"] is False      # max_word_len > 1000
