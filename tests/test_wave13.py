"""Wave-13 operators. Oracle equality runs in tools/check_oracle.py;
these tests pin what the hash-match cannot: the WARC byte reality
(arithmetic index == offsets of actually materialized record bytes,
parsed back by Content-Length walking on both the Python and the
Spark-mapInPandas path)."""

from datetime import datetime, timezone

from nerpii_spark.operators import warc as WARC

SF = "/root/testdata/sf0.001"


def _pages(spark):
    import __spark_entry__ as E

    return E._pipeline(spark, SF)["pages"]


# ---------------------------------------------------------------------------
# warc record arithmetic
# ---------------------------------------------------------------------------


def test_record_len_formula_matches_bytes():
    """HEADER_FIXED's closed form == len(actual record bytes), across
    url lengths, payload sizes crossing digit-count boundaries (9->10,
    99->100), and a non-ASCII payload (octet, not char, lengths)."""
    date = "2025-01-01T00:00:00Z"
    assert len(date) == WARC.DATE_LEN
    cases = [
        ("https://a.example/x", b"p" * 9),
        ("https://a.example/x", b"p" * 10),
        ("https://site123.example/en/page/42", b"q" * 99),
        ("https://site123.example/en/page/42", b"q" * 100),
        ("https://h.example/", "héllo wörld".encode("utf-8")),
        ("https://h.example/", b""),
    ]
    for url, payload in cases:
        rec = WARC.warc_record(url, date, payload)
        expected = (
            WARC.HEADER_FIXED
            + len(url.encode())
            + len(str(len(payload)))
            + len(payload)
        )
        assert len(rec) == expected, (url, len(payload))
        assert rec.startswith(b"WARC/1.0\r\n")
        assert rec.endswith(b"\r\n\r\n")


def test_parse_segment_bytes_round_trip():
    """Concatenated records parse back to exact (offset, url, payload) —
    including a payload that CONTAINS the header delimiter bytes, which
    only Content-Length framing (not delimiter scanning) survives."""
    date = "2025-01-01T00:00:00Z"
    recs = [
        ("https://a.example/1", b"alpha"),
        ("https://a.example/2", b"evil \r\n\r\n WARC/1.0 payload"),
        ("https://b.example/3", b"z" * 257),
    ]
    blob = b"".join(WARC.warc_record(u, date, p) for u, p in recs)
    parsed = WARC.parse_segment_bytes(blob)
    assert [(u, p) for _, u, p in parsed] == recs
    # offsets are the running sum of record lengths
    off = 0
    for (got_off, u, p), (url, payload) in zip(parsed, recs):
        assert got_off == off
        off += len(WARC.warc_record(url, date, payload))
    assert off == len(blob)


# ---------------------------------------------------------------------------
# index == bytes, end to end on the planted corpus
# ---------------------------------------------------------------------------


def test_cdx_index_matches_materialized_segments(spark):
    """cdx_index (pure arithmetic, no bytes) == offsets observed in the
    actually-built segment blobs, for every record in the sf0.001
    corpus; payload bytes round-trip identically to the html column."""
    pages = _pages(spark)
    idx = {
        r["doc_id"]: (r["segment"], r["rec_offset"], r["record_len"], r["url"])
        for r in WARC.cdx_index(pages).collect()
    }
    html = {
        r["doc_id"]: bytes(r["html"])
        for r in pages.select("doc_id", "html").collect()
    }
    url2doc = {u: d for d, (_, _, _, u) in idx.items()}
    assert len(url2doc) == len(idx)  # urls unique by construction

    segs = WARC.build_segments(pages).collect()
    n_parsed = 0
    for seg_row in segs:
        blob = bytes(seg_row["data"])
        for off, url, payload in WARC.parse_segment_bytes(blob):
            doc = url2doc[url]
            segment, rec_offset, record_len, _ = idx[doc]
            assert segment == seg_row["segment"]
            assert rec_offset == off
            assert payload == html[doc]
            n_parsed += 1
        # last record ends exactly at the blob end (record_len exact)
        last_doc = url2doc[WARC.parse_segment_bytes(blob)[-1][1]]
        assert idx[last_doc][1] + idx[last_doc][2] == len(blob)
    assert n_parsed == len(idx)


def test_parse_segments_spark_path(spark):
    """The mapInPandas binary parser agrees with cdx_index on every
    (segment, rec_offset, url) and payload length."""
    pages = _pages(spark)
    got = {
        (r["segment"], r["rec_offset"]): (r["url"], r["payload_len"])
        for r in WARC.parse_segments(WARC.build_segments(pages)).collect()
    }
    want = {
        (r["segment"], r["rec_offset"]): r["url"]
        for r in WARC.cdx_index(pages).collect()
    }
    assert set(got) == set(want)
    for k, (url, plen) in got.items():
        assert want[k] == url
        assert plen >= 0


def test_segment_assignment_stable_under_growth(spark):
    """Hash segmenting: a page's segment is a function of doc_id only —
    restricting the corpus to a prefix does not move any surviving
    page's segment (append-only crawls never reshuffle old segments)."""
    pages = _pages(spark)
    full = {
        r["doc_id"]: r["segment"]
        for r in WARC.cdx_index(pages).collect()
    }
    sub = {
        r["doc_id"]: r["segment"]
        for r in WARC.cdx_index(pages.where("doc_id < 30")).collect()
    }
    assert sub == {d: s for d, s in full.items() if d < 30}


def test_date_format_parity(spark):
    """Spark's DATE_FMT_SPARK and Python's DATE_FMT_PY emit identical
    20-char strings for the corpus epoch range (the fixed width
    HEADER_FIXED depends on)."""
    from pyspark.sql import functions as F

    from nerpii_spark.sources.pages import BASE_EPOCH

    rows = (
        spark.range(5)
        .select(
            F.date_format(
                F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id") * 86461),
                WARC.DATE_FMT_SPARK,
            ).alias("d"),
            "id",
        )
        .collect()
    )
    for r in rows:
        py = datetime.fromtimestamp(
            BASE_EPOCH + r["id"] * 86461, tz=timezone.utc
        ).strftime(WARC.DATE_FMT_PY)
        assert r["d"] == py
        assert len(py) == WARC.DATE_LEN


# ---------------------------------------------------------------------------
# fact_decay
# ---------------------------------------------------------------------------


def test_fact_decay_hand_golden(spark):
    """half_life=2, max_shift=4: ages 0..5 -> weights 16,16,8,8,4,4; the
    floor kicks in at age >= 8 (weight 1, never 0)."""
    from nerpii_spark.operators.extract import fact_decay

    rows = [
        # (doc_id, subj, pred, obj): fact A asserted at ages 0, 3, 5
        (10, "a", "p", "x"),  # age 0  -> 16
        (7, "a", "p", "x"),  # age 3  -> 8
        (5, "a", "p", "x"),  # age 5  -> 4
        # fact B: one stale assertion past the floor (age 10 -> shift
        # capped at max_shift=4 -> weight 1)
        (0, "b", "p", "y"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, subj string, pred string, obj string")
    got = {
        (r["subj"], r["obj"]): (r["n_assertions"], r["latest_doc"], r["support_q40"])
        for r in fact_decay(df, half_life=2, max_shift=4).collect()
    }
    assert got == {("a", "x"): (3, 10, 28), ("b", "y"): (1, 0, 1)}


def test_fact_decay_fresh_unit(spark):
    """A single assertion at the corpus max is exactly one fresh unit
    (2^max_shift) regardless of half_life."""
    from nerpii_spark.operators.extract import fact_decay

    df = spark.createDataFrame(
        [(99, "s", "p", "o")], "doc_id bigint, subj string, pred string, obj string"
    )
    [r] = fact_decay(df, half_life=7, max_shift=40).collect()
    assert r["support_q40"] == 1 << 40


# ---------------------------------------------------------------------------
# winnowing minimizers
# ---------------------------------------------------------------------------


def _py_minimizers(text: str, w: int) -> set[int]:
    """Independent pure-Python winnowing mirror (strhash chain)."""
    from nerpii_spark.functions.hashing import M, strhash
    from nerpii_spark.operators.dedup import _GRAM_MUL_A

    ws = text.lower().split(" ")
    wh = [strhash(x) for x in ws]
    n = len(wh)
    ng = max(n - 2, 1)
    gh = [
        (
            wh[i] * _GRAM_MUL_A
            + wh[min(i + 1, n - 1)] * 31
            + wh[min(i + 2, n - 1)]
        )
        % M
        for i in range(ng)
    ]
    wins = max(ng - w + 1, 1)
    return {min(gh[i : i + w]) for i in range(wins)}


def test_minimizer_fingerprints_match_python_mirror(spark):
    from nerpii_spark.operators.dedup import (
        MINIMIZER_W,
        minimizer_fingerprints,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "a b",  # degenerate: fewer words than a gram
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got: dict[int, set[int]] = {}
    for r in minimizer_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got[i] == _py_minimizers(t, MINIMIZER_W), i


def test_winnowing_guarantee_shared_run(spark):
    """Any shared token run of >= w+2 grams forces a shared fingerprint
    (the Schleimer guarantee); disjoint docs share nothing."""
    from nerpii_spark.operators.dedup import (
        MINIMIZER_W,
        minimizer_overlap_pairs,
    )

    shared = " ".join(f"tok{i}" for i in range(MINIMIZER_W + 2 + 2))
    rows = [
        (1, "alpha beta " + shared + " gamma delta"),
        (2, shared + " omega psi chi phi upsilon"),
        (3, " ".join(f"other{i}" for i in range(30))),
        (4, " ".join(f"more{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minimizer_overlap_pairs(df, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_minimizer_sampling_density():
    """Winnowing selects ~2/(w+1) of gram positions — the compression
    that makes it cheaper than dense span hashing (bounds, not exact:
    distinct-min collapses can only reduce the count)."""
    from nerpii_spark.operators.dedup import MINIMIZER_W

    text = " ".join(f"w{(i * 7919) % 523}" for i in range(400))
    fps = _py_minimizers(text, MINIMIZER_W)
    n_grams = 400 - 2
    assert len(fps) <= n_grams * 3 // (MINIMIZER_W + 1)
    assert len(fps) >= n_grams // (MINIMIZER_W * 3)


# ---------------------------------------------------------------------------
# lang MinHash similarity matrix
# ---------------------------------------------------------------------------


def test_lang_minhash_identical_and_disjoint(spark):
    """Two langs with IDENTICAL shingle sets agree on all k mins
    (jaccard_est_ppm = 1e6); a lang with disjoint content agrees on
    none (token surfaces chosen with distinct 12-char prefixes so the
    frozen strhash cannot alias them)."""
    from nerpii_spark.operators.sketch import lang_minhash_matrix

    same = " ".join(f"alphatok{i:04d} " * 1 for i in range(20)).strip()
    other = " ".join(f"zuluword{i:04d}" for i in range(20))
    rows = [
        (1, "aa", same),
        (2, "bb", same),
        (3, "cc", other),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    got = {
        (r["lang_a"], r["lang_b"]): (r["n_agree"], r["jaccard_est_ppm"])
        for r in lang_minhash_matrix(df).collect()
    }
    assert got[("aa", "bb")] == (16, 1000000)
    assert got[("aa", "cc")][0] == 0
    assert got[("bb", "cc")][0] == 0


def test_lang_minhash_merge_property(spark):
    """Signatures are mergeable: sketching a lang's docs in one slice
    equals elementwise-min of sketches of any doc partition — asserted
    via pair agreement invariance when a lang's docs are split across
    duplicate rows (min is duplicate- and partition-blind)."""
    from nerpii_spark.operators.sketch import lang_minhash_matrix

    base = [(i, "xx" if i % 2 else "yy", f"w{i} w{i+1} w{i+2} w{i+3} common tail here")
            for i in range(10)]
    df1 = spark.createDataFrame(base, "doc_id bigint, lang string, text string")
    # same content, each doc duplicated (union of two identical slices)
    df2 = df1.union(df1)
    m1 = {(r["lang_a"], r["lang_b"]): r["n_agree"]
          for r in lang_minhash_matrix(df1).collect()}
    m2 = {(r["lang_a"], r["lang_b"]): r["n_agree"]
          for r in lang_minhash_matrix(df2).collect()}
    assert m1 == m2


# ---------------------------------------------------------------------------
# incremental rollup maintenance
# ---------------------------------------------------------------------------


def test_pred_agg_incremental_equals_full_recompute(spark):
    """The persisted-state + delta fold equals a from-scratch aggregate
    for EVERY split modulus (commutative-monoid merge), including
    splits where a predicate exists only in the delta."""
    from nerpii_spark.operators.sketch import pred_agg_incremental

    rows = [
        (d, f"s{d % 7}", "works_at" if d % 3 else "located_in", f"o{d}")
        for d in range(40)
    ] + [(100, "only", "delta_pred", "x")]  # pred born in the delta (100%4==0)
    df = spark.createDataFrame(
        rows, "doc_id bigint, subj string, pred string, obj string"
    )
    full = {
        r["pred"]: (r["n_triples"], r["latest_doc"],
                    r["est_distinct_subj"], r["s_sum"])
        for r in pred_agg_incremental(df, split_mod=10**9).collect()
    }  # split_mod huge -> delta only doc 0: effectively also a fold
    for mod in (2, 4, 7):
        inc = {
            r["pred"]: (r["n_triples"], r["latest_doc"],
                        r["est_distinct_subj"], r["s_sum"])
            for r in pred_agg_incremental(df, split_mod=mod).collect()
        }
        assert inc == full, mod
    assert "delta_pred" in full
    # exact stats components are exact regardless of the sketch
    assert full["delta_pred"][0] == 1 and full["delta_pred"][1] == 100


def test_pred_agg_hll_estimate_sane(spark):
    """The distinct-subject estimate lands within the usual HLL band of
    the true cardinality in the n >> m regime the sketch documents
    (m=64, sd ~ 1.04/sqrt(m) ~ 13%; no small-range correction by
    design — see the sketch.py module docstring)."""
    from nerpii_spark.operators.sketch import pred_agg_incremental

    rows = [(d % 97, f"subject{d:05d}", "p", "o") for d in range(2000)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, subj string, pred string, obj string"
    )
    [r] = pred_agg_incremental(df).collect()
    assert 2000 * 0.7 <= r["est_distinct_subj"] <= 2000 * 1.3


# ---------------------------------------------------------------------------
# reshard movement plan (rendezvous vs mod)
# ---------------------------------------------------------------------------


def test_reshard_plan_hrw_minimal_movement(spark):
    """HRW moves only what the new shard wins (n_moved ==
    n_moved_to_new; ~1/(n+1) of keys, allow 3x slack at 2k keys) while
    mod hashing reshuffles the vast majority (> 80%); every HRW-moved
    key lands on the new shard."""
    from nerpii_spark.operators.layout import RESHARD_N, reshard_plan

    df = spark.createDataFrame(
        [(f"https://site{i % 137}.example/p/{i}",) for i in range(2000)],
        "url string",
    )
    got = {r["scheme"]: r for r in reshard_plan(df).collect()}
    n = got["mod"]["n_keys"]
    assert n == 2000
    hrw = got["rendezvous"]
    assert hrw["n_moved"] == hrw["n_moved_to_new"]  # only INTO the new shard
    ideal = n // (RESHARD_N + 1)
    assert hrw["n_moved"] <= 3 * ideal
    assert hrw["n_moved"] >= ideal // 3
    assert got["mod"]["moved_ppm"] > 800_000


def test_reshard_plan_hrw_stability_per_key(spark):
    """Per-key invariant (stronger than the aggregate): a key whose HRW
    shard changed must have the NEW shard as its destination — replayed
    in pure Python over the same hash chain."""
    from nerpii_spark.functions.hashing import h2, strhash
    from nerpii_spark.operators.layout import RESHARD_N

    n = RESHARD_N
    for i in range(500):
        k = strhash(f"https://site{i % 37}.example/p/{i}")
        ws = [h2(h2(k, s + 1), 9) for s in range(n + 1)]
        old = ws[:n].index(max(ws[:n]))
        new = ws.index(max(ws))
        assert new == old or new == n


# ---------------------------------------------------------------------------
# CDC MERGE apply
# ---------------------------------------------------------------------------


def test_cdc_apply_hand_golden(spark):
    """MERGE semantics on a crafted changelog: last op per key wins, a
    final D removes the key even if earlier delta ops were U, a final U
    rewrites even after a D, untouched base rows pass through."""
    from nerpii_spark.operators import dedup as D
    from nerpii_spark.operators.dedup import cdc_apply

    # split_mod=2: odd doc_ids = base window, even = changelog;
    # ops are chosen by picking doc_ids whose hash rule yields them
    from nerpii_spark.functions.hashing import h1

    def op_of(d):
        return "D" if h1(d, D.CDC_DELETE_SALT) % 5 == 0 else "U"

    evens = [d for d in range(0, 400, 2)]
    a_del = next(d for d in evens if op_of(d) == "D")
    a_ups = next(d for d in evens if op_of(d) == "U" and d > a_del)
    b_ups = next(d for d in evens if op_of(d) == "U")
    b_del = next(d for d in evens if op_of(d) == "D" and d > b_ups)
    rows = [
        # base (odd ids)
        (1, "https://kept.example/x"),
        (3, "https://kept.example/y"),       # latest base capture wins
        (5, "https://a.example/p"),
        (7, "https://b.example/p"),
        # changelog: a -> D then U (U wins); b -> U then D (D wins)
        (a_del, "https://a.example/p1"),
        (a_ups, "https://a.example/p2"),
        (b_ups, "https://b.example/p1"),
        (b_del, "https://b.example/p2"),
    ]
    # guarantee intended op ordering per host by construction
    assert a_del < a_ups and b_ups < b_del
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {
        r["host"]: (r["doc_id"], r["src"])
        for r in cdc_apply(df, split_mod=2).collect()
    }
    assert got["kept.example"] == (3, "kept")
    assert got["a.example"] == (a_ups, "applied")  # U after D: alive
    assert "b.example" not in got  # D after U: removed
    assert set(got) == {"kept.example", "a.example"}


def test_cdc_apply_insert_new_key(spark):
    """A changelog U on a host absent from the base INSERTS it."""
    from nerpii_spark.functions.hashing import h1
    from nerpii_spark.operators import dedup as D
    from nerpii_spark.operators.dedup import cdc_apply

    new_u = next(
        d for d in range(0, 400, 2)
        if h1(d, D.CDC_DELETE_SALT) % 5 != 0
    )
    df = spark.createDataFrame(
        [(1, "https://old.example/a"), (new_u, "https://new.example/b")],
        "doc_id bigint, url string",
    )
    got = {
        r["host"]: r["src"] for r in cdc_apply(df, split_mod=2).collect()
    }
    assert got == {"old.example": "kept", "new.example": "applied"}


# ---------------------------------------------------------------------------
# schema evolution (file-level mergeSchema over drifted snapshots)
# ---------------------------------------------------------------------------


def test_read_evolved_merges_drifted_parquet(spark, tmp_path):
    """Two parquet snapshots with drifted schemas (column added, column
    dropped, columns reordered) read back as ONE frame: matched by
    name, padded with NULL — including the reorder case positional
    union would silently corrupt."""
    from nerpii_spark.sources.catalog import read_evolved

    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    spark.createDataFrame(
        [(1, "en", "hello")], "doc_id bigint, lang string, text string"
    ).write.parquet(p1)
    # v2: text dropped, quality added, column order shuffled
    spark.createDataFrame(
        [("de", 42, 2)], "lang string, quality bigint, doc_id bigint"
    ).write.parquet(p2)
    got = {
        r["doc_id"]: (r["lang"], r["text"], r["quality"])
        for r in read_evolved(spark, [p1, p2]).collect()
    }
    assert got == {1: ("en", "hello", None), 2: ("de", None, 42)}


def test_union_evolved_by_name_not_position(spark):
    """unionByName alignment: same columns in different order merge
    correctly where positional unionAll would swap fields."""
    from nerpii_spark.sources.catalog import union_evolved

    a = spark.createDataFrame([(1, "x")], "id bigint, v string")
    b = spark.createDataFrame([("y", 2)], "v string, id bigint")
    got = {r["id"]: r["v"] for r in union_evolved([a, b]).collect()}
    assert got == {1: "x", 2: "y"}


# ---------------------------------------------------------------------------
# relation evidence spans
# ---------------------------------------------------------------------------


def test_rel_evidence_structural_invariants(spark):
    """Every evidence span starts with its subject surface and ends
    with its object surface — the offsets-exactness invariant the
    oracle certifies corpus-wide, checked here per row at sf0.001."""
    import __spark_entry__ as E
    from nerpii_spark.operators.extract import rel_evidence

    p = E._pipeline(spark, SF)
    rows = rel_evidence(p["mentions"], p["clean"]).collect()
    assert rows
    for r in rows:
        assert r["evidence"].startswith(r["subj"]), r
        assert r["evidence"].endswith(r["obj"]), r


# ---------------------------------------------------------------------------
# event sequence mining
# ---------------------------------------------------------------------------


def test_event_sequences_per_user_support(spark):
    """Support counts DISTINCT users: one user looping a>b 50 times
    contributes 1; patterns cross the threshold only via breadth."""
    from datetime import datetime, timezone

    from nerpii_spark.operators.events import event_sequences

    rows = []
    ts0 = 1700000000
    # user 0 repeats a>b 50 times; users 1..3 do a>b once each
    for i in range(100):
        rows.append((i, datetime.fromtimestamp(ts0 + i, tz=timezone.utc), 0,
                     "a" if i % 2 == 0 else "b"))
    for u in (1, 2, 3):
        rows.append((200 + u * 2, datetime.fromtimestamp(ts0 + u * 1000, tz=timezone.utc), u, "a"))
        rows.append((201 + u * 2, datetime.fromtimestamp(ts0 + u * 1000 + 1, tz=timezone.utc), u, "b"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        (r["k"], r["pattern"]): r["support"]
        for r in event_sequences(df, min_support=4).collect()
    }
    assert got[(2, "a>b")] == 4  # 1 (looping user) + 3 (one-shot users)
    assert (2, "b>a") not in got  # support 1 < 4: only the looping user
