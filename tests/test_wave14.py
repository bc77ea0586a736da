"""Wave-14 operators. Oracle equality runs in tools/check_oracle.py;
these tests pin what the hash-match cannot — behavioral invariants and
independent Python mirrors of the integer algebra."""

from nerpii_spark.sources import pages as P

SF = "/root/testdata/sf0.001"


def _pipeline(spark):
    import __spark_entry__ as E

    return E._pipeline(spark, SF)


# ---------------------------------------------------------------------------
# entity salience
# ---------------------------------------------------------------------------

SAL_OFFSETS = {
    # template -> [(entity_type, value_key, within-sentence offset fn)]
    0: [
        ("PERSON", "person", lambda v: 0),
        ("ORGANIZATION", "org", lambda v: len(v["person"]) + 10),
        (
            "LOCATION",
            "city",
            lambda v: len(v["person"]) + 10 + len(v["org"]) + 4,
        ),
    ],
    1: [("PERSON", "person", lambda v: 8)],
    2: [
        ("PERSON", "person", lambda v: 0),
        (
            "LOCATION",
            "city",
            lambda v: len(v["person"])
            + 10
            + len(str(v["streetnum"]))
            + 1
            + len(v["street"])
            + 4,
        ),
        (
            "LOCATION",
            "st",
            lambda v: len(v["person"])
            + 10
            + len(str(v["streetnum"]))
            + 1
            + len(v["street"])
            + 4
            + len(v["city"])
            + 2,
        ),
    ],
    3: [
        (
            "ORGANIZATION",
            "org",
            lambda v: 4 + len(v["ssn"]) + 10 + len(v["cc"]) + 15,
        )
    ],
}


def _python_salience(doc_id: int, base_len: int):
    """Independent mirror: (etype, norm) -> (n, first_begin) for one doc."""
    from nerpii_spark.sources.pages import _sentence, _vals, plant_doc

    planted = plant_doc(doc_id)
    occ = {}
    off = base_len + 1
    for j, s in enumerate(planted.sentences):
        v = _vals(doc_id, j)
        assert _sentence(v).text == s.text
        for etype, key, f in SAL_OFFSETS[s.t]:
            surf = str(v[key])
            b = off + f(v)
            k = (etype, surf.lower())
            n, first = occ.get(k, (0, b))
            occ[k] = (n + 1, min(first, b))
        off += len(s.text) + 1
    return occ


def test_salience_python_mirror(spark):
    """Spark salience == the pure-Python offset mirror for every doc at
    sf0.001 — counts, first offsets, AND the rank total order. Also
    asserts each mirrored offset actually points at the surface inside
    the clean text (the detector and the arithmetic agree on bytes)."""
    import __spark_entry__ as E

    p = _pipeline(spark)
    got = {}
    for r in E.q_entity_salience(spark, SF).collect():
        got.setdefault(r["doc_id"], []).append(r)
    clean = {
        r["doc_id"]: r["text"]
        for r in p["clean"].select("doc_id", "text").collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base_len = {
        r["doc_id"]: len(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    n_docs_with = 0
    for doc_id, blen in base_len.items():
        occ = _python_salience(doc_id, blen)
        rows = got.get(doc_id, [])
        assert len(rows) == len(occ), doc_id
        if not occ:
            continue
        n_docs_with += 1
        by_key = {(r["entity_type"], r["mention_norm"]): r for r in rows}
        for (etype, norm), (n, first) in occ.items():
            r = by_key[(etype, norm)]
            assert r["n_mentions"] == n, (doc_id, etype, norm)
            assert r["first_begin"] == first, (doc_id, etype, norm)
            # the offset really lands on the surface in the clean text
            assert clean[doc_id][first : first + len(norm)].lower() == norm
        want_order = sorted(
            occ.items(), key=lambda kv: (-kv[1][0], kv[1][1], kv[0])
        )
        got_order = sorted(rows, key=lambda r: r["sal_rank"])
        assert [
            (r["entity_type"], r["mention_norm"]) for r in got_order
        ] == [k for k, _ in want_order], doc_id
        assert [r["sal_rank"] for r in got_order] == list(
            range(1, len(rows) + 1)
        )
    assert n_docs_with > 10  # the corpus genuinely exercises the op
