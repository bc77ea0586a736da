"""Corpus-frequency line dedup (C4/RefinedWeb boilerplate removal):
hand-case semantics + physical-plan guard (broadcast drop list, no
cartesian)."""

def test_line_dedup_hand_case(spark):
    """Boilerplate lines (df > cap) are dropped; per-doc content and
    order survive; counts are exact."""
    from nerpii_spark.operators.dedup import line_dedup

    nav = "<nav>Top Nav</nav>"
    rows = [
        (i, f"<html>{nav}<p>unique {i} words. shared tail {i}.</p></html>"
            .encode())
        for i in range(5)
    ]
    pages = spark.createDataFrame(rows, "doc_id bigint, html binary")
    out = {r["doc_id"]: r for r in line_dedup(pages, df_cap=2).collect()}
    assert len(out) == 5
    for i in range(5):
        r = out[i]
        # 'Top Nav' df=5 > 2 dropped; the two content lines df=1 kept
        assert r["n_dropped"] == 1 and r["n_kept"] == 2
        assert r["text_kept"] == f"unique {i} words shared tail {i}."


def test_line_dedup_plan_broadcasts_drop_list(spark):
    """The high-df drop list joins via broadcast — the corpus-sized line
    stream is never shuffled by line key for membership, and there is no
    cartesian anywhere."""
    import __spark_entry__ as E

    df = E.q_dedup_lines(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the planted-corpus
    # generator's 5-row sentence-index range joins (j < n_sent, one per
    # pass over the generated pages), never the operator itself
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "j#" in line and "< (" in line, line
