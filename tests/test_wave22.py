"""Wave-22: watermark-lateness audit, JSON schema-on-read ingest."""

from pyspark.sql import functions as F

from nerpii_spark.operators.events import json_props_stats, watermark_audit


def test_watermark_audit_invariants(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = watermark_audit(ev).collect()
    assert sum(r.n_events for r in rows) == ev.count()
    # every max_late_s lies inside its log2 bucket [2^b - 1, 2^(b+1) - 2]
    for r in rows:
        assert (2 ** r.late_bucket) - 1 <= r.max_late_s + 1 - 1
        assert r.max_late_s + 1 < 2 ** (r.late_bucket + 1)
    # bucket 0 (on-time) must exist: each user's first arrival is never late
    assert any(r.late_bucket == 0 for r in rows)


def test_watermark_audit_crafted_lateness(spark):
    # one user; event B has ts later than C but arrives first by jitter?
    # craft directly: bypass jitter by choosing ids whose planted delay
    # ordering we compute from the same hash the operator uses
    from nerpii_spark.functions.hashing import h1
    from nerpii_spark.operators.events import WM_SALT, WM_JITTER_S

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # find two event ids where the EARLIER-ts event gets the LARGER
    # delay, so the later-ts event overtakes it in arrival order
    for a in range(200):
        for b in range(200):
            if a == b:
                continue
            da = h1(a, WM_SALT) % WM_JITTER_S
            db = h1(b, WM_SALT) % WM_JITTER_S
            # a at t=0 with delay da; b at t=10s with delay db
            if 0 + da > 10 + db and (0 + da) - 10 > 0:
                ev = spark.createDataFrame(
                    [
                        (a, base, 1, "x", 0.0, "{}"),
                        (b, base + dt.timedelta(seconds=10), 1, "x",
                         0.0, "{}"),
                    ],
                    "event_id bigint, ts timestamp, user_id bigint,"
                    " event_type string, value double, props string",
                )
                rows = watermark_audit(ev).collect()
                # event a arrives after b: its lateness is 10s
                lates = sorted(
                    (r.late_bucket, r.max_late_s) for r in rows
                )
                assert sum(r.n_events for r in rows) == 2
                assert max(r.max_late_s for r in rows) == 10
                return
    raise AssertionError("no id pair with inverted arrival found")


def test_json_props_malformed_rows_surface_as_null(spark):
    ev = spark.createDataFrame(
        [
            (1, "a", '{"k": 5}'),
            (2, "a", '{"k": 7}'),
            (3, "a", "not json"),
            (4, "b", '{"other": 1}'),
        ],
        "event_id bigint, event_type string, props string",
    )
    got = {r.event_type: r for r in json_props_stats(ev).collect()}
    a = got["a"]
    assert (a.n, a.n_k, a.sum_k, a.max_k) == (3, 2, 12, 7)
    b = got["b"]
    assert (b.n, b.n_k) == (1, 0) and b.sum_k is None and b.max_k is None
