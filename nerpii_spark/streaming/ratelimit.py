"""Custom stateful streaming operator: per-host token-bucket admission
(crawl politeness at the fetch frontier).

`rate_limit_stream` tags each fetch request (host, ts, doc_id) with an
ADMIT / DEFER decision from a per-host token bucket: capacity `capacity`
tokens, refilled `rate_tps` tokens per second of EVENT time, one token
per admitted fetch. The batch planners (webgraph.crawl_budget /
host_quota / crawl_waves) decide WHAT to fetch; this is the runtime
governor deciding WHEN — the op a live crawl loop runs against the
stream of candidate fetches.

Event-time discipline (the sessionize.py lesson, CLAUDE.md): a token
bucket is ORDER-SENSITIVE — deciding a request the moment it arrives
breaks under out-of-order arrival, because an earlier-ts request can
still arrive (legal whenever ts >= watermark) and should have consumed
the token first; append mode cannot retract a decision. So requests
WAIT in state until the watermark seals them (ts < wm — nothing that
must precede them can arrive anymore), then are decided in strict
(ts, doc_id) order. Requests at or below the watermark at arrival are
late and dropped — STRICTLY, because Spark's own late-record filter
for event-time-timeout stateful ops is strict against a one-batch-
lagged watermark (measured: an exact-epoch-0 row never reaches the
operator); a strict gate against the entering watermark dominates that
lag and keeps the drop rule replayable. Decisions are therefore a pure
fold over the sealed prefix: INDEPENDENT of batch
splits (the randomized arbitrary-split gate asserts streaming ==
batch-fold equality in tests/test_streaming.py).

All-integer bucket arithmetic: micro-tokens (1 token = 1e6 u), refill
per ms = rate_tps * 1000 u exactly — no float, no floor-remainder loss,
so the fold is exact and replayable. State per host is
(tokens_u, clock_ms) + the pending (ts, doc_id) queue; pending size is
bounded by the host's arrival rate within one watermark delay — the
working set, not history. A quiescent host flushes through an
EventTimeTimeout timer armed at its earliest pending ts (clamped
strictly past the current watermark, as Spark requires).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "host string, ts timestamp, doc_id bigint,"
    " admitted boolean, tokens_milli_after bigint"
)
STATE_SCHEMA = (
    "tokens_u bigint, clock_ms bigint,"
    " pts array<bigint>, pids array<bigint>"
)

TOKEN_U = 1_000_000  # micro-tokens per token (exact ms refill: tps*1000)


def bucket_fold(
    events: list[tuple[int, int]],
    capacity: int,
    rate_tps: int,
    tokens_u: int | None = None,
    clock_ms: int | None = None,
) -> tuple[list[tuple[int, int, bool, int]], int, int]:
    """The one shared decision fold (streaming operator AND batch/test
    mirror call this): events = (ts_ms, doc_id) sorted by (ts, doc_id);
    returns ([(ts_ms, doc_id, admitted, tokens_milli_after)], tokens_u,
    clock_ms). A fresh bucket starts FULL at the first event's ts."""
    cap_u = capacity * TOKEN_U
    out = []
    for ts_ms, doc_id in events:
        if clock_ms is None:
            tokens_u, clock_ms = cap_u, ts_ms
        else:
            tokens_u = min(
                cap_u, tokens_u + (ts_ms - clock_ms) * rate_tps * 1000
            )
            clock_ms = ts_ms
        admitted = tokens_u >= TOKEN_U
        if admitted:
            tokens_u -= TOKEN_U
        out.append((ts_ms, doc_id, admitted, tokens_u // 1000))
    return out, tokens_u, clock_ms


def _make_limit_fn(capacity: int, rate_tps: int):
    def _limit_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        tokens_u: int | None = None
        clock_ms: int | None = None
        pending: list[tuple[int, int]] = []
        if state.exists:
            t_u, c_ms, pts, pids = state.get
            if c_ms >= 0:
                tokens_u, clock_ms = int(t_u), int(c_ms)
            pending = [(int(t), int(i)) for t, i in zip(pts, pids)]
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
                ids = pdf["doc_id"].astype("int64").tolist()
                # at-or-below-watermark arrivals are late: dropped.
                # STRICT on purpose: Spark's own late-record filter for
                # event-time-timeout stateful ops is strict (ts > wm)
                # against a one-batch-LAGGED watermark (measured in
                # tests/test_streaming.py's probes: an exact-epoch-0
                # row is dropped in the very first batch; a tie with a
                # stationary watermark would be dropped upstream too).
                # Making the operator's gate strict against the
                # ENTERING watermark dominates the lagged upstream
                # filter, so the keep-rule is a pure replayable
                # function of (arrival batch, watermark ratchet) —
                # never of Spark's internal filter lag.
                pending += [
                    (t, i) for t, i in zip(ts_ms, ids) if t > wm
                ]
        pending.sort()
        sealed = [e for e in pending if e[0] < wm]
        waiting = [e for e in pending if e[0] >= wm]
        decided, tokens_u, clock_ms = bucket_fold(
            sealed, capacity, rate_tps, tokens_u, clock_ms
        )
        # bounded state: an idle host whose bucket has refilled to
        # capacity by the current watermark is FORGOTTEN — any future
        # event has ts >= wm, so it would find a full bucket either
        # way; forgetting == fresh-full-bucket, exactly (no waiting
        # queue, no decision drift)
        refilled_full = clock_ms is not None and (
            tokens_u + max(wm - clock_ms, 0) * rate_tps * 1000
            >= capacity * TOKEN_U
        )
        if waiting or (clock_ms is not None and not refilled_full):
            state.update((
                tokens_u if tokens_u is not None else -1,
                clock_ms if clock_ms is not None else -1,
                [t for t, _ in waiting],
                [i for _, i in waiting],
            ))
            # arm a timer so a quiescent host still flushes/evicts:
            # earliest pending seal point, else the refill-to-cap point
            till_full = 0
            if not waiting and rate_tps > 0:
                deficit = capacity * TOKEN_U - tokens_u
                till_full = clock_ms + -(-deficit // (rate_tps * 1000))
            state.setTimeoutTimestamp(
                max(waiting[0][0] + 1 if waiting else till_full, wm + 1)
            )
        elif state.exists:
            state.remove()
        if decided:
            yield pd.DataFrame(
                {
                    "host": [key[0]] * len(decided),
                    "ts": [
                        pd.Timestamp(t, unit="ms") for t, _, _, _ in decided
                    ],
                    "doc_id": [i for _, i, _, _ in decided],
                    "admitted": [a for _, _, a, _ in decided],
                    "tokens_milli_after": [m for _, _, _, m in decided],
                }
            )

    return _limit_fn


def rate_limit_stream(
    fetches: DataFrame,
    capacity: int = 4,
    rate_tps: int = 1,
    watermark_delay: str = "1 second",
) -> DataFrame:
    """Streaming (host, ts, doc_id) -> watermark-sealed admission
    decisions (host, ts, doc_id, admitted, tokens_milli_after)."""
    keyed = fetches.select("host", "ts", "doc_id").withWatermark(
        "ts", watermark_delay
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _make_limit_fn(capacity, rate_tps),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def rate_limit_batch(
    rows: list[tuple[str, int, int]], capacity: int, rate_tps: int
) -> set[tuple[str, int, int, bool, int]]:
    """Batch mirror over (host, ts_ms, doc_id) rows: the exact fold the
    streaming operator must reproduce on its sealed prefix."""
    by_host: dict[str, list[tuple[int, int]]] = {}
    for h, t, i in rows:
        by_host.setdefault(h, []).append((t, i))
    out = set()
    for h, evs in by_host.items():
        decided, _, _ = bucket_fold(sorted(evs), capacity, rate_tps)
        out |= {(h, t, i, a, m) for t, i, a, m in decided}
    return out
