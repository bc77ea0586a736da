"""Custom stateful streaming operator: event-time sessionization.

`sessionize_stream` groups a stream of (user_id, ts, ...) events into
gap-bounded sessions and emits each session WHEN IT CLOSES — either
because a later event of the same user arrives more than `gap_s` after
the session's last event (closed in-merge), or because the event-time
watermark passes last_event + gap (closed by EventTimeTimeout, the
watermark-driven path that needs no further events from that user).
Output rows are (user_id, session_start, session_end, n_events) with
session_end = last event + gap — exactly the native
`F.session_window` convention, and the boundary matches the measured
batch semantics (an event arriving EXACTLY gap after the previous one
MERGES — tests/test_extras.py::test_session_window_exact_gap_merges):
a new session starts only when the gap is strictly exceeded.

This is the canonical applyInPandasWithState sessionization shape next
to streaming/stateful.py's dedup: key by user, keep one open session
(3 bigints) per key, emit incrementally. State is bounded by
construction — every key's state is removed when its timeout fires or
when the current watermark has already closed its open session (the
quiescent-stream path: a timer must sit strictly PAST the watermark,
so an already-expired session emits in the data invocation itself
rather than waiting for a wakeup that may never come) — so state size
tracks the set of users ACTIVE inside one gap window, not the all-time
user count (the property that keeps it alive at web scale).

Out-of-order arrivals (anything above the watermark is not late and
MUST be honored): batch events and the open session merge as
gap-connected INTERVALS, so an earlier event extends the open session
backward (start = min) or forms its own earlier session that the open
one immediately closes — see _merge_segments for the exactness
argument (interval merging == native session_window over the full
event multiset, because stored segments keep all internal gaps <= gap
by construction).

Batch equivalence (vs native session_window restricted to closed
sessions) and in-merge vs timeout close paths are pinned in
tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp,"
    " session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start_ms bigint, last_ms bigint, n bigint"


def _emit(user_id: int, closed: list, gap_ms: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_start": [
                pd.Timestamp(s, unit="ms") for s, _, _ in closed
            ],
            "session_end": [
                pd.Timestamp(last + gap_ms, unit="ms")
                for _, last, _ in closed
            ],
            "n_events": [n for _, _, n in closed],
        }
    )


def _merge_segments(
    segments: list[tuple[int, int, int]], gap_ms: int
) -> list[tuple[int, int, int]]:
    """Union gap-connected (start, last, n) segments, sorted by start.
    Exactness argument: a stored segment's internal event gaps are all
    <= gap by construction (the invariant every merge preserves), so a
    point is within gap of SOME event of a segment iff it is within gap
    of the segment INTERVAL — for p inside [start, last] it lies between
    two consecutive events that are <= gap apart; for p outside, the
    nearest event is an endpoint. Interval merging therefore reproduces
    native session_window over the full event multiset even though only
    extents survive in state."""
    segments.sort()
    out = [segments[0]]
    for s, l, n in segments[1:]:
        ps, pl, pn = out[-1]
        if s - pl > gap_ms:  # strictly: exactly-gap MERGES
            out.append((s, l, n))
        else:
            out[-1] = (ps, max(pl, l), pn + n)
    return out


def _make_session_fn(gap_ms: int):
    def _session_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_event + gap with no new events:
            # the open session is final — emit and free the state
            start, last, n = state.get
            state.remove()
            yield _emit(key[0], [(start, last, n)], gap_ms)
            return
        # batch events may arrive OUT OF ORDER relative to the open
        # session (anything above the watermark is not late): treat the
        # open session as one segment and merge intervals, so an earlier
        # event extends the session BACKWARD (start = min) or forms its
        # own earlier session — never silently absorbs into a later one
        segments: list[tuple[int, int, int]] = [
            (int(t), int(t), 1)
            for pdf in pdfs
            if len(pdf)
            for t in (pdf["ts"].astype("int64") // 1_000_000).tolist()
        ]
        if state.exists:
            segments.append(tuple(state.get))
        if not segments:
            return
        merged = _merge_segments(segments, gap_ms)
        # every segment the watermark already closed is final too — a
        # quiescent stream would otherwise never fire its timer (the
        # timer must sit strictly past the watermark)
        wm = state.getCurrentWatermarkMs()
        closed = merged[:-1]
        start, last, n = merged[-1]
        if last + gap_ms <= wm:
            closed = merged
            state.remove()
        else:
            state.update((start, last, n))
            state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))
        if closed:
            yield _emit(key[0], closed, gap_ms)

    return _session_fn


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    watermark_delay: str = "1 second",
) -> DataFrame:
    """Streaming (user_id, ts, ...) -> closed sessions
    (user_id, session_start, session_end, n_events)."""
    keyed = events.select("user_id", "ts").withWatermark(
        "ts", watermark_delay
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_s * 1000),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
