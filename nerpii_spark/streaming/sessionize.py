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
construction — every key's state is removed when its timeout fires, so
state size tracks the set of users ACTIVE inside one gap window, not
the all-time user count (the property that keeps it alive at web
scale). The timeout timestamp is clamped to watermark + 1 ms: an
already-expired session (late first sighting) must still register a
valid timer, Spark rejects timeouts at or before the current watermark.

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
        ts_ms: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts_ms.extend(
                    (pdf["ts"].astype("int64") // 1_000_000).tolist()
                )
        ts_ms.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple[int, int, int]] = []
        for t in ts_ms:
            if last is None:
                start, last, n = t, t, 1
            elif t - last > gap_ms:  # strictly: exactly-gap MERGES
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last = max(last, t)
                n += 1
        state.update((start, last, n))
        # strictly after the watermark or Spark rejects the timer
        state.setTimeoutTimestamp(
            max(last + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
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
