"""Custom stateful streaming operator: cross-micro-batch exact dedup.

`dedup_stream` drops documents whose content fingerprint has already been
seen in ANY earlier micro-batch — the streaming twin of
operators/dedup.exact_dedup_groups — using `applyInPandasWithState`
(per-key GroupState; the key is the fingerprint, so state is one boolean
per distinct content).

State is BOUNDED when `state_ttl_ms` is set: fingerprints not seen for
the TTL are evicted via ProcessingTimeTimeout, so state size tracks the
working set instead of growing monotonically — the property that keeps
the operator alive at web scale. A fingerprint recurring after eviction
is re-emitted (bounded-memory tradeoff, standard for streaming dedup
with an eviction window). The default (None) is the exact unbounded
variant. NOTE: with a TTL, MicroBatchExecution schedules timer-check
batches continuously — always pair it with a trigger interval
(.trigger(processingTime=...)); `processAllAvailable()` never quiesces
on a timer-driven query.

This is the `applyInPandasWithState` pattern the engine uses for any
custom stateful op: key by the dedup/join key, keep minimal per-key
state, emit incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "fingerprint string, doc_id bigint, text string"
STATE_SCHEMA = "seen boolean"


def _make_dedup_fn(state_ttl_ms: int | None):
    def _dedup_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expired with no new sightings: evict (bounded state)
            state.remove()
            return
        if state.exists:
            # fingerprint already emitted in an earlier batch: drop all,
            # refresh the TTL (recent duplicates keep the key hot)
            for _ in pdfs:
                pass
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)
            return
        # survivor = min doc_id across ALL chunks of this first-seen batch
        # (a group may arrive split over several Arrow chunks)
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.nsmallest(1, "doc_id")
            if best is None or cand["doc_id"].iloc[0] < best["doc_id"].iloc[0]:
                best = cand
        state.update((True,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if best is not None:
            yield best.assign(fingerprint=key[0])[
                ["fingerprint", "doc_id", "text"]
            ]

    return _dedup_fn


def dedup_stream(
    docs: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Streaming DataFrame (doc_id, text, ...) -> first occurrence per
    content fingerprint across micro-batches within the TTL window."""
    keyed = docs.select(
        F.md5("text").alias("fingerprint"), "doc_id", "text"
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _make_dedup_fn(state_ttl_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
