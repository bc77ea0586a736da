"""Custom stateful streaming operator: cross-micro-batch exact dedup.

`dedup_stream` drops documents whose content fingerprint has already been
seen in ANY earlier micro-batch — the streaming twin of
operators/dedup.exact_dedup_groups — using `applyInPandasWithState`
(per-key GroupState; the key is the fingerprint, so state is one boolean
per distinct content, bounded by a timeout at real scale).

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


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # fingerprint already emitted in an earlier batch: drop everything
        for _ in pdfs:
            pass
        return
    first = None
    for pdf in pdfs:
        if len(pdf) and first is None:
            # survivor = min doc_id within this first-seen batch
            first = pdf.sort_values("doc_id").head(1)
    state.update((True,))
    if first is not None:
        yield first.assign(fingerprint=key[0])[
            ["fingerprint", "doc_id", "text"]
        ]


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming DataFrame (doc_id, text, ...) -> first occurrence per
    content fingerprint across all micro-batches."""
    keyed = docs.select(
        F.md5("text").alias("fingerprint"), "doc_id", "text"
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
