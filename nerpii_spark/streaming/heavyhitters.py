"""Streaming Misra-Gries heavy hitters: bounded-state frequency
summaries over an unbounded stream.

`mg_stream` maintains, per hash-shard, a Misra-Gries summary (Misra &
Gries 1982; the mergeable-summaries form of Agarwal et al. 2012) of at
most k counters over the item column — the streaming complement of the
batch Count-Min sketch (operators/sketch.py): CMS answers point queries
with additive overestimate; MG returns the candidate heavy-hitter SET
with additive underestimate <= N_shard/k, using k counters of state
per shard, period.

Sharding is the skew guard: a single global key would funnel the whole
stream through one state partition, so items hash into `n_shards`
groups, each keeping its own k-counter summary, and the per-shard
summaries MERGE downstream by counter addition + the (k+1)-th-largest
subtraction (the same rule the per-batch fold uses) — error budgets
add, giving the global guarantee exact_count - est <= N/k_total.

Batch-fold rule per micro-batch (deterministic given the summary and
the batch):
  1. add the batch's exact per-item counts into the summary;
  2. if more than k counters remain, subtract the (k+1)-th largest
     count from every counter and drop the non-positive ones.

The summary CONTENTS depend on how the stream is segmented into
batches (only the error bound is invariant) — so the pytest gate is
the randomized-split GUARANTEE check (the sessionize lesson: assert
the invariant, not one segmentation's artifact), not batch equality.

Emission: every invocation re-emits the shard's full post-update
summary (<= k rows) — update-mode semantics; a consumer keeps the
latest snapshot per shard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MG_K = 8
MG_SHARDS = 4

OUT_SCHEMA = "shard bigint, upd bigint, item string, est_count bigint"
STATE_SCHEMA = "upd bigint, items array<string>, counts array<bigint>"


def mg_fold(summary: dict[str, int], batch: dict[str, int], k: int) -> dict:
    """One Misra-Gries merge step (pure; shared by the streaming fold,
    the downstream shard merge and the pytest mirror)."""
    out = dict(summary)
    for item, n in batch.items():
        out[item] = out.get(item, 0) + n
    if len(out) > k:
        cut = sorted(out.values(), reverse=True)[k]
        out = {i: c - cut for i, c in out.items() if c - cut > 0}
    return out


def _make_mg_fn(k: int):
    def _fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            upd, items, counts = state.get
            upd = int(upd)
            summary = dict(zip(list(items), [int(c) for c in counts]))
        else:
            upd, summary = 0, {}
        batch: dict[str, int] = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            for item, n in pdf["item"].value_counts().items():
                batch[item] = batch.get(item, 0) + int(n)
        summary = mg_fold(summary, batch, k)
        upd += 1
        state.update((upd, list(summary), [summary[i] for i in summary]))
        # MG counters can DECREASE (the subtraction step), so consumers
        # cannot reconstruct "latest" by max(est_count); the update
        # ordinal makes the newest snapshot per shard selectable
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(summary),
                "upd": [upd] * len(summary),
                "item": list(summary),
                "est_count": [summary[i] for i in summary],
            }
        )

    return _fn


def mg_stream(
    events: DataFrame,
    item_col: str = "event_type",
    k: int = MG_K,
    n_shards: int = MG_SHARDS,
) -> DataFrame:
    """Streaming DataFrame -> per-shard Misra-Gries summaries (shard,
    item, est_count), re-emitted in full each micro-batch."""
    keyed = events.select(
        F.expr(f"abs(xxhash64({item_col})) % {n_shards}").alias("shard"),
        F.col(item_col).alias("item"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_mg_fn(k),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def mg_merge(summaries: list[dict[str, int]], k: int) -> dict[str, int]:
    """Merge per-shard summaries into one k-counter summary (counter
    addition + the same (k+1)-th-largest subtraction). Error budgets
    add across shards."""
    merged: dict[str, int] = {}
    for s in summaries:
        merged = mg_fold(merged, s, k)
    return merged
