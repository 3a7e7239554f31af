"""Streaming heavy hitters: bounded-state top-item tracking per key.

The streaming sibling of the batch ``heavy_hitters_cms`` op
(ops/sketches.py). A continuous ingest wants "which items dominate each
source, live" — but exact per-item counters grow with the item
vocabulary, which is unbounded over an infinite stream. Misra–Gries
summaries cap the state at k counters per key with the classic
guarantee: any item with true frequency > N/(k+1) is GUARANTEED present
in the summary, and each estimate undercounts by at most N/(k+1).

Determinism (the replay contract): a re-delivered micro-batch must
produce the identical summary, so rows are folded in a stable sorted
order (``order_col``) rather than arrival order. Counter eviction uses
the standard decrement-all rule; ties in the emitted top list break on
item text.

State: two parallel arrays (items, counts), k entries per distinct key —
O(keys * k), independent of stream length. Scale: partitioned by the
groupBy key like every stateful op here; swap in the RocksDB state store
for disk-backed state at corpus scale.

The reference has no streaming (SURVEY.md §2.9); beyond-reference per
the training-pipeline mandate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HEAVY_SCHEMA = "key string, item string, est_count long, rank int"
_STATE_SCHEMA = "items array<string>, counts array<long>"

DEFAULT_K = 8


def _mg_fold(counters: dict[str, int], items: list[str], k: int) -> dict[str, int]:
    """Fold items into a Misra–Gries summary of at most k counters."""
    for it in items:
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            # decrement-all; drop exhausted counters
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def heavy_hitters_stream(
    docs: DataFrame,
    k: int = DEFAULT_K,
    key_col: str = "source",
    item_col: str = "item",
    order_col: str = "doc_id",
    emit_top: int = 5,
) -> DataFrame:
    """(key, item) stream -> per-batch top-``emit_top`` item estimates per
    key, tracked in O(k) state per key (append mode)."""

    def mg_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            items, counts = state.get
            counters = dict(zip(list(items), [int(c) for c in counts]))
        else:
            counters = {}
        if len(batch) == 0:
            # same sorted layout as the main path: replayed state must be
            # byte-identical regardless of which path produced it
            keys0 = sorted(counters)
            state.update((keys0, [counters[i] for i in keys0]))
            return
        # tiebreak on item too: one order_col value (e.g. a doc contributing
        # several items) would otherwise keep shuffle-arrival order, and a
        # replayed batch could fold in a different order -> different state
        ordered = batch.sort_values([order_col, item_col], kind="mergesort")[item_col]
        counters = _mg_fold(counters, [str(x) for x in ordered], k)
        keys = sorted(counters)  # stable state layout for replay equality
        state.update((keys, [counters[i] for i in keys]))
        top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:emit_top]
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(top),
                "item": [t[0] for t in top],
                "est_count": [t[1] for t in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return docs.groupBy(key_col).applyInPandasWithState(
        mg_fn,
        outputStructType=HEAVY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
