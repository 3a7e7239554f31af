"""Running per-source corpus statistics across micro-batches.

A long-running ingestion job wants a live per-source health signal:
cumulative document count, cumulative characters, and the per-batch
delta, emitted every micro-batch a source appears in. Downstream
monitors alert on drift (a source whose average length collapses is
usually a parser or upstream-format regression — the streaming sibling
of the batch ``source_quality`` prior in ops/advanced.py).

Implemented on ``applyInPandasWithState`` with one (n_docs, n_chars)
state tuple per distinct source — the same API generation as
streaming/dedup_state.py and streaming/quota.py. Spark 4's successor
API (``transformWithStateInPandas`` + StatefulProcessor) was tried
first and is the better long-term shape (typed per-key ValueState,
engine-managed TTL), but its state-server protocol requires
``google.protobuf``, which is absent from this container — the import
failure surfaces only at stream start as an opaque "driver worker
crashed". Gated out per the environment rules rather than stubbed:
the GroupState form below is semantically identical for this operator.

Averages use the repo-wide floor-micros integer convention so batch
and streaming paths agree bit-for-bit.

Scale notes: state is hash-partitioned by source (the one shuffle the
groupBy needs anyway); state size is 16 bytes * n_sources — O(distinct
sources), nowhere near data volume, so the operator is trivially
100 TB-safe. The per-batch sum is computed per Arrow chunk without
materializing the whole group.

The reference has no streaming (SURVEY.md §2.9); beyond-reference per
the training-pipeline mandate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = (
    "source string, batch_docs long, total_docs long, "
    "total_chars long, avg_chars_micros long"
)
_STATE_SCHEMA = "n_docs long, n_chars long"


def running_source_stats(docs: DataFrame, key_col: str = "source") -> DataFrame:
    """doc stream (source, n_chars, ...) -> one stats row per source per
    micro-batch it appears in (append mode).

    ``total_docs``/``total_chars`` are cumulative across the whole stream
    history (restart-safe via the checkpoint); ``batch_docs`` is this
    micro-batch's delta; ``avg_chars_micros`` is the running mean in
    floor-micros.
    """

    def stats_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch_docs = 0
        batch_chars = 0
        for pdf in pdfs:
            batch_docs += len(pdf)
            batch_chars += int(pdf["n_chars"].sum())
        prev = state.get if state.exists else (0, 0)
        n_docs = int(prev[0]) + batch_docs
        n_chars = int(prev[1]) + batch_chars
        state.update((n_docs, n_chars))
        if batch_docs > 0:
            yield pd.DataFrame(
                {
                    "source": [key[0]],
                    "batch_docs": [batch_docs],
                    "total_docs": [n_docs],
                    "total_chars": [n_chars],
                    "avg_chars_micros": [n_chars * 1_000_000 // n_docs],
                }
            )

    return docs.groupBy(key_col).applyInPandasWithState(
        stats_fn,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
