"""Streaming admission control: per-source ingestion quotas.

The streaming counterpart of the batch ``corpus_mix`` operator
(ops/advanced.py): continuous ingestion must enforce per-source caps
*across micro-batches* — "never admit more than N documents from source X
into this corpus snapshot" — which a stateless filter cannot express (the
running count lives across batches) and ``limit`` cannot either (it is
global, not per-key, and nondeterministic under retries).

``applyInPandasWithState`` keeps exactly one long per source (documents
admitted so far). Admission is deterministic — within a batch, documents
are admitted in doc_id order until the cap is reached — so a replayed
micro-batch after a crash admits the same rows, keeping the downstream
exactly-once commit contract intact.

Scale notes: state is hash-partitioned by source (one shuffle, the same
one the groupBy needs anyway); state size is 8 bytes * n_sources. The
sort is per (source, batch) — bounded by the micro-batch, never global.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

QUOTA_SCHEMA = "source string, doc_id string, admit_rank long"
_STATE_SCHEMA = "n_admitted long"


def source_quota(docs: DataFrame, cap: int, key_col: str = "source") -> DataFrame:
    """doc stream (source, doc_id) -> admitted docs only, <= cap per source.

    ``admit_rank`` is the 1-based admission index within the source across
    the whole stream history — rank cap is reached once and never resets.
    """

    def quota_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        n = state.get[0] if state.exists else 0
        room = cap - n
        if room > 0 and len(batch) > 0:
            take = batch.sort_values("doc_id", kind="mergesort").head(room)
            state.update((n + len(take),))
            yield pd.DataFrame(
                {
                    "source": [key[0]] * len(take),
                    "doc_id": take["doc_id"].astype(str).tolist(),
                    "admit_rank": list(range(n + 1, n + len(take) + 1)),
                }
            )
        else:
            # cap already reached: state unchanged, nothing emitted
            state.update((n,))

    return docs.groupBy(key_col).applyInPandasWithState(
        quota_fn,
        outputStructType=QUOTA_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
