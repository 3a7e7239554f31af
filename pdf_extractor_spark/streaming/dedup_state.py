"""Stateful streaming dedup: first-seen filtering across micro-batches.

A custom stateful operator the reference has no analogue for (SURVEY.md
§2.9: the reference is batch-only): continuous ingestion of a 10^12-doc
corpus must drop documents whose content has already been seen in ANY
earlier micro-batch, not just the current one. Spark's `dropDuplicates` on a
stream keeps unbounded state with no control over what is emitted for a
duplicate group; this operator uses ``applyInPandasWithState`` so the state
per content key is exactly one long (how many times seen) and the emitted
row is deterministic (lowest doc_id wins within a batch, first batch wins
across batches).

Scale notes: state is hash-partitioned by content_key across executors
(same shuffle as the groupBy); state size is O(distinct keys) * 8 bytes, and
at 10^12 docs the key should be the 16-byte content digest, not the text —
which is also what makes the shuffle narrow. With RocksDB state store the
per-executor state spills to disk.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# output: the surviving (first-seen) doc per content key, plus how many
# duplicates this batch contributed
FIRST_SEEN_SCHEMA = (
    "content_key string, doc_id string, n_batch_dups long"
)
_STATE_SCHEMA = "n_seen long"


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # stream the per-key chunks: first-seen needs only the min doc_id and a
    # row count, so a hot key (boilerplate re-crawled millions of times in
    # one batch) never materializes its whole duplicate group in memory
    n_batch = 0
    keep_id: str | None = None
    for pdf in pdfs:
        n_batch += len(pdf)
        for d in pdf["doc_id"].astype(str):
            if keep_id is None or d < keep_id:
                keep_id = d
    n_prior = state.get[0] if state.exists else 0
    state.update((n_prior + n_batch,))
    if n_prior == 0 and n_batch > 0:
        yield pd.DataFrame(
            {
                "content_key": [key[0]],
                "doc_id": [keep_id],
                "n_batch_dups": [n_batch - 1],
            }
        )


def first_seen_dedup(docs: DataFrame, key_col: str = "content_key") -> DataFrame:
    """doc stream -> first-seen docs only, exactly once per content key.

    Works on a streaming DataFrame with columns (content_key, doc_id);
    duplicates arriving in LATER micro-batches are suppressed by the
    per-key state, which `dropDuplicates` alone cannot express with a
    deterministic survivor.
    """
    return docs.groupBy(key_col).applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def content_keyed(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> (content_key, doc_id): md5 of the
    concatenated span texts — the streaming analogue of ops/dedup.py's
    content digest, computed JVM-side."""
    concat = F.md5(
        F.array_join(F.transform("spans", lambda s: F.coalesce(s["text"], F.lit(""))), "\x1f")
    )
    return docs.select(concat.alias("content_key"), "doc_id")
