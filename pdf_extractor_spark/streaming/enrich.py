"""Stream-static enrichment + watermark-bounded streaming dedup.

Two canonical streaming patterns the rest of the streaming surface
doesn't cover:

- **Stream-static broadcast join**: enrich an unbounded document stream
  with a bounded dimension (source -> quality prior, the static output
  of ``ops/source_quality``). The static side needs NO watermark and NO
  state — Spark re-resolves it per micro-batch and, broadcast, the join
  is map-side within each micro-batch: zero extra shuffles on the
  stream. This is the streaming sibling of the batch broadcast-dim joins
  (`revenue_by_segment` etc.) and the right shape at 100 TB/day: the
  stream never repartitions for a dimension that fits in memory.

- **Watermark-bounded dedup** (``dropDuplicatesWithinWatermark``): the
  built-in counterpart of the custom ``first_seen_dedup`` stateful
  operator. ``first_seen_dedup`` suppresses duplicates across ALL
  history — state grows with distinct keys forever, which is the right
  contract for corpus ingestion (a re-crawled page is a duplicate even a
  year later) but needs external compaction at 100 TB. The bounded form
  trades that for O(rate x watermark) state: duplicates are only
  guaranteed suppressed within the lateness budget, and the state for a
  key is EVICTED once the event-time watermark passes it — after which
  the same key emits again. Use it for transport-level dedup
  (at-least-once feeds re-delivering within minutes), not corpus-level.

The reference has no streaming at all (SURVEY.md §2.9); both patterns are
"beyond reference" per the training-pipeline mandate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_WATERMARK = "10 minutes"


def enrich_with_dim(
    stream: DataFrame, dim: DataFrame, key: str = "source", how: str = "left"
) -> DataFrame:
    """Join a (possibly streaming) DataFrame to a static dimension.

    The dimension is explicitly broadcast: each micro-batch joins
    map-side, the stream is never shuffled for the dim. A left join
    keeps stream rows whose key is missing from the dimension (the
    dimension is often refreshed on a slower cadence than the stream).
    """
    return stream.join(F.broadcast(dim), key, how)


def bounded_dedup(
    docs: DataFrame,
    keys: Sequence[str] = ("content_key",),
    ts_col: str = "ts",
    watermark: str = DEDUP_WATERMARK,
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon.

    Emits the first occurrence of each key immediately (append mode);
    a duplicate is guaranteed suppressed only while the key's state
    lives, i.e. until the event-time watermark passes ``ts + watermark``
    — after eviction the key emits again (pinned in tests). That bounded
    re-emission is the price of bounded state.
    """
    return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
