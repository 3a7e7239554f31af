"""Event-time session windows over a document/event stream.

The streaming sibling of the batch gap-sessionization operator
(ops/advanced.py q_sessionize, 30-minute gap): ``session_window`` merges
events into variable-length windows that close after a gap of inactivity,
evaluated incrementally with watermark-bounded state. The same function
body serves batch and streaming DataFrames — the declarative plan is
identical; only the physical execution (incremental state vs one-shot
aggregation) differs, which is the property that lets the engine run its
batch queries over a live stream unchanged.

Scale notes: state is partitioned by (user_id); the watermark bounds how
long an open session can wait for a straggler event, so state size is
O(active users in the watermark horizon), not O(history). Late events
beyond the watermark are dropped — the knob a 100 TB/day ingest uses to
trade completeness for bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_GAP = "30 minutes"
WATERMARK = "10 minutes"


def session_window_counts(
    events: DataFrame, gap: str = SESSION_GAP, watermark: str = WATERMARK
) -> DataFrame:
    """events(ts, user_id, ...) -> one row per (user, session window).

    Works identically on a static or streaming DataFrame; on a stream the
    watermark bounds session state and drops events later than
    ``watermark`` past the max seen event time.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
