"""Watermarked stream-stream join: enrich a document stream with a
late-arriving annotation stream.

A training-data pipeline rarely gets documents and their annotations
(labels, toxicity scores, dedup verdicts from a slower service) in the
same feed; the annotation stream lags by minutes. A batch join cannot run
until "everything" has arrived — a notion that does not exist on an
unbounded stream. Spark's stream-stream inner join keeps both sides in
state and emits a row the moment its partner arrives, and the
watermark + event-time range condition is what BOUNDS that state: a
document older than the lateness budget is evicted, so state is
O(arrival-rate x window), not O(history).

Scale notes: both sides hash-partition on the join key (doc_id) — one
shuffle each, state co-located with the join. The time-range predicate is
mandatory at 100 TB/day: without it Spark must keep every document
forever (unbounded state), which is exactly the failure mode the
watermark exists to prevent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_WATERMARK = "10 minutes"
LABEL_WATERMARK = "10 minutes"
MAX_LABEL_LAG = "15 minutes"  # labels may trail their document by this much


def enrich_with_labels(
    docs: DataFrame,
    labels: DataFrame,
    max_lag: str = MAX_LABEL_LAG,
) -> DataFrame:
    """docs(doc_ts, doc_id, ...) JOIN labels(label_ts, doc_id, label).

    Inner stream-stream join: emits (doc_id, doc_ts, label_ts, label) as
    soon as both sides of a doc_id have arrived, keeping only documents
    whose label could still arrive (label_ts in [doc_ts, doc_ts+max_lag])
    in state. Works identically on static DataFrames (the declarative
    plan is the same; state bookkeeping only exists on streams).
    """
    d = docs.withWatermark("doc_ts", DOC_WATERMARK) if docs.isStreaming else docs
    lb = (
        labels.withWatermark("label_ts", LABEL_WATERMARK)
        if labels.isStreaming
        else labels
    )
    cond = (
        (d["doc_id"] == lb["doc_id"])
        & (lb["label_ts"] >= d["doc_ts"])
        & (lb["label_ts"] <= d["doc_ts"] + F.expr(f"INTERVAL {max_lag}"))
    )
    return d.join(lb, cond, "inner").select(
        d["doc_id"], "doc_ts", "label_ts", "label"
    )
