"""Downstream OCR stage: consume the routed ``ocr_queue/`` incrementally.

Completes the reference's P6 loop (empty text -> force-OCR retry,
docling_processor.py:235-239, dashboard orchestration) as a two-stage
pipeline instead of an in-process retry: stage 1 (streaming ingest with
``route_needs_ocr=True``) commits extraction chunks and publishes scanned
documents' ``pdf://`` refs into ``ocr_queue/chunk-*`` under the same atomic
commit; THIS stage is the consumer — a second Structured Streaming query
that treats the queue directory itself as its source, so the corpus is
never rescanned to find OCR work and each stage scales (and fails)
independently, the standard queue-decoupled shape for a 100 TB pipeline
where the OCR fleet is provisioned separately from the parse fleet.

The OCR ENGINE is a deterministic declared STUB (no OCR runtime in this
container, and the north_star contract is digital parse — same precedent as
the multimodal codecs, ops/multimodal.py): the recovered text is a pure
function of the media ref. The stage plumbing — streaming source over the
queue, per-ref explode, Arrow-batched ``mapInPandas`` engine call, Spark's
transactional file sink for exactly-once output — is real and tested.

Exactly-once: the file sink's ``_spark_metadata`` transaction log plus the
stream checkpoint make replays idempotent (a re-run after a crash neither
drops nor duplicates refs); the queue side is append-only (chunk dirs are
published atomically and never mutated), so no consumer offset tracking
beyond the checkpoint is needed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# what the router writes into ocr_queue/chunk-* (streaming/ingest.py)
QUEUE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("pages_needing_ocr", IntegerType()),
        StructField("media_refs", ArrayType(StringType())),
    ]
)

# output-table directory name under the stage-2 root (shared with the CLI)
OCR_TEXT_DIRNAME = "ocr_text"

OCR_TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("ocr_text", StringType()),
    ]
)


def stub_ocr(media_ref: str) -> str:
    """OCR engine STUB — deterministic recovered text from the ref alone.

    A real deployment swaps this for the OCR engine call (tesseract/
    paddleocr worker, initialized once per executor via the module-level
    lazy-init pattern in spark/pipeline.py); everything around it is the
    real contract: batch-vectorized input, one output row per ref."""
    h = hashlib.md5(media_ref.encode("utf-8")).hexdigest()[:12]
    return f"[ocr-stub {h}]"


def _ocr_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        if len(pdf) == 0:
            continue
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "ocr_text": [stub_ocr(r) for r in pdf["media_ref"].astype(str)],
            }
        )


def ocr_results_stream(spark: SparkSession, queue_root: str) -> DataFrame:
    """Streaming DataFrame of recovered text, one row per queued media ref.

    The source is the queue directory's published ``chunk-*`` dirs (the
    hidden ``.staging-*`` dirs are dot-prefixed, which Spark's file listing
    already ignores — the two-phase publish contract means a listed file is
    always part of a committed chunk)."""
    q = (
        spark.readStream.schema(QUEUE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        # default maxFileAge=7d silently DROPS files whose mtime is >7 days
        # older than the newest file seen (verified empirically) — and queue
        # entries legitimately arrive with old mtimes: maintain_ocr_queue
        # promotes a crashed writer's staging dir with its original file
        # mtimes, possibly long after newer chunks were published. The
        # checkpoint's seen-files map, not file age, is the dedup authority.
        .option("maxFileAge", "36500d")
        .parquet(f"{queue_root}/chunk-*")
    )
    refs = q.select(
        "doc_id", F.explode("media_refs").alias("media_ref")
    )
    return refs.mapInPandas(_ocr_batches, schema=OCR_TEXT_SCHEMA)


def start_ocr_stage(
    spark: SparkSession,
    queue_root: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Drain the OCR queue into the ``ocr_text`` table (availableNow), with
    exactly-once output via the parquet sink's transaction log."""
    return (
        ocr_results_stream(spark, queue_root)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merge_ocr_text(extracted: DataFrame, ocr_text: DataFrame) -> DataFrame:
    """Stage-3 of the P6 loop: fold recovered text back into the span
    sequence. Media spans whose ``media_ref`` has a row in the ``ocr_text``
    table get their empty ``text`` replaced by the recovered text; every
    other span — and every document with no OCR rows — passes through
    byte-identical, so the span-sequence contract (kinds, refs, offsets,
    reading order) is preserved exactly. Contract: duplicate recoveries
    for one (doc_id, media_ref) reduce deterministically (lexicographic
    max), so merged output is a pure function of the ocr_text table's
    CONTENTS, independent of row order or rerun history.

    Scale shape: the OCR results are rolled up to ONE map per document
    (``map_from_entries``) before joining, so the join key is doc_id — no
    explode/regroup of the 100 TB spans column, no shuffle keyed on
    media_ref (skewed: boilerplate images repeat), and the per-row merge is
    a single ``transform`` over the array. The join strategy is left to
    the optimizer deliberately: on digitally-born corpora the per-doc map
    side is tiny and AQE picks a broadcast join, but a scanned-heavy
    archive can route MOST docs to OCR, and a forced ``F.broadcast`` hint
    there would bypass autoBroadcastJoinThreshold and OOM the driver
    collecting the whole recovered-text corpus."""
    # Collapse to one row per (doc_id, media_ref) first: the same image
    # placed twice on a page yields two spans with one media_ref, and
    # duplicate map keys are an ANSI-mode error. Reduce with max(), NOT
    # dropDuplicates: when reruns of a real OCR engine append DIFFERENT
    # text for the same ref, dropDuplicates keeps an arbitrary row and the
    # merged corpus (and any export-zip bytes) becomes nondeterministic —
    # max() pins the contract to the lexicographically greatest recovery.
    per_doc = (
        ocr_text.groupBy("doc_id", "media_ref")
        .agg(F.max("ocr_text").alias("ocr_text"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("media_ref", "ocr_text"))
            ).alias("_ocr")
        )
    )
    merged = F.transform(
        "spans",
        lambda s: F.struct(
            s["kind"].alias("kind"),
            # ONE map probe per span: transform() runs interpreted outside
            # codegen with no guaranteed CSE (CLAUDE.md), so the
            # probe-in-condition + probe-in-value form would pay two map
            # lookups per span of the whole corpus
            F.coalesce(
                F.when(
                    s["kind"] == "media",
                    F.element_at("_ocr", s["media_ref"]),
                ),
                s["text"],
            ).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    cols = [c for c in extracted.columns if c != "spans"]
    return (
        extracted.join(per_doc, "doc_id", "left")
        .withColumn("spans", merged)
        .select("doc_id", "spans", *[c for c in cols if c != "doc_id"])
    )
