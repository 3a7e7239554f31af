"""Structured Streaming ingestion for the extraction pipeline.

The reference is batch-only (SURVEY.md §2.9: no watermarks/stateful ops
anywhere), but a 10^12-doc corpus is never static — new documents land
continuously. This module runs the SAME extraction kernel incrementally:

    readStream (file source over documents parquet)
      -> foreachBatch: salted repartition + mapInPandas extract
                       + CommitLog chunk commit (lineage rows included)

``foreachBatch`` rather than a streaming sink because the commit contract
(atomic marker after data+lineage parquet, spark/lineage.py) must hold for
streaming exactly as for batch — a killed stream resumes from the Spark
checkpoint AND the commit log, and replayed micro-batches are idempotent:
an already-committed epoch is skipped by epoch_id, so end-to-end this is
exactly-once into the commit log.

Event-time windowed metrics over the lineage stream (micro-batch counts
per window) come free from the batch lineage table; a watermarked example
lives in ``windowed_lineage_counts``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..spark.lineage import LINEAGE_COLS, CommitLog
from ..spark.pipeline import DOCUMENTS_SCHEMA, extract_documents


def stream_documents(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-source stream of documents(doc_id, spans) parquet drops."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def make_batch_processor(
    spark: SparkSession,
    log: CommitLog,
    base: int,
    n_parts: int = 64,
    num_partitions: int = 32,
    route_needs_ocr: bool = False,
):
    """foreachBatch callable: (batch_df, epoch_id) -> one committed chunk.

    chunk_id = base + epoch_id; if the chunk's commit marker already exists
    the epoch is a replay (same checkpoint, post-crash) and is skipped —
    the marker, not the Spark checkpoint, is the source of truth for what
    reached the table.

    ``route_needs_ocr``: documents whose extraction found text-free pages
    with images (the ``pages_empty_with_images`` score — scanned documents)
    are ALSO written to an ``ocr_queue/chunk-*`` side output with their
    pdf:// media refs, so a downstream OCR stage consumes the queue without
    rescanning the corpus (the reference's P6 force-OCR retry,
    docling_processor.py:235-239, as a routed pipeline stage). Derived from
    the just-written chunk — no recompute — and covered by the same atomic
    chunk marker, so replays stay idempotent for the queue too.
    """

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        chunk_id = base + int(epoch_id)
        marker = os.path.join(log.commits_dir, f"commit-{chunk_id:06d}.json")
        if os.path.exists(marker):  # replayed epoch after restart
            return
        extracted = extract_documents(
            batch_df, n_parts=n_parts, num_partitions=num_partitions
        )
        data_path = os.path.join(log.data_dir, f"chunk-{chunk_id:06d}")
        lineage_path = os.path.join(log.lineage_dir, f"chunk-{chunk_id:06d}")
        # same part_id-partitioned layout as the batch writer (lineage.py)
        extracted.write.partitionBy("part_id").mode("overwrite").parquet(data_path)

        written = spark.read.parquet(data_path)
        if route_needs_ocr:
            queue_path = os.path.join(
                os.path.dirname(log.data_dir.rstrip("/")),
                "ocr_queue",
                f"chunk-{chunk_id:06d}",
            )
            needs = F.coalesce(
                F.element_at("scores", "pages_empty_with_images"), F.lit(0.0)
            )
            (
                written.where(needs > 0)
                .select(
                    "doc_id",
                    needs.cast("int").alias("pages_needing_ocr"),
                    F.filter(
                        F.transform("spans", lambda s: s["media_ref"]),
                        lambda r: r.startswith("pdf://"),
                    ).alias("media_refs"),
                )
                .write.mode("overwrite")
                .parquet(queue_path)
            )
        lineage = (
            written.groupBy("part_id")
            .agg(
                F.count("*").alias("docs_done"),
                F.sum("pages_parsed").alias("pages_parsed"),
                F.sum("spans_emitted").alias("spans_emitted"),
                F.sum("parse_failures").alias("parse_failures"),
                F.sum("duration_ms").alias("duration_ms"),
            )
            .withColumn(
                "status",
                F.when(F.col("parse_failures") > 0, F.lit("error")).otherwise(
                    F.lit("success")
                ),
            )
            .withColumn("committed_at", F.current_timestamp())
            .select(LINEAGE_COLS)
        )
        lineage.write.mode("overwrite").parquet(lineage_path)
        agg = written.agg(
            F.count("*").alias("docs"), F.sum("parse_failures").alias("failures")
        ).collect()[0]
        part_ids = [r["part_id"] for r in written.select("part_id").distinct().collect()]
        # if_absent: chunk ids are epoch-derived, so a marker that appeared
        # since the top-of-batch check is a replay that already committed
        # identical data — losing that race is benign, not a conflict
        log.commit_chunk(
            chunk_id,
            part_ids,
            {"docs": agg["docs"], "failures": agg["failures"], "epoch": int(epoch_id)},
            if_absent=True,
        )

    return process_batch


def start_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    log: CommitLog,
    checkpoint_dir: str,
    n_parts: int = 64,
    num_partitions: int = 32,
    max_files_per_trigger: int = 4,
    route_needs_ocr: bool = False,
) -> StreamingQuery:
    """Incremental extraction: each micro-batch becomes one committed chunk.

    Chunk ids are derived from the epoch id (offset by any batch-mode chunks
    already present); an epoch whose marker already exists is skipped, which
    makes foreachBatch replays after a crash idempotent.
    """
    process_batch = make_batch_processor(
        spark, log, base=log.next_chunk_id(), n_parts=n_parts,
        num_partitions=num_partitions, route_needs_ocr=route_needs_ocr,
    )
    return (
        stream_documents(spark, input_dir, max_files_per_trigger)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_lineage_counts(lineage: DataFrame) -> DataFrame:
    """Tumbling event-time window over lineage commits (the A8 shape as a
    streaming-style windowed agg; watermark applies when fed a stream)."""
    src = lineage
    if lineage.isStreaming:
        src = lineage.withWatermark("committed_at", "10 minutes")
    return (
        src.groupBy(F.window("committed_at", "1 minute").alias("w"))
        .agg(
            F.sum("docs_done").alias("docs_done"),
            F.sum("parse_failures").alias("parse_failures"),
        )
        .select(F.col("w.start").alias("window_start"), "docs_done", "parse_failures")
    )
