"""Incremental derived quality-signals table over a committed extraction.

The second pass a curation pipeline runs after extraction: per-document
quality signals (token counts, marker-language prediction, stopword ratio,
Simpson lexical diversity, span-mix counters) computed from the COMMITTED
span table and written as a derived table through the same commit-marker
protocol — so the signals table is itself snapshot-visible, resumable, and
exactly-once.

Incrementality is the Iceberg-style consumer loop: each signals chunk's
marker records the SOURCE snapshot it consumed (``metrics.src_snapshot``);
the next run reads ``read_incremental(after=cursor, until=latest)`` — only
documents committed since the last run are recomputed. A killed run leaves
an unmarked (invisible, gc-able) chunk directory and the rerun reprocesses
the same delta under a fresh chunk id; the cursor only advances when the
marker flips.

Scope: APPEND-ONLY sources incrementally. A source partition-overwrite
(``reextract_parts``) changes history in place, and folding that into an
append-shaped delta would strand the untouched docs of the overwritten
parts — ``run_signals`` detects overwrite markers in the window and
refuses, directing the operator to ``rebuild=True`` (one full recompute
committed as an overwrite chunk owning every part, which shadows all prior
signals atomically).

Scale shape: the signal expressions are all JVM built-ins (zero Python),
map-only over the source scan — the only exchange is the writer's
``partitionBy(part_id)`` file layout. 100 TB is a chain of these runs, each
bounded by its delta size.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..ops.portable import tokens
from ..ops.textstats import STOPWORDS, lang_argmax, lang_marker_counts, simpson_pairs
from .lineage import CommitLog, RunReport, _chunk_dirname

# bump whenever compute_signals' semantics change: fixture caches (e.g. the
# signals_table oracle fixture) key on it so stale committed signals can
# never satisfy a check against new definitions
SIGNALS_COMPUTE_VERSION = 2

SIGNALS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n_text_spans", IntegerType()),
        StructField("n_media_spans", IntegerType()),
        StructField("n_tokens", LongType()),
        StructField("pred_lang", StringType()),
        StructField("stopword_micros", LongType()),
        StructField("simpson_micros", LongType()),
        StructField("part_id", IntegerType()),
    ]
)


def compute_signals(extracted: DataFrame) -> DataFrame:
    """Per-document signal columns over extracted rows (doc_id, spans,
    part_id, ...). Pure projection — no shuffle, no Python."""
    from ..ops.textstats import _count_in

    # SPACE-joined, not newline: trim() strips only spaces (both engines),
    # so a trailing empty span joined with "\n" would leave a separator
    # that split('\s+') turns into a phantom empty token
    text = F.array_join(
        F.transform(
            F.filter("spans", lambda s: s["kind"] == "text"), lambda s: s["text"]
        ),
        " ",
    )
    d = extracted.select(
        "doc_id",
        "part_id",
        F.size(F.filter("spans", lambda s: s["kind"] == "text"))
        .cast("int")
        .alias("n_text_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == "media"))
        .cast("int")
        .alias("n_media_spans"),
        # split('') is [''] — an empty doc must count 0 tokens, not 1
        F.when(F.length(F.trim(text)) == 0, F.lit(0))
        .otherwise(F.size(tokens(text)))
        .cast("bigint")
        .alias("n_tokens"),
        tokens(text).alias("_tok"),
    )
    d = d.select(
        "doc_id",
        "part_id",
        "n_text_spans",
        "n_media_spans",
        "n_tokens",
        _count_in(F.col("_tok"), STOPWORDS).alias("_n_stop"),
        simpson_pairs(F.col("_tok")).alias("_pairs"),
        *lang_marker_counts(F.col("_tok")),
    )
    return d.select(
        "doc_id",
        "n_text_spans",
        "n_media_spans",
        "n_tokens",
        F.when(F.col("n_tokens") > 0, lang_argmax())
        .otherwise(F.lit("unknown"))
        .alias("pred_lang"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr("_n_stop * 1000000 DIV n_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("stopword_micros"),
        F.when(
            F.col("n_tokens") >= 2,
            F.expr("_pairs * 1000000 DIV (n_tokens * (n_tokens - 1))"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("simpson_micros"),
        "part_id",
    )


def _signals_cursor(out_log: CommitLog) -> int | None:
    """Latest SOURCE snapshot any committed signals chunk consumed."""
    cursor = None
    for c in out_log.committed_chunks():
        src = (c.get("metrics") or {}).get("src_snapshot")
        if src is not None:
            cursor = src if cursor is None else max(cursor, src)
    return cursor


def _commit_signals_chunk(
    spark: SparkSession,
    out_log: CommitLog,
    sig: DataFrame,
    part_ids: list[int] | None,
    metrics: dict,
    n_parts: int | None,
    overwrite: bool = False,
) -> tuple[int, int, list[int]]:
    """Stage one signals chunk (append-mode write into the mkdir-reserved
    dir, exactly like lineage._write_chunk) and flip its marker."""
    chunk_id = out_log.reserve_chunk_id()
    data_path = os.path.join(out_log.data_dir, _chunk_dirname(chunk_id))
    sig.write.partitionBy("part_id").mode("append").parquet(data_path)
    written = spark.read.schema(SIGNALS_SCHEMA).parquet(data_path)
    rollup = written.groupBy("part_id").agg(F.count("*").alias("n")).collect()
    n_docs = int(sum(r["n"] for r in rollup))
    touched = sorted(r["part_id"] for r in rollup)
    out_log.commit_chunk(
        chunk_id,
        part_ids if part_ids is not None else touched,
        {**metrics, "docs": n_docs, "stage": "signals"},
        n_parts=n_parts,
        overwrite=overwrite,
    )
    return chunk_id, n_docs, touched


def run_signals(
    spark: SparkSession,
    src_log: CommitLog,
    out_log: CommitLog,
    rebuild: bool = False,
) -> RunReport:
    """One incremental signals pass: consume the source snapshots committed
    since the cursor, or (``rebuild=True``) recompute everything as one
    overwrite chunk."""
    src_chunks = src_log.committed_chunks()  # commit order
    if not src_chunks:
        return RunReport(0, 0, 0, 0)
    latest = src_chunks[-1]["chunk_id"]
    n_parts = src_log.n_parts()

    if rebuild:
        sig = compute_signals(src_log.read_extracted(spark))
        all_parts = sorted(src_log.committed_part_ids())
        _, n_docs, _ = _commit_signals_chunk(
            spark,
            out_log,
            sig,
            all_parts,
            {"src_snapshot": latest, "rebuild": True},
            n_parts,
            overwrite=True,
        )
        return RunReport(1, len(all_parts), n_docs, 0)

    cursor = _signals_cursor(out_log)
    if cursor == latest:
        return RunReport(0, 0, 0, 0)
    # window = markers that read_incremental will include; refuse overwrites
    lo = next((c for c in src_chunks if c["chunk_id"] == cursor), None)

    def _after_cursor(c) -> bool:
        if c.get("replaces"):
            return False
        if lo is not None:
            return CommitLog._commit_order(c) > CommitLog._commit_order(lo)
        return cursor is None or c["chunk_id"] > cursor

    window = [c for c in src_chunks if _after_cursor(c)]
    if not window:
        return RunReport(0, 0, 0, 0)
    if any(c.get("overwrite") for c in window):
        raise ValueError(
            "source window contains a partition overwrite; an append-shaped "
            "delta would strand the untouched docs of the overwritten parts "
            "— run with rebuild=True (job.py --signals --rebuild)"
        )
    delta = src_log.read_incremental(
        spark, after=cursor if cursor is not None else -1, until=latest
    )
    sig = compute_signals(delta)
    _, n_docs, touched = _commit_signals_chunk(
        spark, out_log, sig, None, {"src_snapshot": latest}, n_parts
    )
    return RunReport(1, len(touched), n_docs, 0)


def read_signals(
    spark: SparkSession, out_log: CommitLog, as_of: int | None = None
) -> DataFrame:
    return out_log.read_table(spark, SIGNALS_SCHEMA, as_of=as_of)


def run_signals_job(
    spark: SparkSession, src_root: str, out_root: str, rebuild: bool = False
) -> tuple[RunReport, float]:
    t0 = time.monotonic()
    report = run_signals(
        spark, CommitLog(src_root), CommitLog(out_root), rebuild=rebuild
    )
    return report, time.monotonic() - t0
