"""Materialized training contexts: the packed BYTES, not just placements.

The fifth derived stage completes the extract -> signals -> curate ->
neardup -> pack chain with the artifact a trainer actually reads: for
every 512-token context the pack stage placed, the assembled context
text (space-joined tokens drawn across its contributing documents in
stream order). ``spark/pack.py`` commits each document's PLACEMENT; this
stage runs the per-context GATHER join (the ``ops/training.q_pack_slices``
explode + a doc_id-keyed text join + ONE ctx-keyed exchange) and commits
(pack_epoch, ctx, n_docs, n_tokens, text) rows through the same
commit-marker protocol — snapshot-visible, crash-resumable, exactly-once.

This is the first DERIVED-ON-DERIVED stage: its source CommitLog is the
PACK table, consumed through the shared incremental cursor
(``run_derived_stage(src_schema=PACKED_SCHEMA)``), so each pack window's
placements materialize exactly once and a pack REBUILD (an overwrite
chunk) trips the generic append-window guard — rerun with
``--materialize --rebuild``.

**Document text is read AS OF each window's pack_epoch.** A placement's
token offsets were computed against the extraction snapshot its pack
marker recorded (``pack_epoch`` = the pack run's ``src_snapshot``);
reading "latest" text instead would silently assemble shifted slices if
an extraction partition-overwrite landed between the pack run and this
one. Time travel pins the exact bytes the placement arithmetic saw, so
``sum(slice lengths) == n_tokens`` holds by construction. The distinct
epochs of a window are a bounded driver-side collect (one per consumed
pack chunk — the per-chunk lineage-rollup precedent).

Output ``part_id`` is ``ctx % n_parts`` (contexts belong to no source
document part), which is why the rebuild path passes
``rebuild_all_parts=True``: the overwrite must own the full part range,
not the source chunks' part union, or a shrunken kept-scope rebuild
would leave stale context rows visible in parts it no longer touches.

Scale shape: placements are window-bounded; the text join is one
doc_id-keyed shuffle against a snapshot-pinned pruned scan (doc_id +
spans only); the slice explode is map-only; the gather is one
(pack_epoch, ctx)-keyed exchange whose per-group state is bounded by
CTX_TOKENS regardless of corpus size. No global ordering stage, no
driver-side assembly, no per-row Python.

Reference parity: the reference's analogous end product writes actual
per-document content (app/processor/pymu_tesseract_processor.py:104-117
saves extracted markdown per doc); contexts-for-training is the SURVEY
§2.4 "beyond reference" sibling — a pipeline ultimately ships bytes, not
placements.
"""

from __future__ import annotations

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
from ..ops.training import CTX_TOKENS
from .derived import run_derived_stage
from .lineage import CommitLog, RunReport
from .pack import PACKED_SCHEMA
from .signals import signal_text

# bump whenever compute_materialize's semantics change
MATERIALIZE_COMPUTE_VERSION = 1

MATERIALIZED_SCHEMA = StructType(
    [
        StructField("pack_epoch", LongType(), False),
        StructField("ctx", LongType(), False),
        StructField("n_docs", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("text", StringType(), False),
        StructField("part_id", IntegerType()),
    ]
)


def _epoch_texts(
    spark: SparkSession,
    extract_log: CommitLog,
    epochs: list[int],
    cost: str = "ws",
    rules: list[str] | None = None,
) -> DataFrame:
    """(pack_epoch, doc_id, _tok) cost-unit arrays, each epoch's text
    read AS OF that extraction snapshot (see module docstring).
    ``cost='ws'``: whitespace-token arrays (JVM split). ``cost='bpe'``:
    the ordered tokenizer-PIECE stream under the pack table's recorded
    merge rules (map-only Arrow kernel) — placements of a piece-costed
    table index exactly this stream, so the gather slices it."""
    out = None
    for e in sorted(epochs):
        t = (
            extract_log.read_extracted(spark, as_of=e)
            .select("doc_id", signal_text().alias("_text"))
            .select(
                F.lit(e).cast("bigint").alias("pack_epoch"),
                "doc_id",
                F.col("_text"),
            )
        )
        out = t if out is None else out.unionByName(t)
    if cost == "bpe":
        from ..ops.textstats import bpe_pieces_batches

        return out.select(
            "pack_epoch", "doc_id", F.col("_text").alias("text")
        ).mapInArrow(
            bpe_pieces_batches(rules),
            schema="pack_epoch bigint, doc_id string, _tok array<string>",
        )
    return out.select(
        "pack_epoch", "doc_id", tokens(F.col("_text")).alias("_tok")
    )


def compute_materialize(
    spark: SparkSession,
    extract_log: CommitLog,
    placements: DataFrame,
    n_parts: int,
    cost: str = "ws",
    rules: list[str] | None = None,
) -> DataFrame:
    """Gather join over a set of placement rows: explode each placement to
    its (ctx, slice) contributions (the pack_slices arithmetic), slice the
    doc's token array, and assemble each context ordered by off_in_ctx.
    Exact-output convention (CLAUDE.md): ordered concat via
    ``array_sort(collect_list(struct(...)))``, mirrored by the oracle's
    ``string_agg(... ORDER BY off_in_ctx)``."""
    epochs = [
        r["pack_epoch"]
        for r in placements.select("pack_epoch").distinct().collect()
    ]
    if not epochs:
        return spark.createDataFrame([], MATERIALIZED_SCHEMA)
    toks = _epoch_texts(spark, extract_log, epochs, cost=cost, rules=rules)
    sl = (
        placements.select("pack_epoch", "doc_id", "n_tokens", "start_off")
        .join(toks, ["pack_epoch", "doc_id"])
        .select(
            "pack_epoch",
            "_tok",
            "start_off",
            "n_tokens",
            F.explode(
                F.sequence(
                    F.expr(f"start_off div {CTX_TOKENS}"),
                    F.expr(f"(start_off + n_tokens - 1) div {CTX_TOKENS}"),
                )
            ).alias("ctx"),
        )
        .select(
            "pack_epoch",
            "ctx",
            F.expr(
                f"greatest(start_off, ctx * {CTX_TOKENS}) - ctx * {CTX_TOKENS}"
            ).alias("off_in_ctx"),
            F.expr(
                f"least(start_off + n_tokens, (ctx + 1) * {CTX_TOKENS})"
                f" - greatest(start_off, ctx * {CTX_TOKENS})"
            ).alias("n_toks"),
            F.expr(
                f"slice(_tok, int(greatest(start_off, ctx * {CTX_TOKENS})"
                f" - start_off) + 1, int(least(start_off + n_tokens,"
                f" (ctx + 1) * {CTX_TOKENS})"
                f" - greatest(start_off, ctx * {CTX_TOKENS})))"
            ).alias("_piece"),
        )
    )
    return (
        sl.groupBy("pack_epoch", "ctx")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("off_in_ctx", "_piece"))
                        ),
                        lambda s: s["_piece"],
                    )
                ),
                " ",
            ).alias("text"),
        )
        .select(
            "pack_epoch",
            "ctx",
            "n_docs",
            "n_tokens",
            "text",
            F.expr(f"int(ctx % {n_parts})").alias("part_id"),
        )
    )


def run_materialize(
    spark: SparkSession,
    extract_log: CommitLog,
    pack_log: CommitLog,
    out_log: CommitLog,
    rebuild: bool = False,
) -> RunReport:
    n_parts = pack_log.n_parts()
    if n_parts is None:
        return RunReport(0, 0, 0, 0)
    from .pack import table_cost

    pack_cost, pack_rules = table_cost(pack_log)
    pack_cost = pack_cost or "ws"
    if pack_cost not in ("ws", "bpe"):
        raise ValueError(
            f"unknown pack-table cost model {pack_cost!r}; this "
            "materializer gathers 'ws' word streams or 'bpe' piece "
            "streams"
        )
    if pack_cost == "bpe" and not pack_rules:
        raise ValueError(
            "pack table is bpe-costed but records no merge rules; "
            "cannot reconstruct the piece stream its offsets index"
        )

    def _compute(placements: DataFrame) -> DataFrame:
        # the gather slices the SAME stream the placements were costed
        # against: word arrays for 'ws', the recorded-rules piece stream
        # for 'bpe' — a mismatched gather would assemble wrong slices
        return compute_materialize(
            spark, extract_log, placements, n_parts,
            cost=pack_cost, rules=pack_rules,
        )

    return run_derived_stage(
        spark,
        pack_log,
        out_log,
        MATERIALIZED_SCHEMA,
        "materialize",
        _compute,
        rebuild=rebuild,
        src_schema=PACKED_SCHEMA,
        rebuild_all_parts=True,
        extra_metrics={"materialize_version": MATERIALIZE_COMPUTE_VERSION,
                       "cost": pack_cost},
    )


def read_materialized(
    spark: SparkSession, out_log: CommitLog, as_of: int | None = None
) -> DataFrame:
    return out_log.read_table(spark, MATERIALIZED_SCHEMA, as_of=as_of)


def run_materialize_job(
    spark: SparkSession,
    extract_root: str,
    pack_root: str,
    out_root: str,
    rebuild: bool = False,
) -> tuple[RunReport, float]:
    t0 = time.monotonic()
    report = run_materialize(
        spark,
        CommitLog(extract_root),
        CommitLog(pack_root),
        CommitLog(out_root),
        rebuild=rebuild,
    )
    return report, time.monotonic() - t0
