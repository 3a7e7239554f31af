"""Shared incremental consumer loop for DERIVED tables over a CommitLog.

Every post-extraction stage (signals, curation verdicts, ...) has the same
shape: read the SOURCE snapshots committed since this stage's cursor,
compute a per-document projection/verdict over exactly that delta, and
commit the result as one chunk of the stage's OWN CommitLog table — with
the consumed source snapshot recorded in the marker (``metrics.
src_snapshot``) so the cursor survives crashes for free. This module is
that loop, factored once; ``spark/signals.py`` and ``spark/curate.py`` are
instances.

Semantics pinned here (stage modules inherit them):

- **Cursor** = max ``src_snapshot`` over the stage table's committed
  markers. A killed run leaves an unmarked (invisible, gc-able) chunk dir;
  the rerun reprocesses the same delta under a fresh chunk id and the
  cursor advances only when the marker flips — exactly-once at snapshot
  granularity.
- **Append-only windows.** A source partition-overwrite changes history in
  place; folding it into an append-shaped delta would strand the untouched
  docs of the overwritten parts. The loop refuses (``ValueError``) and the
  operator reruns with ``rebuild=True`` — one full recompute committed as
  an overwrite chunk owning every part, atomically shadowing prior output.
- **Commit-order horizon.** The window is markers strictly after the
  cursor's marker in COMMIT order (not chunk-id order): under concurrent
  source writers a low chunk id can commit late and an id-cursor would
  skip it forever.

Scale shape: each run is bounded by its delta, the compute is whatever the
stage's ``compute`` closure builds (signals/curate keep it map-only plus
at most one digest-keyed exchange), and the only required shuffle is the
writer's ``partitionBy(part_id)`` file layout. 100 TB is a chain of these
runs.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .lineage import CommitLog, RunReport, _chunk_dirname


def latest_metric(markers: list[dict], key: str):
    """Last non-null ``metrics[key]`` over an already-parsed
    committed-marker list, in COMMIT order. Every stage-table property
    recovered from markers (the cursor's ``src_snapshot``, neardup/pack's
    ``scope``, curate's ``gates``) derives through this one scan, so the
    commit-order-not-id-order semantics (see :func:`derived_cursor`) can
    never drift between them."""
    out = None
    for c in markers:
        v = (c.get("metrics") or {}).get(key)
        if v is not None:
            out = v
    return out


def _cursor_of(markers: list[dict]) -> int | None:
    """Cursor from an already-parsed committed-marker list (commit order)."""
    return latest_metric(markers, "src_snapshot")


def derived_cursor(out_log: CommitLog) -> int | None:
    """Source snapshot consumed by the stage's LAST committed chunk.

    Last in COMMIT order, never the numeric max: after a late-committed low
    source chunk id is consumed (window semantics below), the stage's newest
    marker legitimately records a src_snapshot LOWER than an earlier
    marker's. A numeric-max cursor would rewind to the old horizon and
    re-consume that late chunk on every subsequent run, committing duplicate
    derived rows forever. The newest marker's src_snapshot IS the horizon the
    last run read up to — ``incremental_window`` anchors on it in source
    commit order, so nothing before it is ever re-read and nothing after it
    is skipped."""
    return _cursor_of(out_log.committed_chunks())


def commit_derived_chunk(
    spark: SparkSession,
    out_log: CommitLog,
    df: DataFrame,
    schema: StructType,
    stage: str,
    part_ids: list[int] | None,
    metrics: dict,
    n_parts: int | None,
    overwrite: bool = False,
    validate=None,
) -> tuple[int, int, list[int]]:
    """Stage one derived chunk (append-mode write into the mkdir-reserved
    dir, exactly like lineage._write_chunk) and flip its marker.
    ``validate`` runs under the commit lock (see CommitLog.commit_chunk)."""
    chunk_id = out_log.reserve_chunk_id()
    data_path = os.path.join(out_log.data_dir, _chunk_dirname(chunk_id))
    df.write.partitionBy("part_id").mode("append").parquet(data_path)
    written = spark.read.schema(schema).parquet(data_path)
    rollup = written.groupBy("part_id").agg(F.count("*").alias("n")).collect()
    n_docs = int(sum(r["n"] for r in rollup))
    touched = sorted(r["part_id"] for r in rollup)
    out_log.commit_chunk(
        chunk_id,
        part_ids if part_ids is not None else touched,
        {**metrics, "docs": n_docs, "stage": stage},
        n_parts=n_parts,
        overwrite=overwrite,
        validate=validate,
        expect_data=True,
    )
    return chunk_id, n_docs, touched


def run_derived_stage(
    spark: SparkSession,
    src_log: CommitLog,
    out_log: CommitLog,
    schema: StructType,
    stage: str,
    compute: Callable[[DataFrame], DataFrame],
    rebuild: bool = False,
    rebuild_compute: Callable[[DataFrame], DataFrame] | None = None,
    extra_metrics: dict | None = None,
    src_schema: StructType | None = None,
    rebuild_all_parts: bool = False,
) -> RunReport:
    """One incremental pass of a derived stage: consume the source
    snapshots committed since the cursor, or (``rebuild=True``) recompute
    everything as one overwrite chunk.

    ``src_schema`` names the SOURCE table's row shape when the source is
    itself a derived table (materialize consumes the pack table); default
    is the extraction schema. The cursor/window/overwrite semantics are
    schema-independent — derived-on-derived chains inherit them whole.

    ``rebuild_all_parts``: a rebuild's overwrite marker normally owns the
    union of the SOURCE chunks' part_ids — correct when output rows keep
    their source doc's part_id (signals/curate/neardup/pack). A stage
    whose output is keyed on something ELSE (materialize's contexts land
    on ``ctx % n_parts``) must own the FULL part range instead: an
    overwrite shadows prior chunks only for the parts it lists, and a
    shrunken rebuild (kept scope) could otherwise leave stale context
    rows visible in parts its own output no longer touches.

    ``compute`` maps the DELTA extraction rows to the stage's schema;
    ``rebuild_compute`` (default: ``compute``) maps the FULL table — a
    stage whose incremental path consults its own prior output (e.g.
    curate's kept-digest index) passes a self-contained variant here.

    Either callable may declare a parameter NAMED ``horizon`` to receive
    the window horizon (the source snapshot id this run consumes up to —
    the same value the marker records as ``src_snapshot``): a stage whose
    output rows must carry a window tag (e.g. pack's ``pack_epoch``)
    takes it here rather than re-listing the source itself, which would
    race a concurrent source commit and tag rows with a horizon the
    marker does not record. Opt-in is BY NAME, not arity — stage computes
    may carry unrelated optional parameters (signals' ``extra``).

    Frames a stage's compute persists via ``ops/dedup._persisted``
    (neardup's shingle/candidate tables, pack's sharded prefix-sum frame)
    are fully consumed by the commit write, so they are released HERE,
    scoped to the frames THIS call staged — on the job path (``job.py
    --neardup/--pack``, a long-lived session chaining incremental runs)
    nothing else ever releases them, and leaking one pinned
    InMemoryRelation per window grows executor storage without bound.
    """
    from ..ops.dedup import _DF_CACHE

    mark = len(_DF_CACHE)
    try:
        return _run_derived_stage(
            spark,
            src_log,
            out_log,
            schema,
            stage,
            compute,
            rebuild=rebuild,
            rebuild_compute=rebuild_compute,
            extra_metrics=extra_metrics,
            src_schema=src_schema,
            rebuild_all_parts=rebuild_all_parts,
        )
    finally:
        while len(_DF_CACHE) > mark:
            _DF_CACHE.pop().unpersist()


def _run_derived_stage(
    spark: SparkSession,
    src_log: CommitLog,
    out_log: CommitLog,
    schema: StructType,
    stage: str,
    compute: Callable[[DataFrame], DataFrame],
    rebuild: bool = False,
    rebuild_compute: Callable[[DataFrame], DataFrame] | None = None,
    extra_metrics: dict | None = None,
    src_schema: StructType | None = None,
    rebuild_all_parts: bool = False,
) -> RunReport:
    import inspect

    def _call(fn: Callable, df: DataFrame, horizon: int) -> DataFrame:
        if "horizon" in inspect.signature(fn).parameters:
            return fn(df, horizon=horizon)
        return fn(df)

    src_chunks = src_log.committed_chunks()  # commit order; reused below
    if not src_chunks:
        return RunReport(0, 0, 0, 0)
    latest = src_chunks[-1]["chunk_id"]
    n_parts = src_log.n_parts(chunks=src_chunks)

    if rebuild:
        # markers=src_chunks pins the read to the SAME snapshot `latest`
        # names: a source chunk committed between the listing above and the
        # read would otherwise be folded into the rebuild output but not
        # into the recorded cursor, so the next incremental run would
        # consume it AGAIN — two derived rows per doc, and the earlier
        # rebuild overwrite cannot shadow the later duplicate append
        src_full = (
            src_log.read_extracted(spark, markers=src_chunks)
            if src_schema is None
            else src_log.read_table(spark, src_schema, markers=src_chunks)
        )
        out = _call(rebuild_compute or compute, src_full, latest)
        all_parts = (
            list(range(n_parts))
            if rebuild_all_parts and n_parts is not None
            else sorted({p for c in src_chunks for p in c["part_ids"]})
        )
        _, n_docs, _ = commit_derived_chunk(
            spark,
            out_log,
            out,
            schema,
            stage,
            all_parts,
            {**(extra_metrics or {}), "src_snapshot": latest, "rebuild": True},
            n_parts,
            overwrite=True,
        )
        return RunReport(1, len(all_parts), n_docs, 0)

    cursor = derived_cursor(out_log)
    if cursor == latest:
        return RunReport(0, 0, 0, 0)
    # THE window definition lives on CommitLog (shared with the scan that
    # reads it, so the overwrite guard below can never drift from what
    # read_incremental actually returns). The horizon is pinned by
    # chunks=src_chunks — ONE marker listing feeds `latest`, the window,
    # and the read, so a source chunk committing mid-run can appear in
    # none of them or all of them, never a mix.
    window = src_log.incremental_window(cursor, chunks=src_chunks)
    if not window:
        return RunReport(0, 0, 0, 0)
    if any(c.get("overwrite") for c in window):
        raise ValueError(
            "source window contains a partition overwrite; an append-shaped "
            "delta would strand the untouched docs of the overwritten parts "
            f"— run with rebuild=True (job.py --{stage} --rebuild)"
        )
    # a compaction + expire_replaced while this stage lagged deletes the
    # window chunks' DATA while their markers survive — the chunk-pruned
    # scan would then silently read EMPTY and the cursor would advance past
    # the lost history (the same silent-empty class the legacy-layout guard
    # catches); existence-check the bytes the window promises
    reclaimed = [
        c["chunk_id"]
        for c in window
        if not os.path.isdir(
            os.path.join(src_log.data_dir, _chunk_dirname(c["chunk_id"]))
        )
    ]
    if reclaimed:
        raise ValueError(
            f"source chunks {reclaimed} in the incremental window have no "
            "data on disk (compacted and expired while this stage lagged); "
            "the delta cannot be reconstructed incrementally — run with "
            f"rebuild=True (job.py --{stage} --rebuild)"
        )
    delta = src_log.read_incremental(
        spark,
        after=cursor if cursor is not None else -1,
        window=window,
        schema=src_schema,
    )
    out = _call(compute, delta, latest)

    def _cursor_unmoved(committed: list[dict]) -> None:
        # optimistic concurrency, checked under the commit lock: a rival
        # run of this stage that committed since we read the cursor has
        # already consumed (some prefix of) this window — publishing ours
        # too would duplicate every doc's derived row
        from .lineage import CommitConflict

        now = _cursor_of(committed)
        if now != cursor:
            raise CommitConflict(
                f"stage {stage} cursor moved {cursor} -> {now} under a "
                "concurrent run; not publishing a duplicate window"
            )

    _, n_docs, touched = commit_derived_chunk(
        spark,
        out_log,
        out,
        schema,
        stage,
        None,
        {**(extra_metrics or {}), "src_snapshot": latest},
        n_parts,
        validate=_cursor_unmoved,
    )
    return RunReport(1, len(touched), n_docs, 0)


def run_derived_job(
    spark: SparkSession,
    src_root: str,
    out_root: str,
    schema: StructType,
    stage: str,
    compute,
    rebuild: bool = False,
    rebuild_compute=None,
) -> tuple[RunReport, float]:
    t0 = time.monotonic()
    report = run_derived_stage(
        spark,
        CommitLog(src_root),
        CommitLog(out_root),
        schema,
        stage,
        compute,
        rebuild=rebuild,
        rebuild_compute=rebuild_compute,
    )
    return report, time.monotonic() - t0
