"""Stateful streaming dedup: first-seen survives, later duplicates are
suppressed by per-key state — across micro-batches AND across query
restarts (state recovered from the checkpoint)."""

from pdf_extractor_spark.streaming.dedup_state import content_keyed, first_seen_dedup
from pdf_extractor_spark.spark.pipeline import DOCUMENTS_SCHEMA

from tests.test_streaming import _write_drop


def _doc(doc_id: str, text: str) -> dict:
    return {
        "doc_id": doc_id,
        "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
    }


def _run_stream(spark, landing, ckpt, out_dir):
    docs = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per drop file
        .parquet(str(landing))
    )
    q = (
        first_seen_dedup(content_keyed(docs))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        r["content_key"]: (r["doc_id"], r["n_batch_dups"])
        for r in spark.read.parquet(str(out_dir)).collect()
    }


def test_first_seen_dedup_across_batches_and_restarts(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    out_dir = tmp_path / "out"

    # batch 0: X twice (in-batch dup), Y once; batch 1: X again (cross-batch
    # dup -> must be suppressed by state), Z once
    _write_drop(spark, [_doc("a2", "X"), _doc("a1", "X"), _doc("b1", "Y")],
                str(landing / "drop-0.parquet"))
    _write_drop(spark, [_doc("a3", "X"), _doc("c1", "Z")],
                str(landing / "drop-1.parquet"))
    # the file source orders same-mtime files nondeterministically (fs
    # timestamp granularity); pin strictly increasing mtimes so drop-0 is
    # batch 0 — the test is about state, not discovery order
    import os as _os
    import time as _time

    now = _time.time()
    _os.utime(landing / "drop-0.parquet", (now - 20, now - 20))
    _os.utime(landing / "drop-1.parquet", (now - 10, now - 10))

    out = _run_stream(spark, landing, ckpt, out_dir)
    survivors = {doc for doc, _ in out.values()}
    assert survivors == {"a1", "b1", "c1"}  # a1 < a2 within batch; a3 dropped
    dups_by_doc = {doc: n for doc, n in out.values()}
    assert dups_by_doc["a1"] == 1  # a2 was its in-batch duplicate
    assert dups_by_doc["b1"] == 0 and dups_by_doc["c1"] == 0

    # restart with a new drop: another X (suppressed via RECOVERED state,
    # not merely in-memory state) plus brand-new W
    _write_drop(spark, [_doc("a4", "X"), _doc("d1", "W")],
                str(landing / "drop-2.parquet"))
    out2 = _run_stream(spark, landing, ckpt, out_dir)
    assert len(out2) == len(out) + 1  # exactly one new key: W
    new_docs = {doc for doc, _ in out2.values()} - survivors
    assert new_docs == {"d1"}


def test_state_store_backends_equivalent(spark, tmp_path):
    """The RocksDB state-store toggle (streaming/statestore.py): the same
    first-seen dedup over a key space big enough to matter (5k distinct
    content keys, duplicated across two micro-batches) yields IDENTICAL
    results on the default HDFS-backed store and on RocksDB — including
    cross-restart state recovery — and each checkpoint really carries its
    backend's format (.delta files vs RocksDB .zip/SST uploads), proving
    the toggle took effect rather than silently defaulting."""
    import glob
    import os as _os
    import time as _time

    from pdf_extractor_spark.streaming.statestore import state_store

    n_keys = 5000
    batch0 = [_doc(f"a-{k:05d}", f"K{k % n_keys}") for k in range(n_keys)]
    # batch 1: every key again (cross-batch dups) plus 500 fresh keys
    batch1 = [_doc(f"b-{k:05d}", f"K{k}") for k in range(n_keys + 500)]

    results = {}
    for backend in ("hdfs", "rocksdb"):
        landing = tmp_path / backend / "landing"
        landing.mkdir(parents=True)
        ckpt = tmp_path / backend / "ckpt"
        out_dir = tmp_path / backend / "out"
        _write_drop(spark, batch0, str(landing / "drop-0.parquet"))
        _write_drop(spark, batch1, str(landing / "drop-1.parquet"))
        now = _time.time()
        _os.utime(landing / "drop-0.parquet", (now - 20, now - 20))
        _os.utime(landing / "drop-1.parquet", (now - 10, now - 10))

        with state_store(spark, backend):
            out = _run_stream(spark, landing, ckpt, out_dir)
            # restart against the same checkpoint: recovered state must
            # suppress every already-seen key
            _write_drop(spark, [_doc("c-0", "K0"), _doc("c-1", "FRESH")],
                        str(landing / "drop-2.parquet"))
            out2 = _run_stream(spark, landing, ckpt, out_dir)
        assert len(out) == n_keys + 500
        assert len(out2) == len(out) + 1  # only FRESH is new
        results[backend] = out2

        state_files = glob.glob(str(ckpt / "state" / "**" / "*"), recursive=True)
        has_delta = any(f.endswith(".delta") for f in state_files)
        # snapshot uploads (.zip/.sst) or, with changelog checkpointing
        # enabled (our rocksdb setting), per-batch .changelog uploads
        has_rocks = any(
            f.endswith((".zip", ".sst", ".changelog")) for f in state_files
        )
        if backend == "hdfs":
            assert has_delta and not has_rocks, state_files[:10]
        else:
            assert has_rocks and not has_delta, state_files[:10]

    assert results["hdfs"] == results["rocksdb"]
