"""Streaming admission quota (cross-batch, restart-safe) and event-time
session windows (batch/stream plan equivalence)."""

import os
import time

import pandas as pd

from pdf_extractor_spark.streaming.quota import source_quota
from pdf_extractor_spark.streaming.windows import session_window_counts


def _write_docs_drop(rows, path):
    pd.DataFrame(rows, columns=["source", "doc_id"]).to_parquet(path)


def _run_quota(spark, landing, ckpt, out_dir, cap):
    docs = (
        spark.readStream.schema("source string, doc_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        source_quota(docs, cap=cap)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sorted(
        (r["source"], r["doc_id"], r["admit_rank"])
        for r in spark.read.parquet(str(out_dir)).collect()
    )


def test_source_quota_across_batches_and_restarts(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()

    # batch 0: web has 3 docs (cap 4 -> all admitted), books has 1
    _write_docs_drop(
        [("web", "w2"), ("web", "w1"), ("web", "w3"), ("books", "b1")],
        str(landing / "drop-0.parquet"),
    )
    # batch 1: web has 3 more -> only 1 more fits; books fine
    _write_docs_drop(
        [("web", "w5"), ("web", "w4"), ("web", "w6"), ("books", "b2")],
        str(landing / "drop-1.parquet"),
    )
    now = time.time()
    os.utime(landing / "drop-0.parquet", (now - 20, now - 20))
    os.utime(landing / "drop-1.parquet", (now - 10, now - 10))

    out = _run_quota(spark, landing, tmp_path / "ckpt", tmp_path / "out", cap=4)
    assert out == [
        ("books", "b1", 1),
        ("books", "b2", 2),
        ("web", "w1", 1),
        ("web", "w2", 2),
        ("web", "w3", 3),
        ("web", "w4", 4),  # doc_id order within batch; w5/w6 rejected
    ]

    # restart: web is at cap (recovered state), books still has room
    _write_docs_drop(
        [("web", "w7"), ("books", "b3")], str(landing / "drop-2.parquet")
    )
    out2 = _run_quota(spark, landing, tmp_path / "ckpt", tmp_path / "out", cap=4)
    assert ("books", "b3", 3) in out2
    assert not any(d == "w7" for _, d, _r in out2)
    assert len(out2) == 7


def test_session_window_counts_stream_matches_batch(spark, tmp_path):
    """The same declarative session-window plan must produce identical
    results incrementally (streaming, stateful) and one-shot (batch)."""
    from datetime import datetime, timezone

    # tz-aware UTC instants on BOTH sides: watermarks demand TIMESTAMP (LTZ),
    # and naive datetimes would be read in the (uncontrolled) session zone
    def ev(uid, minute):
        return {"ts": datetime(2026, 1, 1, 10, minute, tzinfo=timezone.utc), "user_id": uid}

    # user 1: two sessions (gap > 30 min); user 2: one session
    rows0 = [ev(1, 0), ev(1, 10), ev(2, 5)]
    rows1 = [ev(1, 50), ev(2, 20)]
    landing = tmp_path / "landing"
    landing.mkdir()

    def write(rows, path):  # tz-aware microsecond timestamps
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us", tz="UTC")),
                    "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
                }
            ),
            path,
        )

    write(rows0, str(landing / "drop-0.parquet"))
    write(rows1, str(landing / "drop-1.parquet"))
    now = time.time()
    os.utime(landing / "drop-0.parquet", (now - 20, now - 20))
    os.utime(landing / "drop-1.parquet", (now - 10, now - 10))

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        session_window_counts(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    )
    batch_df = spark.createDataFrame(
        pd.DataFrame(rows0 + rows1), schema="ts timestamp, user_id long"
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_window_counts(batch_df).collect()
    )
    assert got == want
    assert len(got) == 3  # user 1 splits at the >30-min gap
    by_user = {}
    for u, *_rest in got:
        by_user[u] = by_user.get(u, 0) + 1
    assert by_user == {1: 2, 2: 1}
