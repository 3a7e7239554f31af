"""Watermarked stream-stream join: in-window labels enrich their document,
out-of-window labels never match, and the streaming result equals the
same declarative join run as a batch."""

import os
import time
from datetime import datetime, timezone


def _write(rows, cols, types, path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({c: pa.array([r[i] for r in rows], t) for i, (c, t) in enumerate(zip(cols, types))}),
        path,
    )


def _ts(minute):
    return datetime(2026, 1, 1, 12, minute, tzinfo=timezone.utc)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    import pyarrow as pa

    from pdf_extractor_spark.streaming.joins import enrich_with_labels

    tsu = pa.timestamp("us", tz="UTC")
    docs_dir = tmp_path / "docs"
    labels_dir = tmp_path / "labels"
    docs_dir.mkdir()
    labels_dir.mkdir()

    # d1's label arrives 5 min later (within the 15-min lag budget);
    # d2's label arrives 20 min later (outside -> must NOT match);
    # d3 never gets a label
    docs = [(_ts(0), "d1"), (_ts(0), "d2"), (_ts(1), "d3")]
    labels = [(_ts(5), "d1", "clean"), (_ts(20), "d2", "late")]
    _write(docs, ["doc_ts", "doc_id"], [tsu, pa.string()], str(docs_dir / "a.parquet"))
    _write(
        labels,
        ["label_ts", "doc_id", "label"],
        [tsu, pa.string(), pa.string()],
        str(labels_dir / "a.parquet"),
    )
    now = time.time()
    os.utime(docs_dir / "a.parquet", (now - 20, now - 20))
    os.utime(labels_dir / "a.parquet", (now - 10, now - 10))

    d_stream = spark.readStream.schema("doc_ts timestamp, doc_id string").parquet(
        str(docs_dir)
    )
    l_stream = spark.readStream.schema(
        "label_ts timestamp, doc_id string, label string"
    ).parquet(str(labels_dir))
    out_dir = tmp_path / "out"
    q = (
        enrich_with_labels(d_stream, l_stream)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        (r["doc_id"], r["label"]) for r in spark.read.parquet(str(out_dir)).collect()
    )
    assert got == [("d1", "clean")]

    # batch execution of the SAME declarative join agrees
    d_batch = spark.createDataFrame(docs, "doc_ts timestamp, doc_id string")
    l_batch = spark.createDataFrame(
        labels, "label_ts timestamp, doc_id string, label string"
    )
    want = sorted(
        (r["doc_id"], r["label"])
        for r in enrich_with_labels(d_batch, l_batch).collect()
    )
    assert got == want
