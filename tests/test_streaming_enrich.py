"""Stream-static enrichment (batch == stream) and watermark-bounded dedup
(suppression within the horizon, deterministic re-emission after state
eviction)."""

import os
import time

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pdf_extractor_spark.streaming.enrich import bounded_dedup, enrich_with_dim

FEED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("source", StringType()),
        StructField("ts", TimestampType()),
        StructField("n_chars", LongType()),
    ]
)


def _row(doc_id, source, minute, n_chars=100):
    h, m = divmod(minute, 60)
    return (doc_id, source, f"2024-01-01 {h:02d}:{m:02d}:00", n_chars)


def _write_drops(spark, tmp_path, batches):
    """One single-file parquet drop per batch, mtimes strictly increasing
    so the file source discovers them in order (one micro-batch per
    file)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    landing = tmp_path / "landing"
    landing.mkdir(exist_ok=True)
    now = time.time()
    for i, rows in enumerate(batches):
        table = pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "source": [r[1] for r in rows],
                "ts": pa.array(
                    [dt.datetime.fromisoformat(r[2]) for r in rows],
                    type=pa.timestamp("us"),
                ),
                "n_chars": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
        path = str(landing / f"drop-{i}.parquet")
        pq.write_table(table, path)
        stamp = now - 30 + 10 * i
        os.utime(path, (stamp, stamp))
    return landing


def _run(spark, landing, ckpt, out_dir, transform):
    stream = (
        spark.readStream.schema(FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(str(out_dir))


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    dim = spark.createDataFrame(
        [("web", 900000), ("pdf", 750000)], "source string, prior_micros long"
    )
    landing = _write_drops(
        spark,
        tmp_path,
        [
            [_row("a", "web", 0), _row("b", "pdf", 1)],
            # 'ftp' is missing from the dim: the left join must keep it
            [_row("c", "ftp", 2), _row("d", "web", 3)],
        ],
    )
    out = _run(
        spark,
        landing,
        tmp_path / "ckpt",
        tmp_path / "out",
        lambda s: enrich_with_dim(s, dim),
    )
    got = {(r.doc_id, r.prior_micros) for r in out.collect()}
    batch = enrich_with_dim(spark.read.schema(FEED_SCHEMA).parquet(str(landing)), dim)
    want = {(r.doc_id, r.prior_micros) for r in batch.collect()}
    assert got == want
    assert ("c", None) in got  # unmatched key survived the left join


def test_bounded_dedup_suppresses_then_reemits_after_eviction(spark, tmp_path):
    landing = _write_drops(
        spark,
        tmp_path,
        [
            # batch 0: k1 twice (in-batch dup)
            [_row("k1", "web", 0), _row("k1", "web", 1)],
            # batch 1: k1 again within the 10-min horizon (suppressed);
            # k2 @ 01:00 advances the watermark to 00:50 for batch 2
            [_row("k1", "web", 5), _row("k2", "web", 60)],
            # batch 2: k1 @ 00:55 is above the watermark but k1's state
            # (expiry 00:10) is only REMOVED at this batch's end — still
            # suppressed; the eviction takes effect for the next batch
            [_row("k1", "web", 55)],
            # batch 3: state gone -> k1 EMITS AGAIN: bounded state means
            # bounded suppression, exactly the documented contract
            [_row("k1", "web", 56)],
        ],
    )
    out = _run(
        spark,
        landing,
        tmp_path / "ckpt",
        tmp_path / "out",
        lambda s: bounded_dedup(s, keys=("doc_id",)),
    )
    rows = sorted((r.doc_id, r.ts.minute) for r in out.collect())
    assert rows == [("k1", 0), ("k1", 56), ("k2", 0)]
