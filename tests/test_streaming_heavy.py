"""Streaming Misra-Gries heavy hitters: bounded state, cross-batch
accumulation, restart recovery, and the frequency guarantee."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor_spark.streaming.heavy import _mg_fold, heavy_hitters_stream

from pyspark.sql.types import StringType, StructField, StructType

ITEM_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("source", StringType()),
        StructField("item", StringType()),
    ]
)


def _write_item_drops(tmp_path, batches):
    landing = tmp_path / "landing"
    landing.mkdir(exist_ok=True)
    now = time.time()
    for i, rows in enumerate(batches):
        table = pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "source": [r[1] for r in rows],
                "item": [r[2] for r in rows],
            }
        )
        path = str(landing / f"drop-{i}.parquet")
        pq.write_table(table, path)
        stamp = now - 30 + 10 * i
        os.utime(path, (stamp, stamp))
    return landing


def _run(spark, landing, ckpt, out_dir, k=4):
    stream = (
        spark.readStream.schema(ITEM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        heavy_hitters_stream(stream, k=k)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(str(out_dir))


def test_mg_fold_exact_under_k():
    """With <= k distinct items Misra-Gries degenerates to exact counts."""
    c = _mg_fold({}, ["a", "b", "a", "c", "a", "b"], k=4)
    assert c == {"a": 3, "b": 2, "c": 1}


def test_mg_fold_guarantee():
    """Any item with true frequency > N/(k+1) survives, and estimates
    undercount by at most N/(k+1)."""
    stream = (["hot"] * 40) + [f"cold{i}" for i in range(56)]
    k = 7
    c = _mg_fold({}, stream, k=k)
    n = len(stream)
    assert "hot" in c  # 40 > 96/8
    assert c["hot"] <= 40 and 40 - c["hot"] <= n // (k + 1)
    assert len(c) <= k


def test_heavy_hitters_stream_accumulates(spark, tmp_path):
    # batch 0: web source, 'ads' dominates; batch 1 adds more 'ads' + noise
    b0 = [(f"a{i:02d}", "web", "ads") for i in range(6)] + [
        ("b00", "web", "blog"),
        ("b01", "web", "news"),
    ]
    b1 = [(f"c{i:02d}", "web", "ads") for i in range(4)] + [
        ("d00", "web", "blog"),
        ("e00", "pdf", "paper"),
    ]
    landing = _write_item_drops(tmp_path, [b0, b1])
    out = _run(spark, landing, tmp_path / "ckpt", tmp_path / "out")
    rows = {
        (r.key, r.item, r.est_count): r.rank for r in out.collect()
    }
    # batch 0 top: ads=6; batch 1 carries state forward: ads=10, blog=2
    assert rows[("web", "ads", 6)] == 1
    assert rows[("web", "ads", 10)] == 1
    assert rows[("web", "blog", 2)] == 2
    assert rows[("pdf", "paper", 1)] == 1

    # restart with a third drop: counters recovered from the checkpoint
    _write_item_drops(tmp_path, [[], [], [("f00", "web", "ads")]])
    out2 = _run(spark, landing, tmp_path / "ckpt", tmp_path / "out")
    rows2 = {(r.key, r.item, r.est_count) for r in out2.collect()}
    assert ("web", "ads", 11) in rows2
