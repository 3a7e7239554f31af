"""Running per-source stats via transformWithState: cumulative counters
across micro-batches, exact integer averages, restart recovery."""

from pdf_extractor_spark.streaming.stats import running_source_stats

from tests.test_streaming_enrich import FEED_SCHEMA, _row, _write_drops


def _run(spark, landing, ckpt, out_dir):
    stream = (
        spark.readStream.schema(FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        running_source_stats(stream.select("source", "n_chars"))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(str(out_dir))


def test_running_source_stats_accumulates(spark, tmp_path):
    landing = _write_drops(
        spark,
        tmp_path,
        [
            # batch 0: web x2 (100+300 chars), pdf x1 (50)
            [
                _row("a", "web", 0, 100),
                _row("b", "web", 1, 300),
                _row("c", "pdf", 2, 50),
            ],
            # batch 1: web x1 (200) -> totals web: 3 docs / 600 chars
            [_row("d", "web", 3, 200)],
        ],
    )
    out = _run(spark, landing, tmp_path / "ckpt", tmp_path / "out")
    rows = {
        (r.source, r.total_docs): (r.batch_docs, r.total_chars, r.avg_chars_micros)
        for r in out.collect()
    }
    assert rows[("web", 2)] == (2, 400, 200_000_000)
    assert rows[("pdf", 1)] == (1, 50, 50_000_000)
    assert rows[("web", 3)] == (1, 600, 200_000_000)
    assert len(rows) == 3  # pdf emits nothing in batch 1 (no input rows)

    # restart with a new drop: state recovered from the checkpoint, the
    # cumulative counters continue rather than resetting
    landing2 = _write_drops(
        spark, tmp_path, [[], [], [_row("e", "web", 4, 100)]]
    )
    assert landing2 == landing  # same landing dir, drop-2 appended
    out2 = _run(spark, landing, tmp_path / "ckpt", tmp_path / "out")
    rows2 = {
        (r.source, r.total_docs): (r.batch_docs, r.total_chars, r.avg_chars_micros)
        for r in out2.collect()
    }
    assert rows2[("web", 4)] == (1, 700, 175_000_000)
