"""Streaming ingestion: incremental file drops -> same span output as batch,
idempotent commits, windowed lineage rollup."""

from pdf_extractor_spark.core.extractor import extract_document
from pdf_extractor_spark.corpus import gen_documents
from pdf_extractor_spark.spark.lineage import CommitLog
from pdf_extractor_spark.streaming.ingest import (
    start_extraction_stream,
    windowed_lineage_counts,
)


def _write_drop(spark, rows, path):
    """One parquet 'drop' of documents arriving in the landing dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    table = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "spans": pa.array([r["spans"] for r in rows], span_type),
        }
    )
    pq.write_table(table, path)


def test_streaming_matches_batch_oracle(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = gen_documents(60, seed=11)
    _write_drop(spark, rows[:30], str(landing / "drop-0.parquet"))
    _write_drop(spark, rows[30:], str(landing / "drop-1.parquet"))

    log = CommitLog(str(tmp_path / "log"))
    q = start_extraction_stream(
        spark,
        str(landing),
        log,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_parts=16,
        num_partitions=4,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    # one chunk per micro-batch (maxFilesPerTrigger=1 -> 2 epochs)
    assert len(log.committed_chunks()) == 2

    final = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in log.read_extracted(spark).collect()
    }
    assert len(final) == 60
    for r in rows:
        assert final[r["doc_id"]] == extract_document(r["spans"]).spans

    # restart over the same checkpoint: no new data -> no new chunks
    q2 = start_extraction_stream(
        spark,
        str(landing),
        log,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_parts=16,
        num_partitions=4,
    )
    q2.awaitTermination(120)
    assert len(log.committed_chunks()) == 2

    # a third drop arrives -> exactly one more chunk, old chunks untouched
    more = gen_documents(10, seed=99)
    _write_drop(spark, more, str(landing / "drop-2.parquet"))
    q3 = start_extraction_stream(
        spark,
        str(landing),
        log,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_parts=16,
        num_partitions=4,
    )
    q3.awaitTermination(120)
    assert len(log.committed_chunks()) == 3
    assert log.read_extracted(spark).count() == 70

    # windowed lineage rollup accounts for every doc
    win = windowed_lineage_counts(log.read_lineage(spark)).collect()
    assert sum(r["docs_done"] for r in win) == 70


def test_streaming_idempotent_epoch_replay(spark, tmp_path):
    """A commit marker that already exists must short-circuit the epoch
    (foreachBatch re-delivers the last epoch after a crash)."""
    from pdf_extractor_spark.streaming.ingest import make_batch_processor

    rows = gen_documents(12, seed=5)
    drop = str(tmp_path / "drop-0.parquet")
    _write_drop(spark, rows, drop)
    batch_df = spark.read.parquet(drop)
    log = CommitLog(str(tmp_path / "log"))

    process = make_batch_processor(spark, log, n_parts=8, num_partitions=2)
    process(batch_df, 0)
    chunks = log.committed_chunks()
    assert len(chunks) == 1
    committed_at = chunks[0]["committed_at"]

    process(batch_df, 0)  # replay of the same epoch: must be a no-op
    chunks2 = log.committed_chunks()
    assert len(chunks2) == 1
    assert chunks2[0]["committed_at"] == committed_at
    assert log.read_extracted(spark).count() == 12

    # RESTART replay: a fresh processor (post-crash, epoch committed but not
    # yet checkpointed) must also skip — the epoch key is read back from the
    # markers, not from restart-dependent in-memory state
    process_restarted = make_batch_processor(spark, log, n_parts=8, num_partitions=2)
    process_restarted(batch_df, 0)
    assert len(log.committed_chunks()) == 1
    assert log.read_extracted(spark).count() == 12

    # a DIFFERENT stream namespace legitimately starts at epoch 0 again
    other = make_batch_processor(
        spark, log, n_parts=8, num_partitions=2, stream_ns="other-ckpt"
    )
    other(batch_df, 0)
    assert len(log.committed_chunks()) == 2


def test_windowed_lineage_counts_streaming_mode(spark, tmp_path):
    """The watermarked branch: feed lineage rows as a STREAM and check the
    windowed rollup totals match the batch rollup on the same rows."""
    from pdf_extractor_spark.corpus import gen_documents
    from pdf_extractor_spark.streaming.ingest import windowed_lineage_counts

    rows = gen_documents(40, seed=13)
    landing = tmp_path / "landing"
    landing.mkdir()
    _write_drop(spark, rows, str(landing / "drop-0.parquet"))
    log = CommitLog(str(tmp_path / "log"))
    q = start_extraction_stream(
        spark, str(landing), log, checkpoint_dir=str(tmp_path / "ckpt"),
        n_parts=8, num_partitions=2,
    )
    q.awaitTermination(300)

    lineage_dirs = sorted(
        str(p) for p in (tmp_path / "log" / "lineage").iterdir()
    )
    batch_lineage = spark.read.parquet(*lineage_dirs)
    stream_lineage = (
        spark.readStream.schema(batch_lineage.schema).parquet(
            str(tmp_path / "log" / "lineage")
        )
    )
    assert stream_lineage.isStreaming
    windowed = windowed_lineage_counts(stream_lineage)  # watermark branch
    sq = (
        windowed.writeStream.format("memory").queryName("lin_win")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    # append mode emits only windows the watermark has closed; re-read what
    # arrived and compare against the batch rollup for those same windows
    got = {
        r["window_start"]: (r["docs_done"], r["parse_failures"])
        for r in spark.sql("select * from lin_win").collect()
    }
    want_all = {
        r["window_start"]: (r["docs_done"], r["parse_failures"])
        for r in windowed_lineage_counts(batch_lineage).collect()
    }
    assert set(got) <= set(want_all)
    for w, v in got.items():
        assert v == want_all[w]
    # batch totals must account for every doc regardless
    assert sum(v[0] for v in want_all.values()) == 40


def test_streaming_needs_ocr_routing(spark, tmp_path):
    """route_needs_ocr: scanned documents (text-free pages with images) land
    in the ocr_queue side output with their pdf:// refs; clean documents do
    not; replayed epochs stay idempotent for the queue."""
    import base64

    from pdf_extractor_spark.core.pdf_build import ImageBox, PageSpec, TextBox, build_pdf

    def pdf_span(pdf_bytes):
        return {
            "kind": "pdf",
            "text": base64.b64encode(pdf_bytes).decode("ascii"),
            "media_ref": "",
            "offset": 0,
        }

    scanned = build_pdf(
        [
            PageSpec(images=[ImageBox(x=50, y_top=49.5, w=512, h=693)]),
            PageSpec(boxes=[TextBox(x=72, y_top=100, lines=["Real text."])]),
        ]
    )
    clean = build_pdf([PageSpec(boxes=[TextBox(x=72, y_top=100, lines=["Fine."])])])
    rows = [
        {"doc_id": "scan-1", "spans": [pdf_span(scanned)]},
        {"doc_id": "clean-1", "spans": [pdf_span(clean)]},
        {"doc_id": "text-1", "spans": [{"kind": "text", "text": "plain", "media_ref": "", "offset": 0}]},
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    _write_drop(spark, rows, str(landing / "drop-0.parquet"))

    log = CommitLog(str(tmp_path / "log"))
    q = start_extraction_stream(
        spark,
        str(landing),
        log,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_parts=8,
        num_partitions=2,
        route_needs_ocr=True,
    )
    q.awaitTermination(300)

    queue = spark.read.parquet(str(tmp_path / "log" / "ocr_queue" / "chunk-*")).collect()
    assert len(queue) == 1
    [r] = queue
    assert r["doc_id"] == "scan-1" and r["pages_needing_ocr"] == 1
    assert r["media_refs"] == ["pdf://0/0/Im0"]

    # restart over the same checkpoint: replayed/empty epochs add nothing
    q2 = start_extraction_stream(
        spark,
        str(landing),
        log,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_parts=8,
        num_partitions=2,
        route_needs_ocr=True,
    )
    q2.awaitTermination(120)
    assert len(spark.read.parquet(str(tmp_path / "log" / "ocr_queue" / "chunk-*")).collect()) == 1


def test_ocr_queue_two_phase_crash_windows(spark, tmp_path):
    """A visible ocr_queue/chunk-* dir must imply a COMMITTED chunk.
    maintain_ocr_queue heals both crash windows: commit-then-crash staging
    dirs are promoted; crash-before-commit staging dirs (their epoch
    replays under a new chunk id) are swept after the grace period."""
    import json
    import os

    from pdf_extractor_spark.streaming.ingest import (
        maintain_ocr_queue,
        ocr_queue_root,
    )

    log = CommitLog(str(tmp_path / "log"))
    qroot = ocr_queue_root(log)

    # window A: marker exists, publish rename never ran
    os.makedirs(os.path.join(qroot, ".staging-chunk-000007"))
    with open(
        os.path.join(str(tmp_path / "log"), "commits", "commit-000007.json"), "w"
    ) as f:
        json.dump(
            {"chunk_id": 7, "part_ids": [0], "metrics": {}, "committed_at": 1.0}, f
        )
    # window B: no marker (writer died pre-commit), old enough to sweep
    stale = os.path.join(qroot, ".staging-chunk-000009")
    os.makedirs(stale)
    os.utime(stale, (0, 0))
    # window B': fresh unmarked staging dir — inside grace, must survive
    live = os.path.join(qroot, ".staging-chunk-000011")
    os.makedirs(live)

    # window C: ANOTHER routed stream's stalled-but-live staging (owner
    # token differs) — a rival stream's start sweep must never touch it
    from pdf_extractor_spark.streaming.ingest import _ns_token

    rival = os.path.join(
        qroot, f".staging-{_ns_token('/ckpt/B')}-chunk-000013"
    )
    os.makedirs(rival)
    os.utime(rival, (0, 0))

    # default (maintenance-job) mode: promote, but NEVER sweep staging —
    # an unmarked dir could be a live writer stalled past the grace window
    out = maintain_ocr_queue(log, grace_s=3600.0)
    assert out["promoted"] == [7]
    assert os.path.isdir(os.path.join(qroot, "chunk-000007"))
    assert os.path.exists(stale)
    # stream-start mode (the only sweep_staging=True caller): sweep stale
    # LEGACY dirs and this stream's OWN dead dirs; stream B's dir survives
    out = maintain_ocr_queue(
        log, grace_s=3600.0, sweep_staging=True, owner_ns="/ckpt/A"
    )
    assert not os.path.exists(stale)
    assert os.path.isdir(live)  # a LIVE writer's staging is never swept
    assert os.path.isdir(rival)  # another stream's staging is not ours
    # B's own start MAY sweep its own stale staging
    out = maintain_ocr_queue(
        log, grace_s=3600.0, sweep_staging=True, owner_ns="/ckpt/B"
    )
    assert not os.path.exists(rival)


def test_maintain_ocr_queue_tolerates_already_published(tmp_path):
    """Promotion must be a no-op (staging swept, final kept, no raise) when
    the live writer's publish() or a racing maintainer already renamed —
    the check-then-rename race both directions."""
    import json
    import os

    from pdf_extractor_spark.streaming.ingest import (
        maintain_ocr_queue,
        ocr_queue_root,
    )

    log = CommitLog(str(tmp_path / "log"))
    qroot = ocr_queue_root(log)
    os.makedirs(os.path.join(qroot, ".staging-chunk-000003"))
    os.makedirs(os.path.join(qroot, "chunk-000003"))
    with open(os.path.join(qroot, "chunk-000003", "x.parquet"), "w") as f:
        f.write("d")  # non-empty: rename-over must fail, not clobber
    with open(
        os.path.join(str(tmp_path / "log"), "commits", "commit-000003.json"), "w"
    ) as f:
        json.dump(
            {"chunk_id": 3, "part_ids": [0], "metrics": {}, "committed_at": 1.0}, f
        )
    out = maintain_ocr_queue(log, grace_s=3600.0)
    assert out["promoted"] == []
    assert not os.path.exists(os.path.join(qroot, ".staging-chunk-000003"))
    assert os.path.isfile(os.path.join(qroot, "chunk-000003", "x.parquet"))


def test_stream_start_rejects_mismatched_n_parts(spark, tmp_path):
    import pytest

    from pdf_extractor_spark.streaming.ingest import make_batch_processor

    log = CommitLog(str(tmp_path / "log"))
    log.commit_chunk(0, [0], {"docs": 1}, n_parts=8)
    with pytest.raises(ValueError, match="n_parts=8"):
        make_batch_processor(spark, log, n_parts=64)


def test_maintain_ocr_queue_ignores_stray_entries(tmp_path):
    """A stray non-chunk entry (editor backup, manual copy) in ocr_queue/
    must not abort stream start."""
    import os

    from pdf_extractor_spark.streaming.ingest import (
        maintain_ocr_queue,
        ocr_queue_root,
    )

    log = CommitLog(str(tmp_path / "log"))
    qroot = ocr_queue_root(log)
    os.makedirs(os.path.join(qroot, ".staging-chunk-000003.bak"))
    os.makedirs(os.path.join(qroot, "chunk-old"))
    with open(os.path.join(qroot, "notes.txt"), "w") as f:
        f.write("x")
    out = maintain_ocr_queue(log, grace_s=0.0)
    assert out == {"promoted": [], "removed": []}
    assert os.path.isdir(os.path.join(qroot, "chunk-old"))


def test_ocr_stage_consumes_queue_exactly_once(spark, tmp_path):
    """Stage-2 consumer: drains ocr_queue/chunk-* into the ocr_text table,
    one row per queued media ref, deterministic stub text, and a re-run
    (no new queue chunks) adds nothing — the file sink + checkpoint give
    exactly-once."""
    import pandas as pd

    from pdf_extractor_spark.streaming.ocr_stage import (
        start_ocr_stage,
        stub_ocr,
    )

    qroot = tmp_path / "ocr_queue"
    for cid, refs in [(0, ["pdf://a/0/im1", "pdf://a/1/im2"]), (1, ["pdf://b/0/im1"])]:
        d = qroot / f"chunk-{cid:06d}"
        d.mkdir(parents=True)
        pd.DataFrame(
            {
                "doc_id": [f"doc{cid}"],
                "pages_needing_ocr": [len(refs)],
                "media_refs": [refs],
            }
        ).to_parquet(d / "part-0.parquet")
    out = tmp_path / "ocr_text"
    ckpt = tmp_path / "ckpt"
    q = start_ocr_stage(spark, str(qroot), str(out), str(ckpt))
    q.awaitTermination(120)
    rows = {
        (r["doc_id"], r["media_ref"]): r["ocr_text"]
        for r in spark.read.parquet(str(out)).collect()
    }
    assert len(rows) == 3
    assert rows[("doc0", "pdf://a/0/im1")] == stub_ocr("pdf://a/0/im1")
    # idempotent re-run: nothing new in the queue -> nothing new in the table
    q2 = start_ocr_stage(spark, str(qroot), str(out), str(ckpt))
    q2.awaitTermination(120)
    assert len(spark.read.parquet(str(out)).collect()) == 3
    # a NEW queue chunk is picked up incrementally
    d = qroot / "chunk-000002"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": ["doc2"],
            "pages_needing_ocr": [1],
            "media_refs": [["pdf://c/0/im9"]],
        }
    ).to_parquet(d / "part-0.parquet")
    q3 = start_ocr_stage(spark, str(qroot), str(out), str(ckpt))
    q3.awaitTermination(120)
    assert len(spark.read.parquet(str(out)).collect()) == 4
    # a chunk arriving with ANCIENT file mtimes (a healed staging dir keeps
    # its original timestamps) must still be consumed: the default
    # maxFileAge=7d would silently drop it relative to the newer files the
    # checkpoint has seen (regression for the explicit maxFileAge option)
    import os as _os
    import time as _time

    d = qroot / "chunk-000004"
    d.mkdir()
    f = d / "part-0.parquet"
    pd.DataFrame(
        {
            "doc_id": ["doc4"],
            "pages_needing_ocr": [1],
            "media_refs": [["pdf://d/0/im1"]],
        }
    ).to_parquet(f)
    old = _time.time() - 10 * 86400
    _os.utime(f, (old, old))
    _os.utime(d, (old, old))
    q4 = start_ocr_stage(spark, str(qroot), str(out), str(ckpt))
    q4.awaitTermination(120)
    assert len(spark.read.parquet(str(out)).collect()) == 5


def test_merge_ocr_text_folds_recovered_text_into_spans(spark):
    """Stage-3: media spans with OCR rows gain the recovered text; all
    other spans — and docs with no OCR rows — pass through byte-identical
    (the span-sequence contract survives the merge)."""
    from pdf_extractor_spark.streaming.ocr_stage import merge_ocr_text

    span = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    ext = spark.createDataFrame(
        [
            (
                "a",
                [
                    ("text", "hello", None, 0),
                    ("media", "", "pdf://a/0/im1", 5),
                    ("media", "", "pdf://a/0/im2", 6),
                ],
                2,
            ),
            ("b", [("text", "plain", None, 0)], 1),
        ],
        f"doc_id string, spans {span}, pages_parsed int",
    )
    ocr = spark.createDataFrame(
        [
            ("a", "pdf://a/0/im1", "[ocr-stub x]"),
            # duplicate row (replayed ref) must not break the map build
            ("a", "pdf://a/0/im1", "[ocr-stub x]"),
        ],
        "doc_id string, media_ref string, ocr_text string",
    )
    out = {r["doc_id"]: r for r in merge_ocr_text(ext, ocr).collect()}
    a = [tuple(s) for s in out["a"]["spans"]]
    assert a == [
        ("text", "hello", None, 0),
        ("media", "[ocr-stub x]", "pdf://a/0/im1", 5),
        ("media", "", "pdf://a/0/im2", 6),  # no OCR row -> untouched
    ]
    assert [tuple(s) for s in out["b"]["spans"]] == [("text", "plain", None, 0)]
    assert out["a"]["pages_parsed"] == 2  # non-span columns preserved
    assert "_ocr" not in merge_ocr_text(ext, ocr).columns

    # ADVICE r03: conflicting recoveries for one (doc_id, media_ref) — a
    # real engine rerun appending different text — must reduce
    # DETERMINISTICALLY (lexicographic max), not arbitrary-row-wins
    ocr_conflict = spark.createDataFrame(
        [
            ("a", "pdf://a/0/im1", "[ocr rerun B]"),
            ("a", "pdf://a/0/im1", "[ocr rerun A]"),
        ],
        "doc_id string, media_ref string, ocr_text string",
    )
    merged = {
        r["doc_id"]: r for r in merge_ocr_text(ext, ocr_conflict).collect()
    }
    assert [tuple(s) for s in merged["a"]["spans"]][1] == (
        "media",
        "[ocr rerun B]",
        "pdf://a/0/im1",
        5,
    )


def test_export_zip_with_ocr_text(spark, tmp_path):
    """--with-ocr-text composition: recovered text exports as a blockquote
    under the media link; without the OCR table the same snapshot exports
    with bare links (the unmerged byte contract is unchanged)."""
    import zipfile

    import pandas as pd

    from pdf_extractor_spark.spark.export import export_markdown_zip
    from pdf_extractor_spark.spark.lineage import _write_chunk
    from pdf_extractor_spark.spark.pipeline import extract_documents

    span_t = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    docs = spark.createDataFrame(
        [("d1", [("text", "hello world", None, 0), ("media", None, "pdf://d1/0/im", 1)])],
        f"doc_id string, spans {span_t}",
    )
    log = CommitLog(str(tmp_path / "t"))
    ext = extract_documents(docs, n_parts=4, num_partitions=2)
    cid = log.reserve_chunk_id()
    _write_chunk(spark, log, ext, cid, [0, 1, 2, 3], 4)

    plain = tmp_path / "plain.zip"
    export_markdown_zip(spark, str(tmp_path / "t"), str(plain))
    assert b"> [" not in zipfile.ZipFile(plain).read("d1.md")

    (tmp_path / "ocr").mkdir()
    pd.DataFrame(
        {
            "doc_id": ["d1"],
            "media_ref": ["pdf://d1/0/im"],
            "ocr_text": ["[ocr-stub feedface0000]"],
        }
    ).to_parquet(tmp_path / "ocr" / "p.parquet", index=False)
    merged = tmp_path / "merged.zip"
    export_markdown_zip(
        spark, str(tmp_path / "t"), str(merged), ocr_text_dir=str(tmp_path / "ocr")
    )
    body = zipfile.ZipFile(merged).read("d1.md").decode()
    assert "![media](pdf://d1/0/im)\n\n> [ocr-stub feedface0000]" in body
    assert "hello world" in body


def test_streaming_jsonl_drops_exactly_once(spark, tmp_path):
    """JSONL drop directory drained incrementally: corrupt lines are
    dropped at the source, each micro-batch commits one chunk, and a
    re-run after a new drop processes ONLY the new file (checkpoint +
    epoch markers) — every valid doc exactly once."""
    import json
    import os
    import time

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    log = CommitLog(str(tmp_path / "t"))

    def drop(name, lo, hi, corrupt=True):
        lines = [
            json.dumps(
                {
                    "doc_id": f"d{i:04d}",
                    "spans": [
                        {"kind": "text", "text": f"t {i}", "media_ref": "", "offset": 0}
                    ],
                }
            )
            for i in range(lo, hi)
        ]
        if corrupt:
            lines.append('{"doc_id": "broken",')  # truncated: must quarantine
        (landing / name).write_text("\n".join(lines) + "\n")

    drop("a.jsonl", 0, 30)
    drop("b.jsonl", 30, 50)
    now = time.time()
    os.utime(landing / "a.jsonl", (now - 20, now - 20))
    os.utime(landing / "b.jsonl", (now - 10, now - 10))

    def drain():
        q = start_extraction_stream(
            spark, str(landing), log, checkpoint_dir=ckpt,
            n_parts=8, num_partitions=4, max_files_per_trigger=1, fmt="jsonl",
        )
        q.awaitTermination(300)

    drain()
    ids = [r["doc_id"] for r in log.read_extracted(spark).select("doc_id").collect()]
    assert sorted(ids) == [f"d{i:04d}" for i in range(50)]  # no dupes, no 'broken'
    chunks_after_first = len(log.committed_chunks())
    assert chunks_after_first == 2  # one chunk per micro-batch (file)

    drop("c.jsonl", 50, 65)
    drain()
    ids = [r["doc_id"] for r in log.read_extracted(spark).select("doc_id").collect()]
    assert sorted(ids) == [f"d{i:04d}" for i in range(65)]
    assert len(log.committed_chunks()) == chunks_after_first + 1  # only the new file
