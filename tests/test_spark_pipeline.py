"""Spark layer: span-sequence equality vs the local oracle (the north_rule
correctness contract), skew-aware partition balance, and kill-and-resume."""

import os
import shutil

import pytest

from pdf_extractor_spark.core.extractor import extract_document
from pdf_extractor_spark.corpus import corpus_df, gen_documents
from pdf_extractor_spark.spark import lineage as L
from pdf_extractor_spark.spark.pipeline import (
    extract_documents,
    with_size_salt,
)

N_DOCS = 150


def _oracle(n_docs=N_DOCS, seed=42):
    return {
        r["doc_id"]: extract_document(r["spans"]) for r in gen_documents(n_docs, seed)
    }


def test_span_sequence_equality(spark):
    """Every doc's output (kind, text, media_ref, order) matches the oracle."""
    got = {
        r["doc_id"]: r
        for r in extract_documents(corpus_df(spark, N_DOCS), n_parts=32, num_partitions=8).collect()
    }
    oracle = _oracle()
    assert set(got) == set(oracle)
    for doc_id, res in oracle.items():
        spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got[doc_id]["spans"]]
        assert spans == res.spans, doc_id
        assert got[doc_id]["pages_parsed"] == res.pages_parsed
        assert got[doc_id]["parse_failures"] == res.parse_failures
    assert sum(r["parse_failures"] for r in got.values()) == 0


def test_result_independent_of_parallelism(spark):
    """Same input at different partition counts -> identical span output."""
    a = {
        r["doc_id"]: [tuple(s) for s in map(lambda x: (x["kind"], x["text"], x["media_ref"], x["offset"]), r["spans"])]
        for r in extract_documents(corpus_df(spark, 60), n_parts=8, num_partitions=2).collect()
    }
    b = {
        r["doc_id"]: [tuple(s) for s in map(lambda x: (x["kind"], x["text"], x["media_ref"], x["offset"]), r["spans"])]
        for r in extract_documents(corpus_df(spark, 60), n_parts=64, num_partitions=16).collect()
    }
    assert a == b


def test_size_salt_columns(spark):
    df = with_size_salt(corpus_df(spark, 200))
    rows = df.select("doc_id", "n_bytes", "size_bucket", "salt").collect()
    assert all(r["n_bytes"] >= 0 for r in rows)
    buckets = {r["size_bucket"] for r in rows}
    assert buckets <= {0, 1, 2}
    # giant docs (bucket 2) must use the widest salt range when present
    for r in rows:
        if r["size_bucket"] == 0:
            assert r["salt"] == 0
        elif r["size_bucket"] == 1:
            assert 0 <= r["salt"] < 4
        else:
            assert 0 <= r["salt"] < 16


def test_partition_balance_bytes(spark):
    """With salting, no physical partition hoards the byte volume."""
    from pyspark.sql import functions as F
    from pdf_extractor_spark.spark.pipeline import balance_partitions

    df = balance_partitions(corpus_df(spark, 400, seed=7), 16)
    per_part = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("n_bytes").alias("part_bytes"))
        .collect()
    )
    sizes = [r["part_bytes"] for r in per_part]
    assert len(sizes) > 1
    # bound: max partition carries < 35% of total bytes (sequential would be 100%)
    assert max(sizes) / sum(sizes) < 0.35


def test_partition_balance_bytes_skewed(spark):
    """Same bound on the ADVERSARIAL profile (VERDICT r03 #2): a contiguous
    1% head of 500-1000-page giants carrying ~90% of the bytes. The r3
    range-based repartition failed this (every giant in ONE partition, ~90%
    of bytes); per-doc hash scatter must hold the bound."""
    from pyspark.sql import functions as F
    from pdf_extractor_spark.spark.pipeline import balance_partitions

    df = balance_partitions(corpus_df(spark, 1000, profile="skewed"), 32)
    per_part = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("n_bytes").alias("part_bytes"))
        .collect()
    )
    sizes = [r["part_bytes"] for r in per_part]
    assert len(sizes) > 1
    assert max(sizes) / sum(sizes) < 0.35


def test_kill_and_resume(spark, tmp_path):
    """Crash mid-run, rerun: final table identical, committed partitions not
    reprocessed (north_rule resumability)."""
    root = str(tmp_path / "commitlog")
    docs = corpus_df(spark, 120)
    log = L.CommitLog(root)

    with pytest.raises(RuntimeError, match="injected failure"):
        L.run_extraction(spark, docs, log, n_parts=16, parts_per_chunk=4, fail_after_chunks=2)

    committed_before = log.committed_part_ids()
    assert len(committed_before) == 8  # 2 chunks x 4 parts

    report = L.run_extraction(spark, docs, log, n_parts=16, parts_per_chunk=4)
    assert report.parts_skipped == 8
    # resumed run must not touch already-committed partitions
    assert set(range(16)) - committed_before == set(
        p for c in log.committed_chunks()[2:] for p in c["part_ids"]
    )

    final = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in log.read_extracted(spark).collect()
    }
    oracle = _oracle(120)
    assert set(final) == set(oracle)
    for doc_id, res in oracle.items():
        assert final[doc_id] == res.spans

    # idempotent: a third run does nothing
    report3 = L.run_extraction(spark, docs, log, n_parts=16, parts_per_chunk=4)
    assert report3.chunks_committed == 0 and report3.parts_skipped == 16

    # lineage accounting matches data
    lin = log.read_lineage(spark)
    total = lin.groupBy().sum("docs_done").collect()[0][0]
    assert total == 120


def test_snapshot_time_travel(spark, tmp_path):
    """as_of reads pin the Iceberg VERSION AS OF contract against the REAL
    writer: snapshot N sees exactly chunks 0..N, later commits and
    uncommitted data dirs stay invisible, and the snapshot list exposes one
    metadata row per commit."""
    root = str(tmp_path / "ttlog")
    docs = corpus_df(spark, 60, seed=11)
    log = L.CommitLog(root)
    L.run_extraction(spark, docs, log, n_parts=8, parts_per_chunk=3)
    snaps = log.snapshots()
    assert [s["snapshot_id"] for s in snaps] == [0, 1, 2]
    assert all(s["n_part_ids"] == 3 or s["n_part_ids"] == 2 for s in snaps)

    full = log.read_extracted(spark).count()
    seen = [log.read_extracted(spark, as_of=n).count() for n in range(3)]
    # monotone growth to the full table; snapshot 0 is a strict subset
    assert seen[2] == full and seen[0] < seen[1] < seen[2]
    # as_of past the newest snapshot == current table
    assert log.read_extracted(spark, as_of=99).count() == full

    # doc sets nest: every doc visible at N is visible at N+1
    ids = [
        {r["doc_id"] for r in log.read_extracted(spark, as_of=n).collect()}
        for n in range(3)
    ]
    assert ids[0] < ids[1] < ids[2]

    # an uncommitted data dir (crashed writer) is invisible at EVERY snapshot
    rogue = os.path.join(root, "data", "chunk=000099", "part_id=7")
    os.makedirs(rogue)
    shutil.copy(
        next(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(os.path.join(root, "data", "chunk=000000"))
            for f in fs
            if f.endswith(".parquet")
        ),
        os.path.join(rogue, "part-0.parquet"),
    )
    assert log.read_extracted(spark).count() == full
    # lineage time travel follows the same markers
    assert log.read_lineage(spark, as_of=0).count() == 3

    # incremental scan: (0, 2] is exactly the rows snapshots 1..2 added
    inc = {r["doc_id"] for r in log.read_incremental(spark, after=0).collect()}
    assert inc == ids[2] - ids[0]
    assert log.read_incremental(spark, after=2).count() == 0


def test_compaction_and_expiry(spark, tmp_path):
    """rewrite_data_files + expire_snapshots analogues: compaction rewrites
    the visible chunks into one replacement chunk behind the same atomic
    marker; the table contents are identical, the file count collapses,
    pre-compaction time travel still resolves until expiry reclaims it,
    and resume treats every compacted part as committed."""
    root = str(tmp_path / "clog")
    docs = corpus_df(spark, 60, seed=13)
    log = L.CommitLog(root)
    L.run_extraction(spark, docs, log, n_parts=8, parts_per_chunk=2)  # 4 chunks

    def span_map():
        return {
            r["doc_id"]: [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
            for r in log.read_extracted(spark).collect()
        }

    def n_data_files(chunk_glob="chunk=*"):
        import glob

        return len(
            glob.glob(os.path.join(root, "data", chunk_glob, "part_id=*", "*.parquet"))
        )

    before = span_map()
    files_before = n_data_files()
    lineage_docs = log.read_lineage(spark).groupBy().sum("docs_done").collect()[0][0]

    new_id = L.compact_chunks(spark, log)
    assert new_id == 4
    # contents identical, one visible chunk, fewer files
    assert span_map() == before
    assert [c["chunk_id"] for c in log.visible_chunks()] == [new_id]
    files_after = n_data_files(f"chunk={new_id:06d}")
    assert files_after <= 8 and files_after < files_before
    # lineage equivalence (per-part totals survive the rewrite)
    assert log.read_lineage(spark).groupBy().sum("docs_done").collect()[0][0] == lineage_docs
    # time travel BEFORE the compaction still resolves to the originals
    assert {
        r["doc_id"] for r in log.read_extracted(spark, as_of=0).collect()
    } < set(before)
    # resume: every part is committed, a rerun does nothing
    report = L.run_extraction(spark, docs, log, n_parts=8, parts_per_chunk=2)
    assert report.chunks_committed == 0 and report.parts_skipped == 8
    # second compaction is a no-op (single visible chunk)
    assert L.compact_chunks(spark, log) is None

    # compaction is invisible to incremental consumers: a reader current
    # through snapshot 3 sees NO new rows from the compaction commit
    assert log.read_incremental(spark, after=3).count() == 0

    # expiry physically reclaims the replaced chunks; current reads unchanged
    gone = log.expire_replaced()
    assert sorted(gone) == [0, 1, 2, 3]
    assert not os.path.isdir(os.path.join(root, "data", "chunk=000000"))
    assert span_map() == before


def test_expire_snapshots_ttl(spark, tmp_path):
    """S10 TTL-retention analogue (SURVEY §2.1: the reference deletes temp
    files older than 30 min -> `expire_snapshots` on staging tables):
    age-gated reclamation of history that the current view no longer
    reaches — a fully-overwritten append chunk is reclaimed once old
    enough, fresh history is kept, current-view data is never touched
    regardless of age, and markers survive for audit."""
    import time

    root = str(tmp_path / "ttllog")
    docs = corpus_df(spark, 40, seed=31)
    log = L.CommitLog(root)
    # chunks 0 (parts 0,1) + 1 (parts 2,3), then chunk 2 overwrites parts
    # 0,1 -> chunk 0 is fully shadowed: unreachable from the current view
    L.run_extraction(spark, docs, log, n_parts=4, parts_per_chunk=2)
    L.reextract_parts(spark, docs, log, parts=[0, 1])

    def span_map():
        return {
            r["doc_id"]: [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
            for r in log.read_extracted(spark).collect()
        }

    before = span_map()
    # compaction-only expiry never touches overwrite-shadowed appends
    assert log.expire_replaced() == []
    # nothing is old enough at cutoff 0 -> nothing reclaimed
    assert log.expire_snapshots(older_than=0.0) == []
    # cutoff beyond every commit: the shadowed chunk is reclaimed; the
    # reachable chunks (1: untouched parts, 2: the overwrite) are kept
    gone = log.expire_snapshots(older_than=time.time() + 60)
    assert gone == [0]
    assert not os.path.isdir(os.path.join(root, "data", "chunk=000000"))
    assert os.path.isdir(os.path.join(root, "data", "chunk=000001"))
    # current reads are byte-identical; markers remain auditable
    assert span_map() == before
    assert [s["snapshot_id"] for s in log.snapshots()] == [0, 1, 2]
    # idempotent: a second sweep finds nothing to do
    assert log.expire_snapshots(older_than=time.time() + 60) == []


def test_reextract_parts_overwrite(spark, tmp_path):
    """Dynamic-partition overwrite: re-extracting changed partitions
    replaces exactly those partitions' rows at the commit flip; untouched
    partitions keep their original spans, time travel still reads the
    pre-overwrite state, and never-committed parts are refused."""
    from pdf_extractor_spark.spark.pipeline import assign_part_id, extract_documents

    root = str(tmp_path / "owlog")
    from pyspark.sql import functions as F

    v1 = corpus_df(spark, 60, seed=21)
    # same doc_ids, different content (the re-crawl): seed-22 payloads
    # renamed into the seed-21 id space
    v2 = corpus_df(spark, 60, seed=22).withColumn(
        "doc_id", F.regexp_replace("doc_id", "doc-22-", "doc-21-")
    )
    log = L.CommitLog(root)
    L.run_extraction(spark, v1, log, n_parts=8, parts_per_chunk=8)

    def spans_of(df):
        return {
            r["doc_id"]: [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
            for r in df.collect()
        }

    exp_v1 = spans_of(extract_documents(v1, n_parts=8, num_partitions=4))
    exp_v2 = spans_of(extract_documents(v2, n_parts=8, num_partitions=4))
    assert exp_v1 != exp_v2  # the re-crawl actually changed content
    part_of = {
        r["doc_id"]: r["part_id"]
        for r in assign_part_id(v1.select("doc_id", "spans"), 8).collect()
    }

    refresh = [2, 5]
    report = L.reextract_parts(spark, v2, log, refresh)
    assert report.chunks_committed == 1 and report.parts_processed == 2

    now = spans_of(log.read_extracted(spark))
    assert set(now) == set(exp_v1)
    for doc_id, spans in now.items():
        want = exp_v2 if part_of[doc_id] in refresh else exp_v1
        assert spans == want[doc_id], doc_id
    # at least one doc actually flipped to v2 content
    assert any(
        now[d] != exp_v1[d] for d in now if part_of[d] in refresh
    )

    # time travel to the pre-overwrite snapshot reads pure v1
    old = spans_of(log.read_extracted(spark, as_of=0))
    assert old == exp_v1

    # lineage rows follow the same per-part resolution (one row per part)
    lin = log.read_lineage(spark)
    assert lin.count() == 8
    assert lin.select("part_id").distinct().count() == 8

    # resume still treats every part as committed
    rerun = L.run_extraction(spark, v1, log, n_parts=8, parts_per_chunk=8)
    assert rerun.chunks_committed == 0 and rerun.parts_skipped == 8

    with pytest.raises(ValueError, match="never committed"):
        L.reextract_parts(spark, v2, log, [2, 99])


def test_lineage_schema(spark, tmp_path):
    root = str(tmp_path / "cl2")
    log = L.CommitLog(root)
    L.run_extraction(spark, corpus_df(spark, 30), log, n_parts=4, parts_per_chunk=4)
    lin = log.read_lineage(spark)
    assert set(lin.columns) == set(L.LINEAGE_COLS)
    assert lin.filter("status not in ('success','error','skip')").count() == 0


def test_arrow_and_pandas_paths_identical(spark):
    """mapInArrow and mapInPandas kernels must emit byte-identical output."""
    docs = corpus_df(spark, 80, seed=3)
    def snap(use_arrow):
        return {
            r["doc_id"]: (
                [tuple(s) for s in r["spans"]],
                r["pages_parsed"], r["spans_emitted"], r["parse_failures"],
                sorted(r["scores"].items()),
            )
            for r in extract_documents(
                docs, n_parts=16, num_partitions=4, use_arrow=use_arrow
            ).collect()
        }
    assert snap(True) == snap(False)


def test_preview_point_lookup(spark, tmp_path):
    """§3.3 preview path: point query over a committed run, with and without
    part_id pruning; missing doc/page -> None."""
    from pdf_extractor_spark.corpus import corpus_df
    from pdf_extractor_spark.core.extractor import extract_document
    from pdf_extractor_spark.corpus import gen_documents
    from pdf_extractor_spark.spark.lineage import CommitLog, run_extraction
    from pdf_extractor_spark.spark.preview import doc_spans, read_page

    log = CommitLog(str(tmp_path / "log"))
    run_extraction(spark, corpus_df(spark, 40, seed=5), log, n_parts=16,
                   parts_per_chunk=16, num_partitions=4)

    rows = gen_documents(40, seed=5)
    target = rows[7]
    want = extract_document(target["spans"]).spans

    got = [
        (r["kind"], r["text"], r["media_ref"], r["offset"])
        for r in doc_spans(spark, log, target["doc_id"], n_parts=16).collect()
    ]
    assert got == want

    # part_id filter must reach the scan as a PartitionFilter (directory
    # pruning — the partitioned-layout payoff), not a rowgroup predicate
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import plan_of

    plan = plan_of(doc_spans(spark, log, target["doc_id"], n_parts=16))
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "(part_id" in pf and "(chunk" in pf, plan

    page1 = read_page(spark, log, target["doc_id"], 1, n_parts=16)
    assert page1 is not None
    assert page1["content"] == want[0][1]
    assert 0.0 <= page1["scores"]["parse_score"] <= 1.0
    assert page1["total_spans"] == len(want)

    assert read_page(spark, log, target["doc_id"], len(want) + 5) is None
    assert read_page(spark, log, "no-such-doc", 1) is None


def test_preview_duplicate_doc_resolves_to_canonical_copy(spark, tmp_path):
    """A doc committed in two epochs (legitimate under streaming appends)
    has two rows; the preview point queries must answer from ONE canonical
    copy (most spans) — not interleave both copies' spans, and not answer
    None for a page only the longer copy holds (review finding)."""
    import os

    import pyspark.sql.functions as F

    from pdf_extractor_spark.corpus import corpus_df, gen_documents
    from pdf_extractor_spark.core.extractor import extract_document
    from pdf_extractor_spark.spark.lineage import (
        CommitLog,
        _chunk_dirname,
        run_extraction,
    )
    from pdf_extractor_spark.spark.preview import doc_spans, read_page

    log = CommitLog(str(tmp_path / "log"))
    run_extraction(spark, corpus_df(spark, 20, seed=5), log, n_parts=16,
                   parts_per_chunk=16, num_partitions=4)
    rows = gen_documents(20, seed=5)
    target = next(
        r for r in rows if len(extract_document(r["spans"]).spans) >= 3
    )
    want = extract_document(target["spans"]).spans

    # commit a second, TRUNCATED copy of the doc as a later chunk
    dup = (
        log.read_extracted(spark)
        .where(F.col("doc_id") == target["doc_id"])
        .withColumn("spans", F.slice("spans", 1, 1))
    )
    part = dup.select("part_id").collect()[0]["part_id"]
    cid = log.reserve_chunk_id()
    dup.write.partitionBy("part_id").mode("append").parquet(
        os.path.join(log.data_dir, _chunk_dirname(cid))
    )
    log.commit_chunk(cid, [part], {"docs": 1}, n_parts=16)
    assert (
        log.read_extracted(spark)
        .where(F.col("doc_id") == target["doc_id"])
        .count()
        == 2
    )

    got = [
        (r["kind"], r["text"], r["media_ref"], r["offset"])
        for r in doc_spans(spark, log, target["doc_id"]).collect()
    ]
    assert got == want  # full copy, each offset exactly once
    # a page only the LONG copy holds must still resolve
    last = read_page(spark, log, target["doc_id"], len(want))
    assert last is not None and last["content"] == want[-1][1]


def test_preview_n_parts_recorded_and_validated(spark, tmp_path):
    """ADVICE r01: the writer's n_parts is recorded in the commit log, the
    reader uses it without being told, and a mismatched caller value fails
    loudly instead of silently pruning the doc away."""
    from pdf_extractor_spark.corpus import corpus_df, gen_documents
    from pdf_extractor_spark.core.extractor import extract_document
    from pdf_extractor_spark.spark.lineage import CommitLog, run_extraction
    from pdf_extractor_spark.spark.preview import doc_spans, read_page

    log = CommitLog(str(tmp_path / "log"))
    run_extraction(spark, corpus_df(spark, 30, seed=9), log, n_parts=16,
                   parts_per_chunk=16, num_partitions=4)
    assert log.n_parts() == 16

    rows = gen_documents(30, seed=9)
    target = rows[3]
    want = extract_document(target["spans"]).spans

    # no n_parts supplied: the recorded value still prunes to one partition
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import plan_of

    df = doc_spans(spark, log, target["doc_id"])
    pf = next(l for l in plan_of(df).splitlines() if "PartitionFilters" in l)
    assert "(part_id" in pf
    got = [(r["kind"], r["text"], r["media_ref"], r["offset"]) for r in df.collect()]
    assert got == want

    with pytest.raises(ValueError, match="does not match the writer"):
        doc_spans(spark, log, target["doc_id"], n_parts=8)
    with pytest.raises(ValueError, match="does not match the writer"):
        read_page(spark, log, target["doc_id"], 1, n_parts=64)


def test_export_markdown_zip(spark, tmp_path):
    """S8 analogue: committed output exports to one deterministic zip of
    per-doc markdown; committed data survives the export (the reference's
    destructive cleanup is NOT mirrored)."""
    import zipfile

    from pdf_extractor_spark.spark.export import export_markdown_zip, markdown_expr

    root = str(tmp_path / "commitlog")
    docs = corpus_df(spark, 40)
    log = L.CommitLog(root)
    L.run_extraction(spark, docs, log, n_parts=8, parts_per_chunk=4)

    zip1 = str(tmp_path / "export1.zip")
    zip2 = str(tmp_path / "export2.zip")
    n1 = export_markdown_zip(spark, root, zip1)
    n2 = export_markdown_zip(spark, root, zip2)
    assert n1 == n2 == 40
    with open(zip1, "rb") as a, open(zip2, "rb") as b:
        assert a.read() == b.read()  # byte-deterministic archive

    from pyspark.sql import functions as F

    want = {
        r["doc_id"]: r["md"]
        for r in log.read_extracted(spark)
        .select("doc_id", markdown_expr("spans").alias("md"))
        .collect()
    }
    with zipfile.ZipFile(zip1) as zf:
        names = zf.namelist()
        assert names == sorted(names) and len(names) == 40
        for name in names:
            doc_id = name[: -len(".md")]
            assert zf.read(name).decode("utf-8") == want[doc_id]
    # committed data untouched by the export
    assert log.read_extracted(spark).count() == 40


def test_export_markdown_zip_sharded(spark, tmp_path):
    """S8 sharded option: exactly N archives, each byte-deterministic
    across runs, whose union equals the single-zip export entry-for-entry;
    doc->shard assignment is content-addressed (pmod(xxhash64(doc_id), N)),
    and empty shards still exist as empty zips (completeness glob)."""
    import zipfile

    from pdf_extractor_spark.spark.export import (
        export_markdown_zip,
        export_markdown_zip_sharded,
        shard_zip_name,
    )

    root = str(tmp_path / "commitlog")
    log = L.CommitLog(root)
    L.run_extraction(spark, corpus_df(spark, 40), log, n_parts=8, parts_per_chunk=4)

    single = str(tmp_path / "single.zip")
    assert export_markdown_zip(spark, root, single) == 40

    n_shards = 6
    out1, out2 = str(tmp_path / "shards1"), str(tmp_path / "shards2")
    assert export_markdown_zip_sharded(spark, root, out1, n_shards) == 40
    assert export_markdown_zip_sharded(spark, root, out2, n_shards) == 40

    # completeness: exactly N archives, rerun byte-identical shard by shard
    for out in (out1, out2):
        assert sorted(os.listdir(out)) == [
            shard_zip_name(k) for k in range(n_shards)
        ]
    union: dict[str, bytes] = {}
    n_nonempty = 0
    for k in range(n_shards):
        p1, p2 = [os.path.join(d, shard_zip_name(k)) for d in (out1, out2)]
        with open(p1, "rb") as a, open(p2, "rb") as b:
            assert a.read() == b.read()
        with zipfile.ZipFile(p1) as zf:
            names = zf.namelist()
            assert names == sorted(names)  # in-shard doc_id order
            n_nonempty += bool(names)
            for name in names:
                assert name not in union  # shards are disjoint
                union[name] = zf.read(name)
    assert n_nonempty > 1  # 40 docs over 6 shards: really sharded
    # union of shards == the single archive, entry-for-entry
    with zipfile.ZipFile(single) as zf:
        assert sorted(zf.namelist()) == sorted(union)
        for name in zf.namelist():
            assert zf.read(name) == union[name]

    # a shard count above the doc count forces empty shards; they exist
    out3 = str(tmp_path / "shards3")
    assert export_markdown_zip_sharded(spark, root, out3, 64) == 40
    empties = [
        k
        for k in range(64)
        if not zipfile.ZipFile(os.path.join(out3, shard_zip_name(k))).namelist()
    ]
    assert empties  # backfilled, readable, empty

    # n_shards=1 is the directory layout too (the CLI routes ANY --shards
    # here): one shard archive whose entries equal the single-zip export
    out4 = str(tmp_path / "shards4")
    assert export_markdown_zip_sharded(spark, root, out4, 1) == 40
    assert os.listdir(out4) == [shard_zip_name(0)]
    with zipfile.ZipFile(os.path.join(out4, shard_zip_name(0))) as zf, \
            zipfile.ZipFile(single) as zs:
        assert zf.namelist() == zs.namelist()

    # publish is whole-directory: re-exporting onto an existing out_dir
    # replaces it wholesale, leaving no staging/retired litter behind
    assert export_markdown_zip_sharded(spark, root, out4, 1) == 40
    assert os.listdir(out4) == [shard_zip_name(0)]
    litter = [
        n
        for n in os.listdir(os.path.dirname(out4))
        if ".inprogress-" in n or ".retired-" in n
    ]
    assert litter == []


def test_export_zip_time_travel(spark, tmp_path):
    """as_of exports exactly the pinned snapshot's documents."""
    import zipfile

    from pdf_extractor_spark.spark.export import export_markdown_zip

    root = str(tmp_path / "commitlog")
    log = L.CommitLog(root)
    L.run_extraction(spark, corpus_df(spark, 30), log, n_parts=4, parts_per_chunk=2)
    snap1 = log.committed_chunks()[-1]["chunk_id"]
    L.run_extraction(
        spark, corpus_df(spark, 50, seed=7), log, n_parts=4, parts_per_chunk=2
    )

    zpath = str(tmp_path / "old.zip")
    n = export_markdown_zip(spark, root, zpath, as_of=snap1)
    assert n == 30
    with zipfile.ZipFile(zpath) as zf:
        assert all("doc-42-" in name for name in zf.namelist())


def test_export_entry_name_sanitization():
    """Arbitrary doc_ids can't produce zip-slip paths, subdirectories, or
    silently-shadowed duplicate entries."""
    from pdf_extractor_spark.spark.export import _entry_name

    seen = set()
    assert _entry_name("../../etc/passwd", seen) == "_.._etc_passwd.md"
    assert _entry_name("a/b", seen) == "a_b.md"
    assert _entry_name("a_b", seen) == "a_b~1.md"  # collision gets a suffix
    assert _entry_name("...", seen) == "doc.md"
    assert len(seen) == 4


def test_empty_chunk_commits_without_crash(spark, tmp_path):
    """A chunk whose parts received zero docs must still commit (and count
    as done on resume) instead of dying in schema inference on a directory
    holding only _SUCCESS."""
    root = str(tmp_path / "commitlog")
    docs = corpus_df(spark, 1)  # one doc -> most parts empty
    log = L.CommitLog(root)
    report = L.run_extraction(spark, docs, log, n_parts=8, parts_per_chunk=4)
    assert report.parts_processed == 8  # both chunks committed
    assert log.committed_part_ids() == set(range(8))
    # resume is a no-op, not a re-crash
    again = L.run_extraction(spark, docs, log, n_parts=8, parts_per_chunk=4)
    assert again.parts_processed == 0 and again.parts_skipped == 8
    assert log.read_extracted(spark).count() == 1


def test_resume_with_different_n_parts_refuses(spark, tmp_path):
    """Re-running with a different n_parts would re-hash docs into 'new'
    parts and duplicate rows — the append path must refuse."""
    root = str(tmp_path / "commitlog")
    docs = corpus_df(spark, 20)
    log = L.CommitLog(root)
    L.run_extraction(spark, docs, log, n_parts=8, parts_per_chunk=8)
    with pytest.raises(ValueError, match="n_parts=8"):
        L.run_extraction(spark, docs, log, n_parts=16, parts_per_chunk=8)
    assert log.read_extracted(spark).count() == 20  # nothing duplicated


def test_out_of_order_commit_visible_to_incremental_and_as_of(spark, tmp_path):
    """Chunk ids are reserve-ordered; a slow writer can commit a LOW id
    late. Incremental cursors and as_of horizons follow COMMIT order, so
    the late chunk is neither skipped by consumers nor folded into a
    snapshot that predates its commit."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "commitlog")
    log = L.CommitLog(root)
    # slow writer reserves chunk 0 but doesn't commit yet
    slow_id = log.reserve_chunk_id()
    assert slow_id == 0
    # fast writer commits chunk 1 meanwhile (same n_parts as every writer
    # to this table — the commit layer rejects a mismatch — with part
    # ranges kept disjoint by filtering)
    fast = extract_documents(
        corpus_df(spark, 10), n_parts=8, num_partitions=2
    ).where(F.col("part_id") < 4)
    n_fast = fast.count()
    assert n_fast > 0
    fast_id = log.reserve_chunk_id()
    L._write_chunk(spark, log, fast, fast_id, [0, 1, 2, 3], 8)
    # slow writer finally lands chunk 0 (disjoint parts, append semantics)
    slow = extract_documents(
        corpus_df(spark, 30, seed=7), n_parts=8, num_partitions=2
    ).where(F.col("part_id") >= 4)
    n_slow = slow.count()
    assert n_slow > 0
    L._write_chunk(spark, log, slow, slow_id, [4, 5, 6, 7], 8)

    # commit order: chunk 1 first, chunk 0 second
    assert [c["chunk_id"] for c in log.committed_chunks()] == [1, 0]
    # a consumer whose cursor reached snapshot 1 must still see chunk 0
    inc = log.read_incremental(spark, after=fast_id)
    assert inc.count() == n_slow
    # time travel to snapshot 1 excludes the later-committed chunk 0
    assert log.read_extracted(spark, as_of=fast_id).count() == n_fast
    assert log.read_extracted(spark).count() == n_fast + n_slow


def test_sharded_export_replaces_prior_single_zip_file(spark, tmp_path):
    """Re-exporting with --shards over a path holding a PRIOR single-zip
    export (a regular file) must retire the file cleanly — directory
    published, no .retired litter."""
    from pdf_extractor_spark.spark.export import (
        export_markdown_zip,
        export_markdown_zip_sharded,
        shard_zip_name,
    )

    root = str(tmp_path / "commitlog")
    log = L.CommitLog(root)
    L.run_extraction(spark, corpus_df(spark, 10), log, n_parts=2, parts_per_chunk=1)

    target = str(tmp_path / "exp" / "out")
    assert export_markdown_zip(spark, root, target) == 10  # a FILE at target
    assert os.path.isfile(target)
    assert export_markdown_zip_sharded(spark, root, target, 2) == 10
    assert os.path.isdir(target)
    assert sorted(os.listdir(target)) == [shard_zip_name(k) for k in range(2)]
    litter = [
        n
        for n in os.listdir(tmp_path / "exp")
        if ".retired-" in n or ".inprogress-" in n
    ]
    assert litter == []


def test_schema_evolution_add_and_drop_column(spark, tmp_path):
    """Iceberg-parity schema evolution over the commit protocol: the scan
    takes the CALLER's schema, so (a) adding a nullable column is one
    contract bump — chunks written before the column exists read back as
    NULL, chunks written after carry values, in the SAME snapshot read;
    (b) reading with the old schema prunes the new column from newer
    chunks (drop-column view); (c) time travel composes with both. No
    rewrite of old files, exactly Iceberg's add/drop semantics."""
    from pdf_extractor_spark.spark.lineage import _chunk_dirname

    root = str(tmp_path / "evolve")
    log = L.CommitLog(root)
    v1 = "doc_id string, n_spans int, part_id int"
    v2 = "doc_id string, n_spans int, quality_micros bigint, part_id int"

    def write_chunk(rows, schema):
        cid = log.reserve_chunk_id()
        df = spark.createDataFrame(rows, schema)
        df.write.partitionBy("part_id").mode("append").parquet(
            os.path.join(log.data_dir, _chunk_dirname(cid))
        )
        parts = sorted({r[-1] for r in rows})
        log.commit_chunk(cid, parts, {"docs": len(rows)}, n_parts=8)

    write_chunk([("a", 3, 0), ("b", 1, 1)], v1)
    write_chunk([("c", 2, 900_000, 2), ("d", 5, 400_000, 3)], v2)

    # (a) evolved read: one scan over both chunks, old rows NULL-filled
    got = {r["doc_id"]: r for r in log.read_table(spark, v2).collect()}
    assert set(got) == {"a", "b", "c", "d"}
    assert got["a"]["quality_micros"] is None
    assert got["b"]["quality_micros"] is None
    assert got["c"]["quality_micros"] == 900_000
    assert got["d"]["quality_micros"] == 400_000
    assert got["a"]["n_spans"] == 3  # shared columns intact across versions

    # (b) old-schema read still sees every chunk (new column pruned)
    old = log.read_table(spark, v1)
    assert "quality_micros" not in old.columns
    assert {r["doc_id"] for r in old.collect()} == {"a", "b", "c", "d"}

    # (c) time travel with the evolved schema: snapshot 0 predates v2
    at0 = log.read_table(spark, v2, as_of=0).collect()
    assert {r["doc_id"] for r in at0} == {"a", "b"}
    assert all(r["quality_micros"] is None for r in at0)


def test_per_doc_password_column_both_paths(spark):
    """``password_col`` (round 4): a (doc_id, password) manifest left-joined
    onto the encrypted corpus unlocks exactly the passworded docs — per-doc
    candidates beat a global list at scale because each locked doc pays ONE
    V5 key derivation. Arrow and pandas kernels must agree with the
    closed-form unlocked expectation; docs outside the manifest (null
    password) still decrypt via the empty-password path."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.corpus import (
        corpus_parquet,
        expected_extraction_rows,
    )
    from pdf_extractor_spark.spark.pipeline import extract_documents

    docs = spark.read.parquet(corpus_parquet(24, seed=7, profile="encrypted"))
    manifest = (
        docs.select("doc_id")
        .where(F.substring("doc_id", -8, 8).cast("int") % 7 == 0)
        .withColumn("password", F.lit("real-password"))
    )
    joined = docs.join(F.broadcast(manifest), "doc_id", "left")
    exp = {
        r["doc_id"]: r["parse_failures"]
        for r in expected_extraction_rows(
            24, seed=7, profile="encrypted", unlock_passworded=True
        )
    }
    assert sum(exp.values()) == 0  # every doc unlocks under the manifest
    for use_arrow in (True, False):
        ext = extract_documents(
            joined,
            n_parts=8,
            num_partitions=4,
            password_col="password",
            use_arrow=use_arrow,
        )
        got = {
            r["doc_id"]: r["parse_failures"]
            for r in ext.select("doc_id", "parse_failures").collect()
        }
        assert got == exp, use_arrow


def test_reextract_parts_keeps_password_column(spark, tmp_path):
    """--refresh-parts --password-manifest (round-5 ADVICE fix):
    ``reextract_parts`` must keep the joined manifest password column
    through its (doc_id, spans) projection — dropping it crashed
    ``extract_documents(password_col=...)`` with an unresolved-column
    AnalysisException. Refreshed parts must unlock their passworded docs."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.corpus import (
        corpus_parquet,
        expected_extraction_rows,
    )
    from pdf_extractor_spark.spark import lineage as L

    docs = spark.read.parquet(corpus_parquet(24, seed=7, profile="encrypted"))
    manifest = (
        docs.select("doc_id")
        .where(F.substring("doc_id", -8, 8).cast("int") % 7 == 0)
        .withColumn("password", F.lit("real-password"))
    )
    joined = docs.join(F.broadcast(manifest), "doc_id", "left")

    log = L.CommitLog(str(tmp_path / "tbl"))
    # baseline commit WITHOUT the manifest: passworded docs fail to parse
    L.run_extraction(spark, docs, log, n_parts=8, parts_per_chunk=8,
                     num_partitions=4)
    before = dict(
        log.read_extracted(spark)
        .select("doc_id", "parse_failures").collect()
    )
    assert sum(before.values()) > 0  # some docs locked without passwords

    # overwrite every part WITH the per-doc passwords flowing through
    report = L.reextract_parts(
        spark, joined, log, parts=list(range(8)),
        num_partitions=4, password_col="password",
    )
    assert report.parts_processed == 8
    exp = {
        r["doc_id"]: r["parse_failures"]
        for r in expected_extraction_rows(
            24, seed=7, profile="encrypted", unlock_passworded=True
        )
    }
    after = dict(
        log.read_extracted(spark)
        .select("doc_id", "parse_failures").collect()
    )
    assert after == exp and sum(after.values()) == 0
