"""Full derived-chain integration: extract -> signals -> curate ->
neardup -> pack -> materialize over TWO source waves, then the composed
kept-scope rebuild — the end-to-end path README promises, run as one
test so inter-stage contracts (cursor windows, scope/cost records,
epoch pinning, kept filters) can't drift apart unnoticed."""

from __future__ import annotations

import hashlib

import pytest

import pdf_extractor_spark.spark.lineage as L
from pdf_extractor_spark.ops.extraction_queries import wrap_documents
from pdf_extractor_spark.ops.training import CTX_TOKENS
from pdf_extractor_spark.spark.curate import GateConfig, read_curated, run_curate
from pdf_extractor_spark.spark.materialize import (
    read_materialized,
    run_materialize,
)
from pdf_extractor_spark.spark.neardup import run_neardup
from pdf_extractor_spark.spark.pack import read_packed, run_pack
from pdf_extractor_spark.spark.signals import read_signals, run_signals
from tests.helpers import write_docs


def test_full_chain_two_waves_then_kept_rebuild(spark, tmp_path):
    # corpus: mostly healthy English-ish docs; a short doc (too_short
    # gate), an exact-duplicate pair, and a near-duplicate pair
    base = (
        "the quick brown fox jumps over the lazy dog and the bird "
        "with a very long tail that keeps the token count up "
    )
    texts = {i: base + f"unique{i} " + base for i in range(20)}
    texts[3] = "tiny doc"                      # rejected: too_short
    texts[7] = texts[5]                        # exact duplicate of 5
    texts[11] = texts[9] + "extraword"         # near-duplicate of 9
    sf_dir = write_docs(tmp_path, texts)
    docs = wrap_documents(spark, sf_dir)

    src = L.CommitLog(str(tmp_path / "src"))
    sig = L.CommitLog(str(tmp_path / "sig"))
    cur = L.CommitLog(str(tmp_path / "cur"))
    nd = L.CommitLog(str(tmp_path / "nd"))
    pk = L.CommitLog(str(tmp_path / "pk"))
    mat = L.CommitLog(str(tmp_path / "mat"))
    gates = GateConfig(min_tokens=10, min_stopword_micros=0)

    def run_all():
        return (
            run_signals(spark, src, sig),
            run_curate(spark, src, cur, gates=gates),
            run_neardup(spark, src, nd),
            run_pack(spark, src, pk),
            run_materialize(spark, src, pk, mat),
        )

    # wave 1 (injected crash splits the corpus), then wave 2
    with pytest.raises(RuntimeError, match="injected failure"):
        L.run_extraction(spark, docs, src, n_parts=8, parts_per_chunk=4,
                         fail_after_chunks=1)
    for r in run_all():
        assert r.chunks_committed == 1
    L.run_extraction(spark, docs, src, n_parts=8, parts_per_chunk=4)
    for r in run_all():
        assert r.chunks_committed == 1
    # the whole chain is idempotent at the cursor
    for r in run_all():
        assert r.chunks_committed == 0

    # every doc exactly once in every per-doc derived table
    for reader, log in ((read_signals, sig), (read_curated, cur),
                        (read_packed, pk)):
        ids = [r["doc_id"] for r in reader(spark, log).select(
            "doc_id").collect()]
        assert len(ids) == 20 and len(set(ids)) == 20, reader.__name__

    verd = {r["doc_id"]: r for r in read_curated(spark, cur).collect()}
    assert verd["3"]["verdict"] == "reject"
    # the exact-dup pair resolves to one keep + one reject/duplicate,
    # whichever wave order the part hash dealt them
    pair = {verd["5"]["verdict"], verd["7"]["verdict"]}
    assert pair == {"keep", "reject"}
    loser = verd["7"] if verd["7"]["verdict"] == "reject" else verd["5"]
    assert loser["reason"] == "duplicate" and loser["dup_of"] in ("5", "7")

    # materialized contexts tile per epoch and cover every packed token
    rows = read_materialized(spark, mat).collect()
    packed = read_packed(spark, pk).collect()
    for epoch in {r["pack_epoch"] for r in rows}:
        ctxs = sorted(
            (r["ctx"], r["n_tokens"]) for r in rows
            if r["pack_epoch"] == epoch
        )
        total = sum(p["n_tokens"] for p in packed
                    if p["pack_epoch"] == epoch)
        assert sum(n for _, n in ctxs) == total
        assert all(n == CTX_TOKENS for _, n in ctxs[:-1])

    # composed kept-scope rebuild: pack then materialize over exactly the
    # docs curate kept MINUS near-dup flags — the shipped training corpus
    run_pack(spark, src, pk, rebuild=True, kept_from=cur, neardup_from=nd)
    r = run_materialize(spark, src, pk, mat, rebuild=True)
    assert r.chunks_committed == 1
    kept_ids = {d for d, v in verd.items() if v["verdict"] == "keep"}
    nd_flagged = {
        r["doc_id"]
        for r in nd.read_table(
            spark,
            __import__(
                "pdf_extractor_spark.spark.neardup", fromlist=["NEARDUP_SCHEMA"]
            ).NEARDUP_SCHEMA,
        ).collect()
        if r["dup_of"] is not None
    }
    shipped = kept_ids - nd_flagged
    placed = {r["doc_id"] for r in read_packed(spark, pk).collect()}
    assert placed == shipped
    assert "3" not in placed and len(placed) < 20

    # the rebuilt materialization is ONE epoch whose contexts assemble
    # exactly the shipped docs' token stream in md5 placement order
    rows = read_materialized(spark, mat).collect()
    assert len({r["pack_epoch"] for r in rows}) == 1
    stream = [
        t
        for _h, d in sorted(
            (int(hashlib.md5(d.encode()).hexdigest()[:15], 16), d)
            for d in shipped
        )
        for t in texts[int(d)].lower().split()
    ]
    got = {r["ctx"]: r["text"] for r in rows}
    n_ctx = -(-len(stream) // CTX_TOKENS)
    assert set(got) == set(range(n_ctx))
    for c in range(n_ctx):
        assert got[c] == " ".join(stream[c * CTX_TOKENS:(c + 1) * CTX_TOKENS])
