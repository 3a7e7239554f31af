"""Shuffle-workload two-level scaling probe (north_rule evidence).

The extraction pipeline's scaling sweep (bench.py --two-level) exercises a
map-heavy job: one scatter exchange, then per-doc Arrow kernels. This probe
measures the OTHER regime the north_rule cares about at 100 TB — a
shuffle-dominated dedup path:

    MinHash signatures (shingle explode -> md5 -> 16-min partial agg,
    one doc_id-keyed exchange)
    -> LSH banding
    -> (band_id, band_hash)-keyed collision-bucket count

over an inline-replicated sf0.1 documents corpus (5,000 docs x K replicas,
doc_id offset per replica so every row is distinct), materialized ONCE to
parquet and repartitioned so both parallelism levels scan identical bytes
with identical split counts (a single parquet file scans as 1-2 partitions
regardless of cores — the one false-negative this probe hit before the
corpus was written pre-split; see BENCH/BASELINE.md "Shuffle-workload
scaling").

Protocol mirrors bench.py: per-level sessions interleaved across rounds,
best per level (shared host, ±50% co-tenant noise), identical input and an
asserted-identical result (collision-bucket count) at every level.

    python tools/bench_shuffle.py                 # K=768 (3.84M docs), levels 2/8
    python tools/bench_shuffle.py --replicas 1536 # 7.68M docs
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _materialize(sf_dir: str, replicas: int, n_files: int) -> tuple[str, int]:
    """Write the replicated corpus once; both levels scan the same bytes."""
    out = f"/tmp/bench-shuffle-corpus-x{replicas}"
    marker = Path(out) / "_COMPLETE"
    base = 5000  # sf0.1 documents rows; asserted below
    if marker.exists():
        return out, base * replicas

    from pyspark.sql import functions as F

    from bench import _make_spark

    spark = _make_spark(8, "bench-shuffle-materialize")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n = docs.count()
        rep = docs.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
        ).select(
            (F.col("doc_id") * replicas + F.col("r")).alias("doc_id"), "text"
        )
        shutil.rmtree(out, ignore_errors=True)
        rep.repartition(n_files).write.parquet(out)
        marker.touch()
        return out, n * replicas
    finally:
        spark.stop()


def _collision_buckets(spark, corpus: str, limit: int | None = None) -> int:
    """The timed workload: signatures -> bands -> collision-bucket count."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.ops.dedup import _banded_from, _signatures_from, shingles

    docs = spark.read.parquet(corpus)
    if limit is not None:
        docs = docs.limit(limit)
    banded = _banded_from(_signatures_from(shingles(docs)))
    return (
        banded.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )


def probe(corpus: str, n_docs: int, levels=(2, 8), rounds: int = 2) -> dict:
    from bench import _make_spark

    best: dict[int, float] = {lvl: 0.0 for lvl in levels}
    results: set[int] = set()
    for _ in range(rounds):  # interleaved across levels, best per level
        for lvl in levels:
            spark = _make_spark(lvl, f"bench-shuffle-{lvl}")
            try:
                # warmup: spawn workers + codegen on a slice, untimed
                _collision_buckets(spark, corpus, limit=2000)
                t0 = time.monotonic()
                results.add(_collision_buckets(spark, corpus))
                dt = time.monotonic() - t0
                best[lvl] = max(best[lvl], n_docs / dt)
            finally:
                spark.stop()
    assert len(results) == 1, f"levels disagree: {results}"
    out = {
        "workload": "minhash_signatures+lsh_banding collision count",
        "docs": n_docs,
        "collision_buckets": results.pop(),
        "levels": {f"local[{k}]": round(v, 1) for k, v in best.items()},
    }
    pairs = [(a, b) for a, b in zip(levels, levels[1:]) if b == 4 * a]
    for a, b in pairs:
        out[f"efficiency_{a}to{b}"] = round((best[b] / best[a]) / (b / a), 3)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--replicas", type=int, default=768)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument(
        "--n-files", type=int, default=128,
        help="parquet files the replicated corpus is written as (scan splits)",
    )
    args = ap.parse_args()

    corpus, n_docs = _materialize(args.sf_dir, args.replicas, args.n_files)
    print(json.dumps(probe(corpus, n_docs, rounds=args.rounds)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
