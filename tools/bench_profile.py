#!/usr/bin/env python
"""Scale-profiling run of the extraction pipeline (the 10x/100x rows in
BENCH/BASELINE.md §"profiling run"): wall, throughput, and the
kernel-vs-non-kernel core-time split at a chosen corpus size.

The 100x corpus (1.6M heavy docs, ~8.6 GB parquet, ~16M pages) is too
large to generate through the single-stream corpus generator in one
piece (≈72 min single-threaded, ~50 GB of row lists), so it is built
as ``--slices`` independent heavy-profile slices with consecutive seeds
(42, 43, …), generated in PARALLEL processes and symlinked into one
directory. Each slice is the same deterministic generator output the
bench corpus uses; doc_ids repeat across slices, so the reader tags
them with the slice index from ``input_file_name()`` — at 100 TB the
same pattern is "one crawl dump per input file, ids unique per dump".

Measurement protocol mirrors the recorded 10x row: one small warmup,
then best-of-``--reps`` walls of the full pipeline
(scan -> balance scatter -> mapInArrow parse -> aggregate), with kernel
core-seconds summed from the kernel's own per-doc ``duration_ms`` in
the SAME action, so occupancy = kernel_core_s / (wall * cores).

Usage: python tools/bench_profile.py [--docs 1600000] [--slices 10]
       [--cores 32] [--reps 2]
Prints one JSON line; paste the row into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _gen_slice(args: tuple[int, int]) -> str:
    n, seed = args
    from pdf_extractor_spark.corpus import corpus_parquet

    return corpus_parquet(n, seed=seed, profile="heavy")


def build_corpus(n_docs: int, slices: int) -> str:
    from pdf_extractor_spark.corpus import _GEN_VERSION

    per = n_docs // slices
    assert per * slices == n_docs, "--docs must divide by --slices"
    out = os.path.join(
        tempfile.gettempdir(),
        f"pes-corpus-v{_GEN_VERSION}-heavy100x-{n_docs}-{slices}",
    )
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    with mp.Pool(min(slices, max(1, os.cpu_count() - 2))) as pool:
        dirs = pool.map(_gen_slice, [(per, 42 + i) for i in range(slices)])
    for i, d in enumerate(dirs):
        dst = os.path.join(out, f"slice-{i}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(d, "part-0.parquet"), dst)
    with open(done, "w"):
        pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_600_000)
    ap.add_argument("--slices", type=int, default=10)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    t0 = time.monotonic()
    corpus_dir = build_corpus(args.docs, args.slices)
    gen_s = time.monotonic() - t0

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdf_extractor_spark.spark.pipeline import extract_documents

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("bench-profile")
        .config("spark.sql.shuffle.partitions", str(args.cores * 4))
        .config("spark.sql.files.maxPartitionBytes", str(8 << 20))
        .config("spark.driver.memory", "96g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(corpus_dir).select(
            F.concat(
                F.regexp_extract(F.input_file_name(), r"slice-(\d+)", 1),
                F.lit("-"),
                F.col("doc_id"),
            ).alias("doc_id"),
            "spans",
        )

        def one_run() -> tuple[float, int, int, int]:
            t0 = time.monotonic()
            ext = extract_documents(
                docs,
                n_parts=256,
                balance=True,
                num_partitions=max(args.cores * 8, 256),
            )
            row = ext.agg(
                F.count("*").alias("n"),
                F.sum("duration_ms").alias("kernel_ms"),
                F.sum("pages_parsed").alias("pages"),
            ).collect()[0]
            wall = time.monotonic() - t0
            assert row["n"] == args.docs, (row["n"], args.docs)
            return wall, int(row["kernel_ms"]), int(row["pages"]), int(row["n"])

        extract_documents(
            docs.limit(args.cores * 8), n_parts=16, balance=True
        ).count()  # warmup
        runs = [one_run() for _ in range(args.reps)]
        wall, kernel_ms, pages, n = min(runs, key=lambda r: r[0])
    finally:
        spark.stop()

    kernel_core_s = kernel_ms / 1000.0
    out = {
        "metric": "extraction profiling run (best-of-%d)" % args.reps,
        "docs": n,
        "pages": pages,
        "cores": args.cores,
        "corpus_gen_s": round(gen_s, 1),
        "wall_s": round(wall, 1),
        "docs_per_s": round(n / wall, 1),
        "kernel_core_s": round(kernel_core_s, 1),
        "occupancy": round(kernel_core_s / (wall * args.cores), 3),
        "non_kernel_core_s": round(wall * args.cores - kernel_core_s, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
