"""Incremental curation-verdict stage: gates + cross-run exact dedup.

The third pass of the pipeline (extraction -> signals -> curate): every
committed document gets ONE verdict row — ``keep`` or ``reject`` with a
reason — derived from the same single map-only scan the signals stage
makes, plus one digest-keyed exchange for exact deduplication. Reference
parity: the reference's curation loop (quality gate, then content-hash
dedup against the already-accepted set) re-expressed as a Spark plan over
the commit log; here the "already-accepted set" is the stage's OWN
committed output (the kept-digest index), so dedup is consistent across
any number of incremental runs without a separate state store.

Verdict semantics (deterministic, oracle-checkable):

- gates, in priority order (first hit wins):
  ``too_short``   n_tokens < MIN_TOKENS
  ``language``    pred_lang == 'unknown'
  ``quality``     stopword_micros < MIN_STOPWORD_MICROS
- among gate-passing docs only, exact dedup on ``digest`` = md5 of the
  NORMALIZED extracted text — lowercased, whitespace collapsed to single
  spaces (the token stream re-joined) — so span-boundary artifacts (an
  empty trailing span, a tab vs a space) never split a duplicate group
  (gate-rejected docs never claim a digest slot):
  within the batch the LEXICOGRAPHICALLY-SMALLEST doc_id per digest wins;
  a digest already kept by a PRIOR committed run beats the whole batch.
  Losers get ``reason='duplicate'`` and ``dup_of`` = the winner's doc_id.

Incrementality and crash-safety come from spark/derived.py (cursor in the
marker, append-only windows, rebuild-as-overwrite). One curate-specific
wrinkle: ``rebuild`` recomputes dedup GLOBALLY over the full table with an
EMPTY index — the overwrite chunk shadows all prior verdicts, so consulting
them would resurrect winners the rebuild is meant to re-decide.

Scale shape: md5 + gates are JVM codegen over the delta scan; dedup is one
shuffle keyed on (digest, gate-pass) — skew-free by construction (a digest
group is a set of byte-identical documents) — plus a broadcast-or-shuffle
left join of the delta against the kept index, which Spark sizes at
runtime (AQE). At 100 TB the index side is big but (digest, dup_of)-narrow;
the join key is the same digest the window just shuffled on.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .derived import run_derived_stage
from .lineage import CommitLog, RunReport
from .signals import compute_signals, signal_text

# bump whenever verdict semantics change: fixture caches key on it so stale
# committed verdicts can never satisfy a check against new definitions
CURATE_COMPUTE_VERSION = 1

MIN_TOKENS = 20
MIN_STOPWORD_MICROS = 30_000

CURATED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("digest", StringType()),
        StructField("n_tokens", LongType()),
        StructField("pred_lang", StringType()),
        StructField("verdict", StringType(), False),
        StructField("reason", StringType()),  # null iff verdict='keep'
        StructField("dup_of", StringType()),  # null unless reason='duplicate'
        StructField("part_id", IntegerType()),
    ]
)


def kept_digest_index(spark: SparkSession, out_log: CommitLog) -> DataFrame:
    """(digest, dup_of) for every digest a prior committed run KEPT.

    Unique per digest by construction: an incremental run keeps a digest
    only if no prior run did, and a rebuild shadows everything."""
    kept = read_curated(spark, out_log).where(F.col("verdict") == "keep")
    return kept.select("digest", F.col("doc_id").alias("_idx_dup_of"))


def compute_verdicts(extracted: DataFrame, kept_index: DataFrame | None) -> DataFrame:
    """Verdict rows for one batch of extracted docs, deduped against
    ``kept_index`` (None = empty, the rebuild path)."""
    from ..ops.portable import tokens

    normalized = F.array_join(tokens(signal_text()), " ")
    sig = compute_signals(
        extracted, extra={"digest": F.md5(F.encode(normalized, "UTF-8"))}
    )
    gated = sig.select(
        "doc_id",
        "digest",
        "n_tokens",
        "pred_lang",
        "part_id",
        F.when(F.col("n_tokens") < MIN_TOKENS, F.lit("too_short"))
        .when(F.col("pred_lang") == "unknown", F.lit("language"))
        .when(F.col("stopword_micros") < MIN_STOPWORD_MICROS, F.lit("quality"))
        .alias("_gate"),
    )
    # one window pass ranks EVERY row, but partitioning includes the gate
    # verdict, so gate-rejected docs rank only among themselves and never
    # displace a passing doc's claim on the digest (their rank is unused)
    w = Window.partitionBy("digest", F.col("_gate").isNull()).orderBy("doc_id")
    ranked = gated.select(
        "*",
        F.row_number().over(w).alias("_rn"),
        F.first("doc_id").over(w).alias("_batch_winner"),
    )
    if kept_index is not None:
        # NOT hinted broadcast: the index grows with every run and is only
        # small early — AQE picks broadcast while it fits and falls back to
        # a digest-keyed shuffle join (same key the window just used) after
        ranked = ranked.join(kept_index, "digest", "left")
    else:
        ranked = ranked.withColumn("_idx_dup_of", F.lit(None).cast("string"))
    dup_of = F.when(
        F.col("_gate").isNull(),
        F.coalesce(
            "_idx_dup_of",
            F.when(F.col("_rn") > 1, F.col("_batch_winner")),
        ),
    )
    reason = F.coalesce("_gate", F.when(dup_of.isNotNull(), F.lit("duplicate")))
    return ranked.select(
        "doc_id",
        "digest",
        "n_tokens",
        "pred_lang",
        F.when(reason.isNull(), F.lit("keep")).otherwise(F.lit("reject")).alias(
            "verdict"
        ),
        reason.alias("reason"),
        dup_of.alias("dup_of"),
        "part_id",
    )


def run_curate(
    spark: SparkSession,
    src_log: CommitLog,
    out_log: CommitLog,
    rebuild: bool = False,
) -> RunReport:
    """One incremental curation pass (or a global-dedup rebuild)."""

    def _incremental(delta: DataFrame) -> DataFrame:
        return compute_verdicts(delta, kept_digest_index(spark, out_log))

    def _rebuild(full: DataFrame) -> DataFrame:
        return compute_verdicts(full, None)

    return run_derived_stage(
        spark,
        src_log,
        out_log,
        CURATED_SCHEMA,
        "curate",
        _incremental,
        rebuild=rebuild,
        rebuild_compute=_rebuild,
    )


def read_curated(
    spark: SparkSession, out_log: CommitLog, as_of: int | None = None
) -> DataFrame:
    return out_log.read_table(spark, CURATED_SCHEMA, as_of=as_of)


def run_curate_job(
    spark: SparkSession, src_root: str, out_root: str, rebuild: bool = False
) -> tuple[RunReport, float]:
    t0 = time.monotonic()
    report = run_curate(
        spark, CommitLog(src_root), CommitLog(out_root), rebuild=rebuild
    )
    return report, time.monotonic() - t0
