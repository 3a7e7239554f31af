"""State-store backend toggle for the stateful streaming operators.

Every stateful op here (``dedup_state``, ``quota``, ``stats``,
``windows``, ``joins``) keys its state by a hash-partitioned column, so
state volume is O(distinct keys) per executor. The default HDFS-backed
store keeps each partition's state map ON-HEAP and rewrites a full
``.delta``/``.snapshot`` file per batch — fine for bounded key spaces
(session windows with watermark eviction), but a first-seen dedup over a
10^12-doc corpus accumulates a key per distinct content digest and will
pressure executor memory long before it pressures disk.

Production setting for unbounded-key state (the documented toggle):

    spark.sql.streaming.stateStore.providerClass =
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled = true

RocksDB keeps state off-heap on executor-local disk (memory holds only
block cache + memtable) and, with changelog checkpointing, uploads per-
batch changelogs instead of re-snapshotting every version — the setting
that makes 10^8+ keys per executor viable. The provider ships inside
Spark (rocksdbjni is bundled); no extra jar.

The conf is read PER QUERY at start and pinned by the checkpoint: toggle
it before ``.start()``, and never flip an existing checkpoint between
backends (Spark refuses — the state formats differ). Exposed as
``SPARK_GRAFT_STATE_STORE=rocksdb|hdfs`` (session factory) and
``job.py --state-store`` (the streaming CLI paths).
"""

from __future__ import annotations

import contextlib

from pyspark.sql import SparkSession

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)

PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def configure_state_store(spark: SparkSession, backend: str) -> None:
    """Set the session's state-store provider for queries started AFTER
    this call. ``backend`` is ``"hdfs"`` (Spark default, on-heap) or
    ``"rocksdb"`` (off-heap, executor-local disk; changelog checkpointing
    enabled — the unbounded-key production setting)."""
    if backend not in PROVIDERS:
        raise ValueError(
            f"unknown state-store backend {backend!r}; "
            f"expected one of {sorted(PROVIDERS)}"
        )
    spark.conf.set(_PROVIDER_CONF, PROVIDERS[backend])
    spark.conf.set(_CHANGELOG_CONF, str(backend == "rocksdb").lower())


@contextlib.contextmanager
def state_store(spark: SparkSession, backend: str):
    """Scoped :func:`configure_state_store`: restores the previous provider
    on exit (tests run both backends in one session; a query already
    started keeps the provider it started with)."""
    prev_provider = spark.conf.get(_PROVIDER_CONF, None)
    prev_changelog = spark.conf.get(_CHANGELOG_CONF, None)
    configure_state_store(spark, backend)
    try:
        yield
    finally:
        for key, prev in (
            (_PROVIDER_CONF, prev_provider),
            (_CHANGELOG_CONF, prev_changelog),
        ):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
