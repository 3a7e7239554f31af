"""Physical-plan invariants: the plan properties that survive 100 TB.

Value-correctness lives in the oracle checks; these tests pin the *physical*
properties (pushdown, pruning, broadcast, exchange budget) so a regression
that keeps answers right but silently de-optimizes the plan still fails CI.
Shared invariant definitions: tools/plan_audit.py.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_audit import AUDITS, _query_df, plan_of  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name,factory,checks,exec_first", AUDITS, ids=[a[0] for a in AUDITS])
def test_plan_invariants(spark, name, factory, checks, exec_first):
    from pdf_extractor_spark.ops.dedup import release_caches

    try:
        df = factory(spark, SF_DIR, name) if factory is _query_df else factory(spark, SF_DIR)
        if exec_first:
            df.collect()  # materialize AQE's final plan on THIS QueryExecution
        plan = plan_of(df)
    finally:
        release_caches()  # builders may stage persisted intermediates
    failures = [detail for ok, detail in (chk(plan) for chk in checks) if not ok]
    assert not failures, f"{name}: {failures}\n--- plan ---\n{plan}"


def test_bare_key_exchange_pin_detects_fat_stream():
    """The Zipf-skew pin (lm_score) must be non-vacuous: it parses the
    formatted details section (Input line between node header and Arguments)
    and fails when a bare-hot-key exchange carries the per-document stream."""
    from plan_audit import bare_key_exchanges_are_count_tables

    count_table = (
        "(26) Exchange\n"
        "Input [2]: [w1#71, count#283L]\n"
        "Arguments: hashpartitioning(w1#71, 8), ENSURE_REQUIREMENTS, [plan_id=1]\n"
    )
    fat_stream = (
        "(30) Exchange\n"
        "Input [4]: [w1#71, w2#72, doc_id#3L, n_occ#9L]\n"
        "Arguments: hashpartitioning(w1#71, 8), ENSURE_REQUIREMENTS, [plan_id=2]\n"
    )
    composite = (
        "(34) Exchange\n"
        "Input [4]: [w1#71, w2#72, doc_id#3L, n_occ#9L]\n"
        "Arguments: hashpartitioning(w1#71, w2#72, 8), ENSURE_REQUIREMENTS, [plan_id=3]\n"
    )
    ok, detail = bare_key_exchanges_are_count_tables(count_table + composite, "w1", "doc_id")
    assert ok and "(1)" in detail, detail  # composite-key exchange not counted as bare
    ok, detail = bare_key_exchanges_are_count_tables(count_table + fat_stream, "w1", "doc_id")
    assert not ok and "doc_id" in detail, detail


def test_runtime_bloom_filter_fires_on_selective_fact_join(spark):
    """At 100 TB the selective fact–fact joins get a runtime bloom-filter
    semi-join reduction for free: Spark 4.x injects might_contain() on the
    application side when the creation side is small/filtering and the
    probe scan exceeds applicationSideScanSizeThreshold (default 10 GiB —
    i.e. exactly the regime this engine targets). Pin (a) the feature is ON
    in the engine's session config, and (b) it actually fires on our join
    shape once the probe-side threshold matches toy data — so a future
    session-factory change that silently disables it fails here."""
    from pyspark.sql import functions as F

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    thr = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    bcast = "spark.sql.autoBroadcastJoinThreshold"
    old_thr, old_bcast = spark.conf.get(thr), spark.conf.get(bcast)
    spark.conf.set(thr, "1MB")
    spark.conf.set(bcast, "-1")  # force the shuffle join the filter serves
    try:
        sf = "/root/testdata/sf0.1"
        o = spark.read.parquet(f"{sf}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("q"))
        plan = plan_of(j)
        assert plan.count("might_contain") >= 1, plan
    finally:
        spark.conf.set(thr, old_thr)
        spark.conf.set(bcast, old_bcast)
