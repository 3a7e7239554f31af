"""Sketch-operator quality bounds (value equality vs DuckDB is pinned by
the oracle spot check in test_ops.py and the driver's gate; these tests pin
the *estimator* properties that equality alone can't see)."""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.ops.sketches import (  # noqa: E402
    APPROX_DISTINCT_KMV_SQL,
    HEAVY_HITTERS_CMS_SQL,
    KMV_K,
)

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.1"


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return con


def test_kmv_small_group_exact_fallback(spark):
    """Groups with < k distinct values report the exact count (the KMV
    order statistic is undefined there), exercised on the Spark side."""
    from pdf_extractor_spark.ops.sketches import q_approx_distinct_kmv

    rows = q_approx_distinct_kmv(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_exact < KMV_K
        assert r.kmv_est == r.n_exact


def test_kmv_and_threshold_error_bounds():
    """At sf0.1 (1500 distinct per group, estimator path) both estimates
    land within 15% of truth. Values are engine-identical by the oracle
    gate, so the cheap DuckDB side suffices for the quality bound."""
    rows = _duck(SF_BIG).execute(APPROX_DISTINCT_KMV_SQL).fetchall()
    for _etype, n_exact, kmv_est, thresh_est in rows:
        assert n_exact >= KMV_K
        assert abs(kmv_est - n_exact) / n_exact < 0.15, (kmv_est, n_exact)
        assert abs(thresh_est - n_exact) / n_exact < 0.15, (thresh_est, n_exact)


def test_cms_never_undercounts_spark(spark):
    from pdf_extractor_spark.ops.sketches import q_heavy_hitters_cms

    rows = q_heavy_hitters_cms(spark, SF_SMALL).collect()
    assert len(rows) == 10
    assert all(r.est_n >= r.true_n for r in rows)
    # 15 keys into 4x1024 counters: collision-free, every estimate exact
    assert all(r.est_n == r.true_n for r in rows)


def test_cms_one_sided_error_at_scale():
    rows = _duck(SF_BIG).execute(HEAVY_HITTERS_CMS_SQL).fetchall()
    assert len(rows) == 10
    for _uid, true_n, est_n in rows:
        assert est_n >= true_n  # CMS overestimates only
        # additive error bound: eps*N with eps=e/w, N=100k events ->
        # ~266; generous 2x headroom against future testdata regen
        assert est_n - true_n < 2 * 266, (true_n, est_n)
