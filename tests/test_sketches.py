"""Sketch-operator quality bounds (value equality vs DuckDB is pinned by
the oracle spot check in test_ops.py and the driver's gate; these tests pin
the *estimator* properties that equality alone can't see)."""

import sys
from collections import defaultdict
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.ops.sketches import (  # noqa: E402
    APPROX_DISTINCT_KMV_SQL,
    HEAVY_HITTERS_CMS_SQL,
    HLL_DISTINCT_SQL,
    HLL_M,
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


def _duck_li(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    return con


def test_hll_error_bound_at_scale():
    """At sf0.1 (>=110k distinct per flag, deep in the raw-estimator
    regime n >= 2.5m) every estimate lands within 3 SE (~20%) of truth;
    values are engine-identical by the oracle gate."""
    rows = _duck_li(SF_BIG).execute(HLL_DISTINCT_SQL).fetchall()
    assert len(rows) == 4  # A / ALL / N / R
    for _scope, n_exact, v_zero, hll_est in rows:
        assert n_exact >= 2.5 * HLL_M
        assert v_zero == 0  # every register hit at this cardinality
        assert abs(hll_est - n_exact) / n_exact < 0.20, (hll_est, n_exact)


def test_hll_all_row_matches_python_rederivation():
    """Independent pure-Python re-derivation of the merged ALL row: build
    the 256 global registers from the raw keys with hashlib.md5 and the
    integer estimate formula, and require the exact engine value. Pins
    both the register arithmetic (hash split, rho, max-merge — the ALL
    row is folded from per-flag registers, so max-associativity is what
    makes this equality hold) and the fixed-point estimator."""
    import hashlib

    from pdf_extractor_spark.ops.sketches import HLL_ALPHA_MICROS, HLL_ENUM

    con = _duck_li(SF_SMALL)
    keys = [r[0] for r in con.execute("SELECT l_orderkey FROM lineitem").fetchall()]
    regs = [0] * HLL_M
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16)
        j, w = h % HLL_M, h >> 8
        rho = 45 if w == 0 else 45 - w.bit_length()
        regs[j] = max(regs[j], rho)
    v_zero = regs.count(0)
    s45 = sum(1 << (45 - m) for m in regs if m > 0) + v_zero * (1 << 45)
    expect = HLL_ALPHA_MICROS * (HLL_ENUM // 1_000_000) // s45
    rows = dict(
        (r[0], (r[2], r[3]))
        for r in con.execute(HLL_DISTINCT_SQL).fetchall()
    )
    assert rows["ALL"] == (v_zero, expect)


def test_hll_spark_shape(spark):
    from pdf_extractor_spark.ops.sketches import q_hll_distinct

    rows = q_hll_distinct(spark, SF_SMALL).collect()
    assert [r.scope for r in rows] == ["A", "ALL", "N", "R"]
    for r in rows:
        assert 0 <= r.v_zero < HLL_M
        # sf0.001 sits near the raw-regime floor (~1k distinct vs
        # 2.5m=640); measured error is <9%, pin a generous 25%
        assert abs(r.hll_est - r.n_exact) / r.n_exact < 0.25


def test_cms_one_sided_error_at_scale():
    rows = _duck(SF_BIG).execute(HEAVY_HITTERS_CMS_SQL).fetchall()
    assert len(rows) == 10
    for _uid, true_n, est_n in rows:
        assert est_n >= true_n  # CMS overestimates only
        # additive error bound: eps*N with eps=e/w, N=100k events ->
        # ~266; generous 2x headroom against future testdata regen
        assert est_n - true_n < 2 * 266, (true_n, est_n)


def test_hll_oracle_matches_python_on_random_keys():
    """Randomized differential: HLL_DISTINCT_SQL vs a pure-Python register
    build over arbitrary key multisets and group labels."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extractor_spark.ops.sketches import HLL_ALPHA_MICROS, HLL_ENUM

    def py_est(keys):
        regs = [0] * HLL_M
        for k in keys:
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16)
            j, w = h % HLL_M, h >> 8
            rho = 45 if w == 0 else 45 - w.bit_length()
            regs[j] = max(regs[j], rho)
        v_zero = regs.count(0)
        s45 = sum(1 << (45 - m) for m in regs if m > 0) + v_zero * (1 << 45)
        return v_zero, HLL_ALPHA_MICROS * (HLL_ENUM // 1_000_000) // s45

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from("ANR"), st.integers(1, 500)),
            min_size=1,
            max_size=120,
        )
    )
    def check(rows):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE lineitem (l_returnflag VARCHAR, l_orderkey BIGINT)"
        )
        con.executemany("INSERT INTO lineitem VALUES (?, ?)", rows)
        got = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(HLL_DISTINCT_SQL).fetchall()
        }
        by_flag = defaultdict(set)
        for f, k in rows:
            by_flag[f].add(k)
        all_keys = set().union(*by_flag.values())
        for flag, keys in by_flag.items():
            v, e = py_est(keys)
            assert got[flag] == (len(keys), v, e)
        v, e = py_est(all_keys)
        assert got["ALL"] == (len(all_keys), v, e)

    check()


def test_quantile_hist_error_bound(spark):
    """The log-histogram quantile answers within its guaranteed bound:
    the reported bucket lower bound is <= the exact rank-statistic and
    the exact value sits inside the answering bucket (width = 1/16 of
    its power-of-two range) — for every (lang, p) cell, against exact
    percentiles computed in Python."""
    from collections import defaultdict

    import duckdb

    from pdf_extractor_spark.ops.sketches import QH_PS, q_quantile_hist

    rows = q_quantile_hist(spark, "/root/testdata/sf0.001").collect()
    vals = defaultdict(list)
    for lang, v in duckdb.sql(
        "SELECT lang, n_chars FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    ).fetchall():
        vals[lang].append(v)
    assert len(rows) == len(vals) * len(QH_PS)
    for r in rows:
        xs = sorted(vals[r["lang"]])
        rank = -(-(r["p"] * len(xs)) // 100)  # ceil(p*N/100)
        exact = xs[rank - 1]
        approx = r["approx_n_chars"]
        assert approx <= exact, r
        assert exact <= approx + approx // 16 + 1, (r, exact)
