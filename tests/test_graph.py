"""PageRank properties that value equality vs DuckDB alone can't see:
an independent pure-Python re-derivation of the whole loop, plus the
rank-mass invariant on the register arithmetic."""

import sys
from collections import defaultdict
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.ops.graph import (  # noqa: E402
    PAGERANK_SQL,
    PR_DAMP_MILLI,
    PR_ITERS,
    PR_ONE_PPB,
    PR_TOPK,
)

SF_SMALL = "/root/testdata/sf0.001"


def _python_pagerank(sf_dir):
    """Dict-and-loop re-derivation with the identical integer arithmetic."""
    con = duckdb.connect()
    pairs = con.execute(
        f"""SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR),
                            's' || CAST(l_suppkey AS VARCHAR)
            FROM '{sf_dir}/orders.parquet' o
            JOIN '{sf_dir}/lineitem.parquet' l ON o_orderkey = l_orderkey"""
    ).fetchall()
    adj = defaultdict(list)
    for c, s in pairs:
        adj[c].append(s)
        adj[s].append(c)
    nv = len(adj)
    ranks = {v: PR_ONE_PPB // nv for v in adj}
    for _ in range(PR_ITERS):
        ctb = defaultdict(int)
        for v, outs in adj.items():
            share = ranks[v] // len(outs)
            for d in outs:
                ctb[d] += share
        ranks = {
            v: (
                (1000 - PR_DAMP_MILLI) * (PR_ONE_PPB // nv)
                + PR_DAMP_MILLI * ctb[v]
            )
            // 1000
            for v in adj
        }
    top = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))[:PR_TOPK]
    return [(v, len(adj[v]), r) for v, r in top], ranks


def test_pagerank_matches_python_rederivation():
    expected, _ = _python_pagerank(SF_SMALL)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    got = con.execute(PAGERANK_SQL).fetchall()
    assert got == expected


def test_pagerank_mass_conserved_up_to_flooring():
    """Total rank stays within flooring loss of 1.0: every vertex floors
    once per share and once per update, so the loss per iteration is
    bounded by (|E| + |V| + 1000) ppb — at this graph size, <1% total."""
    _, ranks = _python_pagerank(SF_SMALL)
    total = sum(ranks.values())
    assert 0.99 * PR_ONE_PPB < total <= PR_ONE_PPB


def test_pagerank_spark_top20(spark):
    from pdf_extractor_spark.ops.graph import q_pagerank

    rows = q_pagerank(spark, SF_SMALL).collect()
    expected, _ = _python_pagerank(SF_SMALL)
    assert [(r.vertex, r.degree, r.rank_ppb) for r in rows] == expected


def test_pagerank_oracle_matches_python_on_random_graphs():
    """Randomized differential test: the chained-CTE oracle and the
    pure-Python loop must agree on arbitrary bipartite co-purchase graphs,
    not just the driver's fixed testdata (same convention as the
    incremental curate/neardup differential tests)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(1, 12), st.integers(1, 5)),
            min_size=1,
            max_size=40,
        )
    )
    def check(order_pairs):
        con = duckdb.connect()
        con.execute("CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT)")
        con.execute("CREATE TABLE lineitem (l_orderkey BIGINT, l_suppkey BIGINT)")
        for i, (c, s) in enumerate(order_pairs):
            con.execute("INSERT INTO orders VALUES (?, ?)", [i, c])
            con.execute("INSERT INTO lineitem VALUES (?, ?)", [i, s])
        got = con.execute(PAGERANK_SQL).fetchall()
        # python rederivation over the same integer-id encoding
        adj = defaultdict(set)
        for c, s in set(order_pairs):
            adj[f"c{c}"].add(f"s{s}")
            adj[f"s{s}"].add(f"c{c}")
        adj = {v: sorted(o) for v, o in adj.items()}
        nv = len(adj)
        ranks = {v: PR_ONE_PPB // nv for v in adj}
        for _ in range(PR_ITERS):
            ctb = defaultdict(int)
            for v, outs in adj.items():
                share = ranks[v] // len(outs)
                for d in outs:
                    ctb[d] += share
            ranks = {
                v: (
                    (1000 - PR_DAMP_MILLI) * (PR_ONE_PPB // nv)
                    + PR_DAMP_MILLI * ctb[v]
                )
                // 1000
                for v in adj
            }
        top = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))[:PR_TOPK]
        expected = [(v, len(adj[v]), r) for v, r in top]
        assert got == expected

    check()


def _python_pagerank_converged(adj, tol_ppb, damp_milli, max_iters=200):
    """Residual-thresholded loop with the identical integer arithmetic —
    the byte-exact rederivation of ops/graph.pagerank_converged."""
    nv = len(adj)
    ranks = {v: PR_ONE_PPB // nv for v in adj}
    iters = 0
    residual = None
    for _ in range(max_iters):
        ctb = defaultdict(int)
        for v, outs in adj.items():
            share = ranks[v] // len(outs)
            for d in outs:
                ctb[d] += share
        nxt = {
            v: (
                (1000 - damp_milli) * (PR_ONE_PPB // nv)
                + damp_milli * ctb[v]
            )
            // 1000
            for v in adj
        }
        iters += 1
        residual = max(abs(nxt[v] - ranks[v]) for v in adj)
        ranks = nxt
        if residual <= tol_ppb:
            break
    return ranks, iters, residual


def test_pagerank_converged_chain_graph(spark):
    """The adversarial CHAIN graph (diameter = |V| - 1, the case where
    min-label propagation needs |V| rounds): the residual-thresholded
    loop converges within the geometric bound log(r0/tol)/log(1/damp) —
    DIAMETER-independent — the ranks match the pure-Python integer
    rederivation byte-for-byte, and rank mass at the fixpoint stays
    within flooring loss of 1.0."""
    import math

    from pdf_extractor_spark.ops.graph import PR_TOL_PPB, pagerank_converged

    n = 24  # path v0 - v1 - ... - v23
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in chain] + [(b, a) for a, b in chain],
        "src bigint, dst bigint",
    )
    ranks, iters, converged, residual = pagerank_converged(edges)
    assert converged and residual <= PR_TOL_PPB
    # geometric residual decay: r0 <= 1e9, rate damp=0.85 -> ~43 rounds
    bound = math.ceil(
        math.log((PR_ONE_PPB) / PR_TOL_PPB) / math.log(1000 / PR_DAMP_MILLI)
    ) + 2
    assert iters <= bound, (iters, bound)

    adj = defaultdict(list)
    for a, b in chain:
        adj[a].append(b)
        adj[b].append(a)
    expect, py_iters, py_res = _python_pagerank_converged(
        adj, PR_TOL_PPB, PR_DAMP_MILLI
    )
    got = {r["vertex"]: r["r"] for r in ranks.collect()}
    assert got == expect
    assert (iters, residual) == (py_iters, py_res)
    # rank-mass bound at the fixpoint: every vertex floors once per share
    # and once per update -> loss per iteration <= (|E| + |V| + 1000) ppb
    total = sum(got.values())
    assert 0.99 * PR_ONE_PPB < total <= PR_ONE_PPB
    ranks.unpersist()


def test_pagerank_converged_faster_damping_fewer_rounds(spark):
    """Damping is the convergence knob the loop exposes: halving the
    damped mass (500 vs 850 milli) must cut the round count roughly per
    the geometric bound, on the same graph, still matching the Python
    rederivation exactly."""
    from pdf_extractor_spark.ops.graph import pagerank_converged

    n = 12
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in chain] + [(b, a) for a, b in chain],
        "src bigint, dst bigint",
    )
    ranks, iters, converged, _ = pagerank_converged(
        edges, tol_ppb=10_000, damp_milli=500
    )
    assert converged
    adj = defaultdict(list)
    for a, b in chain:
        adj[a].append(b)
        adj[b].append(a)
    expect, py_iters, _ = _python_pagerank_converged(adj, 10_000, 500)
    got = {r["vertex"]: r["r"] for r in ranks.collect()}
    assert got == expect and iters == py_iters
    # 0.5^k * 1e9 <= 1e4 -> k ~ 17; well under the damp=850 bound of 43+
    assert iters <= 20
    ranks.unpersist()
