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
