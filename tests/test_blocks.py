"""Blocked/salted kernels: differential tests vs the join-based SpMV and
skew fixtures (SURVEY.md §7 M2/M5)."""

import pytest
from pyspark.sql import functions as F

from graph_python_spark import MatrixFrame, VectorFrame, semiring
from graph_python_spark.operators.blocks import (
    blocked_csr_shards,
    degree_skew_stats,
    spmv_blocked,
    spmv_salted,
)
from tests.fixtures import A7_COLS, A7_N, A7_ROWS, A7_VALS, V7_IDX, V7_N, V7_VALS


@pytest.fixture(scope="module")
def A(spark):
    return MatrixFrame.from_coo(spark, A7_ROWS, A7_COLS, A7_VALS, A7_N, A7_N)


@pytest.fixture(scope="module")
def x(spark):
    return VectorFrame.from_coo(spark, V7_IDX, [float(v) for v in V7_VALS], V7_N)


@pytest.fixture(scope="module")
def zipf_edges(spark):
    """Hub-skewed deterministic graph: vertex 0 receives 40% of all edges."""
    rows = []
    for s in range(200):
        rows.append((s + 1, 0, 1.0))          # hub in-edges
        rows.append((s, (s * 7 + 1) % 300, 1.0))
        rows.append((s, (s * 13 + 5) % 300, 1.0))
    return (
        spark.createDataFrame(rows, "i long, j long, v double")
        .groupBy("i", "j").agg(F.sum("v").alias("v"))
    )


def test_spmv_blocked_matches_join_kernel(A, x):
    for sr in [semiring.plus_times, semiring.min_plus, semiring.max_second]:
        want = A.mxv(x, sr).to_dict()
        got = spmv_blocked(A.df, x, sr, n_blocks=3).to_dict()
        assert got == want, sr.name


def test_spmv_blocked_many_blocks(A, x):
    # more blocks than rows: degenerate single-row blocks still correct
    want = A.mxv(x, semiring.plus_times).to_dict()
    got = spmv_blocked(A.df, x, semiring.plus_times, n_blocks=64).to_dict()
    assert got == want


def test_spmv_salted_exactness(zipf_edges, spark):
    x = VectorFrame(
        zipf_edges.select("i").distinct()
        .select("i", ((F.col("i") % 11) + 1.0).alias("v"))
    )
    m = MatrixFrame(zipf_edges)
    # unsalted reference: vxm = aggregate by dst
    want = x.vxm(m, semiring.plus_times).to_dict()
    got = spmv_salted(zipf_edges, x, semiring.plus_times, n_salts=8).to_dict()
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    # min semiring: salting must also be exact for non-plus monoids
    want = x.vxm(m, semiring.min_plus).to_dict()
    got = spmv_salted(zipf_edges, x, semiring.min_plus, n_salts=8).to_dict()
    assert got == want


def test_degree_skew_stats(zipf_edges):
    stats = degree_skew_stats(zipf_edges, "j")
    assert stats["max_degree"] == 200  # the hub
    assert stats["skew_ratio"] > 50


def test_blocked_csr_shards_roundtrip(A, spark):
    shards = blocked_csr_shards(A.df, n_blocks=3)
    rows = shards.collect()
    # every row shard sorted by j; flattening reproduces the matrix exactly
    flat = {}
    for r in rows:
        assert r["block"] == r["i"] % 3
        assert list(r["cols"]) == sorted(r["cols"])
        for jj, vv in zip(r["cols"], r["vals"]):
            flat[(r["i"], jj)] = vv
    want = {(i, j): float(v) for i, j, v in zip(A7_ROWS, A7_COLS, A7_VALS)}
    assert flat == want


def test_adjacency_table_hub_chunking(spark):
    from graph_python_spark.operators.blocks import adjacency_table

    # hub vertex 0 -> 25 distinct neighbors (with duplicate edges), plus a
    # small vertex; max_chunk=10 must segment the hub into 3 bounded rows
    # all carrying the TOTAL degree, with disjoint sorted slices
    edges = [(0, d) for d in range(25)] + [(0, d) for d in range(0, 25, 5)]
    edges += [(7, 3), (7, 4)]
    df = spark.createDataFrame(edges, "s long, d long")
    adj = adjacency_table(df, "s", "d", partitions=2, max_chunk=10)
    rows = sorted(adj.collect(), key=lambda r: (r["s"], r["ds"][0]))
    hub = [r for r in rows if r["s"] == 0]
    assert [len(r["ds"]) for r in hub] == [10, 10, 5]
    assert all(r["deg"] == 25 for r in hub)
    assert sorted(x for r in hub for x in r["ds"]) == list(range(25))
    small = [r for r in rows if r["s"] == 7]
    assert len(small) == 1 and list(small[0]["ds"]) == [3, 4] and small[0]["deg"] == 2


def test_pagerank_with_chunked_hubs(spark):
    """PageRank over a graph whose adjacency is force-chunked must equal the
    unchunked run exactly (chunks are disjoint slices; ⊕ associative)."""
    import graph_python_spark.operators.blocks as blocks
    from graph_python_spark.algorithms.pagerank import pagerank_fixed

    edges = [(i, j, 1.0) for i in range(12) for j in range(12)
             if i != j and (i * 7 + j) % 3 != 0]
    e = spark.createDataFrame(edges, "i long, j long, v double") \
        .select("i", "j")
    base = {r["id"]: r["score"]
            for r in pagerank_fixed(e, iterations=8, partitions=2).collect()}

    orig = blocks.adjacency_table

    def chunked(edges, src="s", dst="d", partitions=None, max_chunk=4_000_000):
        return orig(edges, src, dst, partitions, max_chunk=3)

    blocks.adjacency_table = chunked
    try:
        got = {r["id"]: r["score"]
               for r in pagerank_fixed(e, iterations=8, partitions=2).collect()}
    finally:
        blocks.adjacency_table = orig
    assert set(got) == set(base)
    for k in base:
        assert abs(got[k] - base[k]) < 1e-12
