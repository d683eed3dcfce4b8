"""Visualization surface (reference ``graphblas/viz.py:45-227``): the
engine-side aggregation (``spy_counts``/``datashade``) is verified against
a brute-force NumPy binning oracle; the matplotlib/networkx frontends are
verified to be gated (absent in this sandbox), and ``draw``'s
collect-guard is verified to refuse large matrices BEFORE reaching the
import gate."""

import numpy as np
import pytest

from graph_python_spark.operators.matrix import MatrixFrame
from graph_python_spark.sources import viz


def _random_matrix(spark, nr=97, nc=53, nnz=400, seed=7):
    rng = np.random.default_rng(seed)
    # unique coordinates so nnz is exact
    flat = rng.choice(nr * nc, size=nnz, replace=False)
    r, c = (flat // nc).tolist(), (flat % nc).tolist()
    v = rng.normal(size=nnz).tolist()
    return MatrixFrame.from_coo(spark, r, c, v, nr, nc), np.array(r), np.array(c)


def _oracle_grid(r, c, nr, nc, bins_r, bins_c):
    br = np.minimum(r * bins_r // nr, bins_r - 1)
    bc = np.minimum(c * bins_c // nc, bins_c - 1)
    grid = {}
    for a, b in zip(br.tolist(), bc.tolist()):
        grid[(a, b)] = grid.get((a, b), 0) + 1
    return grid


@pytest.mark.parametrize("bins_r,bins_c", [(8, 8), (16, 4), (200, 200)])
def test_spy_counts_matches_numpy_binning(spark, bins_r, bins_c):
    m, r, c = _random_matrix(spark)
    got = {(x["br"], x["bc"]): x["nnz"]
           for x in viz.spy_counts(m, bins_r, bins_c).collect()}
    assert got == _oracle_grid(r, c, 97, 53, bins_r, bins_c)


def test_spy_counts_total_is_nvals(spark):
    m, _, _ = _random_matrix(spark)
    total = sum(x["nnz"] for x in viz.spy_counts(m, 10).collect())
    assert total == m.nvals == 400


def test_datashade_is_pixel_grid(spark):
    m, r, c = _random_matrix(spark)
    got = {(x["br"], x["bc"]): x["nnz"]
           for x in viz.datashade(m, width=12, height=20).collect()}
    assert got == _oracle_grid(r, c, 97, 53, 20, 12)


def test_spy_text_shape_and_density(spark):
    m, _, _ = _random_matrix(spark)
    art = viz.spy_text(m, bins=16)
    lines = art.split("\n")
    assert len(lines) == 16 and all(len(ln) == 16 for ln in lines)
    # something is dense somewhere; empty cells render as space
    assert any(ch != " " for ln in lines for ch in ln)


def test_spy_text_empty_matrix(spark):
    m = MatrixFrame.from_coo(spark, [], [], [], 5, 5)
    art = viz.spy_text(m, bins=4)
    assert art == "\n".join(" " * 4 for _ in range(4))


def test_spy_counts_plan_is_single_partial_agg(spark):
    """Scale shape: projection + hash aggregate only — no sort, no window,
    no cartesian (the 100 TB render path)."""
    m, _, _ = _random_matrix(spark)
    plan = viz.spy_counts(m, 64)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    for bad in ("CartesianProduct", "Window", "Sort"):
        assert bad not in plan, plan


def test_draw_refuses_large_before_import_gate(spark):
    m, _, _ = _random_matrix(spark)
    with pytest.raises(ValueError, match="max_edges"):
        viz.draw(m, max_edges=10)


def test_matplotlib_frontends_gated(spark):
    m, _, _ = _random_matrix(spark)
    have_mpl = True
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        have_mpl = False
    if not have_mpl:
        with pytest.raises(ImportError, match="matplotlib"):
            viz.spy(m)
        with pytest.raises(ImportError):
            viz.draw(m)  # small enough, dies at the import gate


def test_awkward_adapters_gated(spark):
    from graph_python_spark.sources import io
    have_ak = True
    try:
        import awkward  # noqa: F401
    except ImportError:
        have_ak = False
    m, _, _ = _random_matrix(spark, nnz=20)
    if not have_ak:
        with pytest.raises(ImportError, match="awkward"):
            io.to_awkward(m)
        with pytest.raises(ImportError, match="awkward"):
            io.from_awkward(spark, object())
    else:  # pragma: no cover - sandbox lacks the lib
        for fmt in ("csr", "csc", "hypercsr", "hypercsc"):
            back = io.from_awkward(spark, io.to_awkward(m, fmt))
            assert back.to_coo() == m.to_coo()
            assert (back.nrows, back.ncols) == (m.nrows, m.ncols)


def test_pydata_sparse_adapters_gated(spark):
    from graph_python_spark.sources import io
    have_sparse = True
    try:
        import sparse  # noqa: F401
    except ImportError:
        have_sparse = False
    m, r, c = _random_matrix(spark, nnz=20)
    if not have_sparse:
        with pytest.raises(ImportError, match="sparse"):
            io.to_pydata_sparse(m)
        with pytest.raises(ImportError, match="sparse"):
            io.from_pydata_sparse(spark, object())
    else:  # pragma: no cover - sandbox lacks the lib
        back = io.from_pydata_sparse(spark, io.to_pydata_sparse(m))
        assert back.to_coo() == m.to_coo()
