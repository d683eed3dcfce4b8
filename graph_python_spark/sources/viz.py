"""Visualization surface (reference ``graphblas/viz.py:45-227``:
``draw`` / ``spy`` / ``datashade``), re-expressed Spark-first.

The piece that must scale is the one datashader solves: a 100 TB matrix
cannot ship its nonzeros to a plotting library, so the render pipeline is
*aggregate to a pixel grid in the engine, ship only the grid*.  That
aggregation is one ``groupBy`` over binned indices — ``spy_counts`` — and
everything else (ASCII render, matplotlib imshow, networkx draw) consumes
its tiny ``bins_r x bins_c`` output driver-side.  matplotlib / networkx
are OPTIONAL: the functions that need them import lazily and raise a
clear ImportError when absent (this sandbox has neither), while
``spy_counts`` / ``spy_text`` are pure Spark + stdlib and fully tested.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.operators.matrix import MatrixFrame

__all__ = ["spy_counts", "spy_text", "spy", "datashade", "draw"]


def spy_counts(m: MatrixFrame, bins_r: int = 64,
               bins_c: Optional[int] = None,
               nrows: Optional[int] = None,
               ncols: Optional[int] = None) -> DataFrame:
    """Bin the nonzero STRUCTURE of ``m`` into a ``bins_r x bins_c`` density
    grid: one row ``(br, bc, nnz)`` per non-empty cell of the grid
    (reference ``viz.py`` spy/datashade's aggregation step).

    The plan is a single map-side projection + hash aggregate over at most
    ``bins_r * bins_c`` keys — no sort, no window, no driver data motion —
    so it holds unchanged at any matrix size; only the O(bins^2) result is
    ever small enough to plot, which is the point.
    """
    bins_c = bins_c or bins_r
    nr = nrows if nrows is not None else m.nrows
    nc = ncols if ncols is not None else m.ncols
    nr, nc = max(nr, 1), max(nc, 1)
    return (
        m.df.select(
            F.least(F.floor(F.col("i") * bins_r / nr),
                    F.lit(bins_r - 1)).cast("long").alias("br"),
            F.least(F.floor(F.col("j") * bins_c / nc),
                    F.lit(bins_c - 1)).cast("long").alias("bc"),
        )
        .groupBy("br", "bc")
        .agg(F.count(F.lit(1)).alias("nnz"))
    )


# perceptual ramp: empty -> sparse -> dense (stdlib-only spy render)
_RAMP = " .:-=+*#%@"


def spy_text(m: MatrixFrame, bins: int = 32,
             nrows: Optional[int] = None,
             ncols: Optional[int] = None) -> str:
    """ASCII ``spy`` plot: the ``spy_counts`` grid rendered as a
    ``bins``-line string with a log-scaled density ramp.  Collects only
    the aggregated grid (<= bins^2 rows) to the driver."""
    import math

    cells = {(r["br"], r["bc"]): r["nnz"]
             for r in spy_counts(m, bins, bins, nrows, ncols).collect()}
    if not cells:
        return "\n".join(" " * bins for _ in range(bins))
    log_max = math.log1p(max(cells.values()))
    lines = []
    for br in range(bins):
        row = []
        for bc in range(bins):
            n = cells.get((br, bc), 0)
            lvl = 0 if n == 0 else max(
                1, round(math.log1p(n) / log_max * (len(_RAMP) - 1)))
            row.append(_RAMP[lvl])
        lines.append("".join(row))
    return "\n".join(lines)


def spy(m: MatrixFrame, bins: int = 256, ax=None, **imshow_kwargs):
    """matplotlib ``spy`` (reference ``viz.py`` spy): renders the
    ``spy_counts`` grid with ``imshow``.  Requires matplotlib (absent in
    this sandbox — gated, not stubbed: the aggregation itself is
    ``spy_counts`` and is fully tested without it)."""
    try:
        import numpy as np
        from matplotlib import pyplot as plt
    except ImportError as exc:  # pragma: no cover - lib absent in sandbox
        raise ImportError(
            "spy() rendering requires matplotlib; use spy_counts()/"
            "spy_text() for the engine-side aggregation") from exc
    grid = np.zeros((bins, bins))
    for r in spy_counts(m, bins, bins).collect():  # pragma: no cover
        grid[r["br"], r["bc"]] = r["nnz"]
    if ax is None:  # pragma: no cover
        _, ax = plt.subplots()
    ax.imshow(grid, **imshow_kwargs)  # pragma: no cover
    return ax  # pragma: no cover


def datashade(m: MatrixFrame, width: int = 256, height: int = 256) -> DataFrame:
    """The datashader-equivalent aggregation (reference ``viz.py``
    datashade): pixel-grid nnz densities as a DataFrame — the part of the
    render that must run in the engine.  Feed the result to any raster
    frontend."""
    return spy_counts(m, bins_r=height, bins_c=width)


def draw(m: MatrixFrame, max_edges: int = 10_000, **draw_kwargs):
    """Node-link drawing of a SMALL matrix/graph via networkx + matplotlib
    (reference ``viz.py`` draw).  Refuses matrices above ``max_edges``
    nonzeros — a node-link diagram of more is unreadable and collecting a
    100 TB edge set to the driver is exactly what this module exists to
    avoid; use ``spy_text``/``datashade`` for structure at scale."""
    nnz = m.nvals
    if nnz > max_edges:
        raise ValueError(
            f"draw() collects edges to the driver; matrix has {nnz} > "
            f"max_edges={max_edges} stored elements — use spy_text()/"
            "datashade() at scale")
    try:  # pragma: no cover - libs absent in sandbox
        import networkx as nx
        from matplotlib import pyplot as plt  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "draw() requires networkx + matplotlib; use spy_text() for a "
            "dependency-free structure view") from exc
    from graph_python_spark.sources.io import to_networkx  # pragma: no cover
    g = to_networkx(m)  # pragma: no cover
    nx.draw(g, **draw_kwargs)  # pragma: no cover
    return g  # pragma: no cover
