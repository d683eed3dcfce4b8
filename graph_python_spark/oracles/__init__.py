"""Pure-NumPy reference kernels (test-only).

The reference library cannot execute in this sandbox (no
suitesparse_graphblas), so golden values come from dense NumPy
re-implementations matching reference semantics exactly — structural
sparsity is modelled with an explicit boolean presence mask.
"""

from graph_python_spark.oracles.dense import (
    SparseArray,
    ewise_add,
    ewise_mult,
    ewise_union,
    mxm,
    mxv,
    reduce_columnwise,
    reduce_rowwise,
)
from graph_python_spark.oracles.algos import (
    bfs_levels,
    bfs_parents,
    fastsv_components,
    label_propagation,
    pagerank_3f,
    sssp,
    triangle_count,
)

__all__ = [
    "SparseArray",
    "ewise_mult",
    "ewise_add",
    "ewise_union",
    "mxv",
    "mxm",
    "reduce_rowwise",
    "reduce_columnwise",
    "pagerank_3f",
    "fastsv_components",
    "label_propagation",
    "triangle_count",
    "bfs_levels",
    "bfs_parents",
    "sssp",
]
