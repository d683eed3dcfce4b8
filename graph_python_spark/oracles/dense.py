"""Dense NumPy oracle kernels with explicit structural-sparsity masks.

Semantics match the reference exactly (missing = structurally absent, not
zero): ewise_mult is intersection, ewise_add is union-with-passthrough,
semiring mxv/mxm aggregate only over present products.  n <= ~2000 only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np


@dataclass
class SparseArray:
    """values + presence mask; 1-D (vector) or 2-D (matrix)."""

    values: np.ndarray
    present: np.ndarray

    @classmethod
    def from_coo(cls, rows, cols, vals, shape) -> "SparseArray":
        values = np.zeros(shape, dtype=np.asarray(vals).dtype if len(vals) else float)
        present = np.zeros(shape, dtype=bool)
        for r, c, v in zip(rows, cols, vals):
            if present[r, c]:
                values[r, c] += v  # dup_op=plus, Matrix.build default semantics
            else:
                values[r, c] = v
                present[r, c] = True
        return cls(values, present)

    @classmethod
    def vector_from_coo(cls, idx, vals, size) -> "SparseArray":
        values = np.zeros(size, dtype=np.asarray(vals).dtype if len(list(vals)) else float)
        present = np.zeros(size, dtype=bool)
        for i, v in zip(idx, vals):
            values[i] = v
            present[i] = True
        return cls(values, present)

    def to_dict(self) -> dict:
        if self.values.ndim == 1:
            return {int(i): self.values[i] for i in np.nonzero(self.present)[0]}
        return {
            (int(r), int(c)): self.values[r, c]
            for r, c in zip(*np.nonzero(self.present))
        }


def ewise_mult(a: SparseArray, b: SparseArray, op: Callable = np.multiply) -> SparseArray:
    present = a.present & b.present
    values = np.where(present, op(a.values, b.values), 0)
    return SparseArray(values, present)


def ewise_add(a: SparseArray, b: SparseArray, op: Callable = np.add) -> SparseArray:
    both = a.present & b.present
    values = np.where(both, op(a.values, b.values),
                      np.where(a.present, a.values, b.values))
    return SparseArray(values, a.present | b.present)


def ewise_union(a: SparseArray, b: SparseArray, op: Callable,
                left_default: Any, right_default: Any) -> SparseArray:
    present = a.present | b.present
    av = np.where(a.present, a.values, left_default)
    bv = np.where(b.present, b.values, right_default)
    values = np.where(present, op(av, bv), 0)
    return SparseArray(values, present)


def mxv(A: SparseArray, x: SparseArray, add=np.add, mul=np.multiply,
        identity: Any = 0) -> SparseArray:
    """y[i] = ⊕_j mul(A[i,j], x[j]) over present pairs only."""
    n = A.values.shape[0]
    out_v = np.full(n, identity, dtype=float)
    out_p = np.zeros(n, dtype=bool)
    for i in range(n):
        cols = np.nonzero(A.present[i] & x.present)[0]
        if len(cols):
            prods = mul(A.values[i, cols], x.values[cols])
            out_v[i] = add.reduce(prods)
            out_p[i] = True
    return SparseArray(np.where(out_p, out_v, 0), out_p)


def mxm(A: SparseArray, B: SparseArray, add=np.add, mul=np.multiply,
        identity: Any = 0) -> SparseArray:
    n, m = A.values.shape[0], B.values.shape[1]
    out_v = np.zeros((n, m), dtype=float)
    out_p = np.zeros((n, m), dtype=bool)
    for i in range(n):
        for j in range(m):
            ks = np.nonzero(A.present[i] & B.present[:, j])[0]
            if len(ks):
                prods = mul(A.values[i, ks], B.values[ks, j])
                out_v[i, j] = add.reduce(prods)
                out_p[i, j] = True
    return SparseArray(out_v, out_p)


def reduce_rowwise(A: SparseArray, add=np.add) -> SparseArray:
    n = A.values.shape[0]
    out_v = np.zeros(n, dtype=float)
    out_p = A.present.any(axis=1)
    for i in range(n):
        cols = np.nonzero(A.present[i])[0]
        if len(cols):
            out_v[i] = add.reduce(A.values[i, cols])
    return SparseArray(out_v, out_p)


def reduce_columnwise(A: SparseArray, add=np.add) -> SparseArray:
    return reduce_rowwise(SparseArray(A.values.T, A.present.T), add)
