"""Masks: write-control predicates over output positions.

Reference: ``graphblas/core/mask.py:9-205`` defines 4 concrete classes —
StructuralMask (M.S), ValueMask (M.V), ComplementedStructuralMask (~M.S),
ComplementedValueMask (~M.V).  In the DataFrame model a mask is simply a
set of (i[,j]) keys; applying it is a semi-join (keep) or anti-join (drop):

  * M.S   -> left_semi on mask keys
  * M.V   -> left_semi on mask keys where mask value is truthy
  * ~M.S  -> left_anti on mask keys
  * ~M.V  -> left_anti on truthy mask keys
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from graph_python_spark.operators.matrix import MatrixFrame
    from graph_python_spark.operators.vector import VectorFrame


@dataclass(frozen=True)
class Mask:
    """A structural/value, possibly complemented mask over a collection."""

    parent: "MatrixFrame | VectorFrame"
    structural: bool = True
    complement: bool = False

    def __invert__(self) -> "Mask":
        return Mask(self.parent, self.structural, not self.complement)

    @property
    def keys(self) -> list[str]:
        return self.parent._keys  # ["i"] or ["i", "j"]

    def _true_keys(self) -> DataFrame:
        """DataFrame of key columns where the (non-complemented) mask holds."""
        df = self.parent.df
        if not self.structural:
            df = df.filter(F.col("v").cast("boolean"))
        return df.select(*self.keys)

    def apply(self, delta: DataFrame) -> DataFrame:
        """Filter ``delta`` rows to positions the mask allows writes at."""
        how = "left_anti" if self.complement else "left_semi"
        return delta.join(self._true_keys(), on=self.keys, how=how)

    def keep_outside(self, old: DataFrame) -> DataFrame:
        """Rows of ``old`` OUTSIDE the mask (survive a replace=True write)."""
        how = "left_semi" if self.complement else "left_anti"
        return old.join(self._true_keys(), on=self.keys, how=how)

    # -- combinators (reference core/mask.py:210-458: 20+ specialized
    #    recipes; here one generic composition in delta space — complements
    #    never materialize, they stay anti-joins) ---------------------------
    def __and__(self, other: "Mask") -> "CompositeMask":
        return CompositeMask(self, other, "and")

    def __or__(self, other: "Mask") -> "CompositeMask":
        return CompositeMask(self, other, "or")


class CompositeMask:
    """mask1 & mask2 / mask1 | mask2 — applied by join composition."""

    def __init__(self, a, b, op: str):
        assert a.keys == b.keys, "mask key arity mismatch"
        self.a, self.b, self.op = a, b, op

    @property
    def keys(self) -> list[str]:
        return self.a.keys

    def __invert__(self) -> "CompositeMask":
        # De Morgan: ~(a & b) = ~a | ~b
        return CompositeMask(~self.a, ~self.b, "or" if self.op == "and" else "and")

    def apply(self, delta: DataFrame) -> DataFrame:
        if self.op == "and":
            return self.b.apply(self.a.apply(delta))
        # or: drop rows where BOTH masks are false
        false_both = self.b.keep_outside(self.a.keep_outside(delta))
        return delta.join(false_both.select(*self.keys), on=self.keys, how="left_anti")

    def keep_outside(self, old: DataFrame) -> DataFrame:
        inside = self.apply(old)
        return old.join(inside.select(*self.keys), on=self.keys, how="left_anti")
