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
