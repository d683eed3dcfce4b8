"""merge_into — the single generic write-combine routine.

The reference's assign path is a 437-line decision tree
(``graphblas/core/matrix.py:2905-3317`` ``_prep_for_assign``) choosing among
GrB_assign / GxB_subassign / setElement variants; its update path
(``core/base.py:318-494`` ``_update``) merges an operation's delta into the
output under (mask, accum, replace).  Every one of those variants reduces to
ONE relational merge implementing the GraphBLAS update rule

    Z = accum ? accum(C, T) : T          (accum has union structure:
                                          C-only and T-only entries pass)
    C⟨M, replace⟩ = Z:
        M true  -> C = Z  (present iff Z present)
        M false -> replace ? deleted : old C kept

as semi/anti/full-outer joins.  No mask means M is all-true.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.operators.masks import Mask


def _accum_merge(old: DataFrame, delta: DataFrame, keys: list[str], accum: Callable) -> DataFrame:
    o = old.withColumnRenamed("v", "_v_old")
    d = delta.withColumnRenamed("v", "_v_new")
    joined = o.join(d, on=keys, how="full_outer")
    both = F.col("_v_old").isNotNull() & F.col("_v_new").isNotNull()
    merged = (
        F.when(both, accum(F.col("_v_old"), F.col("_v_new")))
        .when(F.col("_v_old").isNotNull(), F.col("_v_old"))
        .otherwise(F.col("_v_new"))
    )
    return joined.select(*keys, merged.alias("v"))


def merge_into(
    old: Optional[DataFrame],
    delta: DataFrame,
    keys: Sequence[str],
    mask: Optional[Mask] = None,
    accum: Optional[Callable] = None,
    replace: bool = False,
) -> DataFrame:
    keys = list(keys)
    if mask is not None:
        delta = mask.apply(delta)

    if old is None:
        return delta

    if mask is None:
        # all-true mask: replace flag is irrelevant (GrB_DESC_R == NULL desc)
        if accum is None:
            return delta
        return _accum_merge(old, delta, keys, accum)

    inside_old = mask.apply(old)          # old entries where M true
    outside_old = mask.keep_outside(old)  # old entries where M false
    inside = delta if accum is None else _accum_merge(inside_old, delta, keys, accum)
    if replace:
        return inside
    return outside_old.unionByName(inside)
