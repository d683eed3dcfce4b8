from graph_python_spark.functions.ops import binary, monoid, unary, indexunary, agg
from graph_python_spark.functions.semiring import Semiring, semiring

__all__ = ["unary", "binary", "monoid", "indexunary", "agg", "Semiring", "semiring"]
