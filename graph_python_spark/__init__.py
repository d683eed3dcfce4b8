"""graph_python_spark — a brand-new PySpark-native link-graph analytics engine.

Re-expresses the capabilities of python-graphblas (sparse semiring linear
algebra over graphs: PageRank, connected components, label propagation,
triangle counting, BFS/SSSP) as idiomatic Spark DataFrame computations.

Data model (see SURVEY.md §1):
  * Matrix  -> edge DataFrame  E(i: long, j: long, v: <T>)   one row per stored element
  * Vector  -> vertex DataFrame V(i: long, v: <T>)
  * Scalar  -> driver-side Python value (None == structurally empty)
  * missing values are ABSENT ROWS, never SQL NULL — so ewise intersection /
    union semantics match GraphBLAS exactly.

This is NOT a port: the reference's C/OpenMP execution engine is replaced by
Catalyst + Tungsten; kernels are declared with the DataFrame API so predicate
pushdown / partial aggregation / broadcast joins / AQE come for free.
"""

from graph_python_spark.functions.semiring import Semiring, semiring
from graph_python_spark.functions.ops import binary, monoid, unary
from graph_python_spark.operators.matrix import MatrixFrame
from graph_python_spark.operators.vector import VectorFrame

__all__ = [
    "MatrixFrame",
    "VectorFrame",
    "Semiring",
    "semiring",
    "unary",
    "binary",
    "monoid",
]

__version__ = "0.1.0"
