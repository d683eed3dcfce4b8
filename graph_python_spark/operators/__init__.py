from graph_python_spark.operators.masks import Mask
from graph_python_spark.operators.matrix import MatrixFrame, concat, split
from graph_python_spark.operators.vector import VectorFrame

__all__ = ["MatrixFrame", "VectorFrame", "Mask", "concat", "split"]
