from graph_python_spark.sources import corpus, io, tpch_graph

__all__ = ["corpus", "io", "tpch_graph"]
