from graph_python_spark.pipeline import (dedup, features, multimodal,
                                         packing, retrieval, sampling,
                                         similarity, sketches, temporal,
                                         text)

__all__ = ["dedup", "similarity", "text", "multimodal", "sampling",
           "features", "retrieval", "temporal", "sketches", "packing"]
