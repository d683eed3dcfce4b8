from graph_python_spark.plans.iterate import IterationState, materialize

__all__ = ["IterationState", "materialize"]
