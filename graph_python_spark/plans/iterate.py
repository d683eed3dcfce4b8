"""Iteration driver utilities: lineage truncation + checkpoint/resume.

Iterative semiring algorithms (PageRank, FastSV, LPA, SSSP) re-derive a
DataFrame from the previous iteration's; without truncation the logical plan
grows per iteration and Catalyst re-optimization dominates runtime.  Each
iteration therefore ends in either:

  * ``materialize`` — ``localCheckpoint(eager=True)``: compute + pin the
    partitions, drop lineage (fast path; not fault-tolerant), or
  * ``IterationState.save`` — parquet state + JSON manifest (iteration #,
    metrics, per-partition lineage), the durable checkpoint the north rule
    requires: a killed run resumes mid-iteration from the last manifest.

The reference's only analogue is nonblocking-mode ``wait()``
(``graphblas/core/matrix.py:778-803``); resumability is new engineering for
the 100 TB setting.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession


def materialize(df: DataFrame, storage: str = "local") -> DataFrame:
    """Compute now; truncate lineage. Keeps the current partitioning."""
    return df.localCheckpoint(eager=True)


class IterationState:
    """Durable per-iteration checkpoint: parquet state + manifest.json.

    Layout:
      <root>/manifest.json                 {"iteration": k, "metrics": {...},
                                            "states": {name: path}, "ts": ...}
      <root>/iter=<k>/<name>/              parquet (per-partition files = the
                                           per-partition lineage the manifest
                                           records via numPartitions)
    Only the latest two iterations are retained.
    """

    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def load_manifest(self) -> Optional[dict]:
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            return json.load(f)

    def save(self, iteration: int, states: dict[str, DataFrame],
             metrics: dict[str, Any]) -> dict:
        paths = {}
        parts = {}
        for name, df in states.items():
            path = os.path.join(self.root, f"iter={iteration}", name)
            df.write.mode("overwrite").parquet(path)
            paths[name] = path
            parts[name] = df.rdd.getNumPartitions()
        manifest = {
            "iteration": iteration,
            "states": paths,
            "partitions": parts,
            "metrics": metrics,
            "ts": time.time(),
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self.manifest_path)  # atomic: crash keeps old manifest
        self._gc(keep={iteration, iteration - 1})
        return manifest

    def restore(self) -> Optional[tuple[int, dict[str, DataFrame], dict]]:
        m = self.load_manifest()
        if m is None:
            return None
        states = {name: self.spark.read.parquet(p) for name, p in m["states"].items()}
        return m["iteration"], states, m.get("metrics", {})

    def _gc(self, keep: set[int]) -> None:
        import shutil

        for entry in os.listdir(self.root):
            if entry.startswith("iter="):
                k = int(entry.split("=", 1)[1])
                if k not in keep:
                    shutil.rmtree(os.path.join(self.root, entry), ignore_errors=True)
