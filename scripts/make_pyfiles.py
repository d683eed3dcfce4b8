"""Build the --py-files artifact: dist/graph_python_spark.zip.

Usage: python scripts/make_pyfiles.py [outdir]
Then:  spark-submit --py-files dist/graph_python_spark.zip scripts/pagerank_job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(outdir: str = "dist") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "graph_python_spark")
    os.makedirs(os.path.join(root, outdir), exist_ok=True)
    out = os.path.join(root, outdir, "graph_python_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
