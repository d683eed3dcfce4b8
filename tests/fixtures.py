"""Golden small graphs, verbatim from the reference (FIXTURES.md §3)."""

# A7 — canonical 7×7 test matrix (reference graphblas/tests/test_matrix.py:34-49)
A7_ROWS = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
A7_COLS = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]
A7_VALS = [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4]
A7_N = 7

# v7 — canonical vector (reference graphblas/tests/test_matrix.py:52-55)
V7_IDX = [1, 3, 4, 6]
V7_VALS = [1, 1, 2, 0]
V7_N = 7

# PR5 — PageRank demo graph (reference notebooks/Pagerank Demo.ipynb cell 2)
PR5_ROWS = [0, 0, 1, 2, 2, 3, 4]
PR5_COLS = [1, 2, 3, 3, 4, 4, 0]
PR5_VALS = [1.1, 9.8, 4.2, 7.1, 0.2, 6.9, 2.2]
PR5_N = 5

# CC12 — FastSV demo graph, 3 components (FastSV notebook cells 2-3)
CC12_ROWS = [0, 0, 0, 1, 2, 2, 3, 6, 6, 9, 9]
CC12_COLS = [1, 2, 3, 2, 4, 5, 4, 7, 8, 10, 11]
CC12_N = 12

# K4 — complete graph on 4 vertices (4 triangles)
K4_EDGES = [(a, b) for a in range(4) for b in range(4) if a < b]

# STAR — triangle-free star
STAR_EDGES = [(0, k) for k in range(1, 6)]
