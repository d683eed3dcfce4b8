"""Checkpoint/resume (north rule): a run killed mid-iteration resumes from
the last manifest and converges to identical scores."""

import pytest
from pyspark.sql import functions as F

from graph_python_spark.algorithms import connected_components, pagerank
from graph_python_spark.plans.iterate import IterationState
from tests.fixtures import CC12_COLS, CC12_N, CC12_ROWS, PR5_COLS, PR5_N, PR5_ROWS


def edge_df(spark, rows, cols):
    return spark.createDataFrame(
        [(int(r), int(c), 1.0) for r, c in zip(rows, cols)], "i long, j long, v double"
    )


def vertex_df(spark, n):
    return spark.range(n).select("id")


def test_pagerank_resume_identical(spark, tmp_path):
    e = edge_df(spark, PR5_ROWS, PR5_COLS)
    v = vertex_df(spark, PR5_N)

    full, full_iters, _ = pagerank(e, v, tol=1e-6, itermax=200)
    want = {r["id"]: r["score"] for r in full.collect()}

    # "killed" run: stop after 5 iterations, checkpointing every iteration
    st = IterationState(str(tmp_path / "pr"), spark)
    partial, it1, rd1 = pagerank(e, v, tol=1e-6, itermax=5, checkpoint=st)
    assert it1 == 5
    m = st.load_manifest()
    assert m["iteration"] == 5 and len(m["metrics"]["rdiffs"]) == 5
    assert m["partitions"]["contrib"] >= 1  # per-partition lineage recorded

    # resumed run with the same state dir continues to convergence
    resumed, it2, rd2 = pagerank(e, v, tol=1e-6, itermax=200, checkpoint=st)
    assert it2 == full_iters
    got = {r["id"]: r["score"] for r in resumed.collect()}
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-12), k

    # resuming an already-converged state is a no-op returning final scores
    again, it3, _ = pagerank(e, v, tol=1e-6, itermax=200, checkpoint=st)
    assert it3 == it2
    got = {r["id"]: r["score"] for r in again.collect()}
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-12), k


def test_cc_resume(spark, tmp_path):
    e = edge_df(spark, CC12_ROWS, CC12_COLS)
    v = vertex_df(spark, CC12_N)
    full, _ = connected_components(e, v)
    want = {r["id"]: r["component"] for r in full.collect()}

    st = IterationState(str(tmp_path / "cc"), spark)
    connected_components(e, v, max_rounds=1, checkpoint=st)
    assert st.load_manifest()["iteration"] == 1
    resumed, _ = connected_components(e, v, checkpoint=st)
    got = {r["id"]: r["component"] for r in resumed.collect()}
    assert got == want


def test_manifest_gc_keeps_last_two(spark, tmp_path):
    import os

    st = IterationState(str(tmp_path / "gc"), spark)
    df = spark.range(3).select(F.col("id").alias("i"), F.lit(1.0).alias("v"))
    for k in range(1, 5):
        st.save(k, {"s": df}, {"k": k})
    dirs = sorted(d for d in os.listdir(st.root) if d.startswith("iter="))
    assert dirs == ["iter=3", "iter=4"]
    it, states, metrics = st.restore()
    assert it == 4 and states["s"].count() == 3 and metrics["k"] == 4


def test_louvain_resume_identical(spark, tmp_path):
    from graph_python_spark.algorithms.louvain import louvain_sweeps

    # ring of 3 triangles, weighted
    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (6, 7), (7, 8), (6, 8),
           (2, 3), (5, 6), (8, 0)]
    e = spark.createDataFrame([(a, b, 1.0) for a, b in tri], "i long, j long, v double")

    want = {r["id"]: r["community"] for r in louvain_sweeps(e, sweeps=4).collect()}

    # "killed" after 2 sweeps; resume must preserve the parity alternation
    st = IterationState(str(tmp_path / "lv"), spark)
    louvain_sweeps(e, sweeps=2, checkpoint=st)
    assert st.load_manifest()["iteration"] == 2
    resumed = louvain_sweeps(e, sweeps=4, checkpoint=st)
    got = {r["id"]: r["community"] for r in resumed.collect()}
    assert got == want


def test_kcore_resume_identical(spark, tmp_path):
    from graph_python_spark.algorithms.kcore import kcore

    # triangle strip + pendant chain: k=2 peels the chain one vertex per
    # round, so a 2-round cut genuinely stops mid-peel
    strip = [(t, t + 1) for t in range(6)] + [(t, t + 2) for t in range(5)]
    chain = [(100, 101), (101, 102), (102, 103), (103, 0)]
    e = spark.createDataFrame([(int(a), int(b)) for a, b in strip + chain],
                              "i long, j long")

    full, full_rounds = kcore(e, k=2)
    want = {(r["id"], r["kdeg"]) for r in full.collect()}
    assert full_rounds > 3  # the chain forces a multi-round cascade

    st = IterationState(str(tmp_path / "kc"), spark)
    _partial, r1 = kcore(e, k=2, max_rounds=2, checkpoint=st)
    assert r1 == 2
    assert st.load_manifest()["iteration"] == 2

    resumed, r2 = kcore(e, k=2, checkpoint=st)
    got = {(r["id"], r["kdeg"]) for r in resumed.collect()}
    assert got == want
    assert r1 + r2 - 1 <= full_rounds + 1  # resume continues, not restarts
