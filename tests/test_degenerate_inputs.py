"""Degenerate-input contracts (round-4 advice closures): edgeless /
disjoint inputs return defined rows instead of NULLs or TypeErrors, and
a truncated densest-subgraph peel warns instead of silently stopping."""

import warnings
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from graph_python_spark.algorithms.densest import densest_subgraph
from graph_python_spark.algorithms.kcore import s_core
from graph_python_spark.algorithms.metrics import \
    normalized_mutual_information
from graph_python_spark.algorithms.spectral import spectral_gap


def test_spectral_gap_edgeless(spark):
    e = spark.createDataFrame([], "i long, j long")
    row = spectral_gap(e, iterations=3).first()
    assert row["n_vertices"] == 0
    assert row["lambda2_abs"] == 0.0
    assert row["spectral_gap"] == 1.0


def test_spectral_gap_self_loops_only(spark):
    # self-loops are dropped, so this is edgeless after normalization
    e = spark.createDataFrame([(1, 1), (2, 2)], "i long, j long")
    row = spectral_gap(e, iterations=3).first()
    assert row["n_vertices"] == 0 and row["spectral_gap"] == 1.0


def test_nmi_disjoint_ids(spark):
    a = spark.createDataFrame([(1, 10), (2, 10)], "id long, label long")
    b = spark.createDataFrame([(7, 20), (8, 21)], "id long, label long")
    row = normalized_mutual_information(a, b).first()
    assert row["n"] == 0
    assert row["h_a"] == 0.0 and row["h_b"] == 0.0
    assert row["mi"] == 0.0 and row["nmi"] == 0.0


def test_densest_warns_on_truncated_peel(spark):
    # a path with epsilon=0 peels only the degree-1 endpoints per round
    # (interior vertices sit above the 2E/V average), so one round
    # leaves live edges -> the guarantee no longer covers the full
    # graph and the loop must say so.  (A REGULAR graph is the wrong
    # fixture here: epsilon=0 peels <=-average, i.e. everyone at once.)
    path = [(i, i + 1) for i in range(7)]
    e = spark.createDataFrame(path, "i long, j long")
    with pytest.warns(RuntimeWarning, match="max_rounds"):
        summary, members = densest_subgraph(
            e, epsilon=Fraction(0), max_rounds=1)
    assert summary.count() == 1


def test_densest_no_warning_when_dry(spark):
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    e = spark.createDataFrame(cyc, "i long, j long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        summary, members = densest_subgraph(
            e, epsilon=Fraction(1, 2), max_rounds=16)
    # the best round on a 2-regular graph is the full cycle
    assert members.count() == 6


def test_s_core_boundary_kept_exact(spark):
    # vertex weighted degrees: a=3.0 (exactly s), b=3.0, c=2.0+1.0 --
    # triangle with weights 2,1,1: wdeg(a)=3, wdeg(b)=3, wdeg(c)=2;
    # at s=3 vertex c peels, then a-b survive iff w(a,b)>=3
    tri = [(1, 2, 2.0), (1, 3, 1.0), (2, 3, 1.0)]
    e = spark.createDataFrame(tri, "i long, j long, v double")
    out = s_core(e, s=3.0).orderBy("id").collect()
    # after peeling c=3: only edge (1,2,w=2) remains, wdeg=2 < 3 -> empty
    assert out == []
    out2 = {r["id"]: r["wdeg"] for r in s_core(e, s=2.0).collect()}
    # at s=2: c has wdeg 2 == s exactly and MUST be kept (integer
    # boundary, the advice case), fixpoint is the whole triangle
    assert out2 == {1: 3.0, 2: 3.0, 3: 2.0}


def test_coreness_star_hub(spark):
    # a 20k-leaf star plus a K4 clique: the hub's h-index frame in the
    # round-4 histogram formulation is 2 rows (distinct estimates {1, 3}),
    # never 20k — and the values must still be exact (star coreness 1,
    # clique coreness 3, hub max(1, shared leaf estimate) = 1 since the
    # hub only touches degree-1 leaves)
    from pyspark.sql import functions as F

    from graph_python_spark.algorithms.kcore import coreness_rounds

    n = 20_000
    star = spark.range(1, n + 1).select(
        F.lit(0).cast("long").alias("i"), F.col("id").alias("j"))
    k4 = spark.createDataFrame(
        [(a, b) for a in range(n + 1, n + 5) for b in range(a + 1, n + 5)],
        "i long, j long")
    cr = {r["id"]: r["coreness"]
          for r in coreness_rounds(star.unionByName(k4), rounds=4).collect()}
    assert cr[0] == 1
    assert all(cr[v] == 1 for v in (1, 2, n))
    assert all(cr[v] == 3 for v in range(n + 1, n + 5))
    assert len(cr) == n + 5


def test_densest_no_warning_when_final_round_peels_dry(spark):
    # the peel that empties the graph can land exactly on the last
    # allowed round; that is a COMPLETE run and must not warn
    e = spark.createDataFrame([(1, 2)], "i long, j long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        summary, members = densest_subgraph(
            e, epsilon=Fraction(0), max_rounds=1)
    assert summary.count() == 1 and members.count() == 2


def test_isclose_nonfinite_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from graph_python_spark.functions.ops import binary as B

    inf = float("inf")
    rows = [(inf, inf), (inf, -inf), (-inf, -inf), (inf, 1.0),
            (float("nan"), float("nan")), (float("nan"), 1.0),
            (1.0, 1.0 + 1e-9), (1.0, 2.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    op = B.isclose(1e-7)
    got = [r[0] for r in df.select(op(F.col("a"), F.col("b"))).collect()]
    want = [bool(np.isclose(a, b, rtol=1e-7, atol=0.0)) for a, b in rows]
    assert got == want, list(zip(rows, got, want))


def test_isclose_symmetric_reference_semantics(spark):
    """binary.isclose follows the reference's symmetric math.isclose
    formula (core/operator/binary.py:243-247), NOT numpy's asymmetric
    |a-b| <= atol + rtol*|b|: with rel_tol=0.05, (100, 95) is close
    under max(|a|,|b|) scaling in BOTH argument orders, while numpy
    would reject (100, 95) and accept (95, 100)."""
    import math

    from pyspark.sql import functions as F

    from graph_python_spark.functions.ops import binary as B

    rows = [(100.0, 95.0), (95.0, 100.0), (100.0, 94.0), (0.0, 0.2),
            (0.0, 0.3), (-10.0, -10.4)]
    df = spark.createDataFrame(rows, "a double, b double")
    op = B.isclose(0.05, 0.25)
    got = [r[0] for r in df.select(op(F.col("a"), F.col("b"))).collect()]
    want = [math.isclose(a, b, rel_tol=0.05, abs_tol=0.25) for a, b in rows]
    assert got == want == [True, True, False, True, False, True]
    # the ndarray oracle on the op agrees with the Column path
    np_kernel = B.isclose.np_factory(0.05, 0.25)
    import numpy as np
    a = np.array([r[0] for r in rows])
    b = np.array([r[1] for r in rows])
    assert [bool(x) for x in np_kernel(a, b)] == want


def test_kmeans_sample_below_k_raises(spark):
    import pytest as _pytest

    from graph_python_spark.pipeline.similarity import kmeans_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with _pytest.raises(ValueError, match="sample_n"):
        kmeans_train(emb, k=8, iterations=1, sample_n=4)
