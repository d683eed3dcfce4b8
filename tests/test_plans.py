"""Plan audit: the scale-sensitive query paths must never plan an
unbounded row-pair product.  CartesianProduct is forbidden everywhere;
BroadcastNestedLoopJoin is allowed only where the algorithm is a
broadcast-small-side scan by design (brute-force cosine baseline scoring
every vector against the broadcast query set; IVF routing every vector to
its nearest broadcast centroid) — both O(n x small), scan-bounded."""

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# queries whose algorithm IS a broadcast-small-side nested-loop scan
BNLJ_BY_DESIGN = {"ann_cosine_topk", "ivf_topk"}

# candidate-pair generators + graph kernels: the paths where an accidental
# cartesian would be a 100-TB catastrophe
AUDITED = [
    "near_dup_cosine", "minhash_lsh", "token_jaccard", "simhash_pairs",
    "lsh_cosine_topk", "ann_cosine_topk", "ivf_topk", "dedup_exact",
    "triangle_count", "mxm_plus_times", "mxm_masked_plus_pair",
    "degree_out", "cc_labels",
    # late r2: peeling / centrality / wedge-join paths
    "kcore", "hits", "ppr", "jaccard_neighbors",
    # r2 session 3: truss/clustering wedge joins, Brandes waves, Luby MIS
    "ktruss", "clustering_coeff", "betweenness", "mis",
    # r2 session 4: link-prediction wedge join, metric label joins, walks,
    # shingle inverted index, double-sweep BFS
    "link_predict", "modularity", "assortativity", "random_walks",
    "ngram_jaccard", "pseudo_diameter", "harmonic", "feature_prop",
    "cocitation",
]


@pytest.mark.parametrize("name", AUDITED)
def test_no_unbounded_products(spark, name):
    queries = entrymod.queries()
    df = queries[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in BNLJ_BY_DESIGN:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join outside the documented "
            "broadcast-small-side designs"
        )


def test_loop_shuffle_width_bounds_and_restore(spark):
    from graph_python_spark.plans.iterate import loop_shuffle_width

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    configured = int(before)

    # small frontier: width shrinks to the 4-partition floor
    with loop_shuffle_width(spark, 10_000) as w:
        assert w == min(configured, 4)
        assert spark.conf.get(key) == str(w)
    assert spark.conf.get(key) == before

    # large frontier: the configured session width is the upper bound, so
    # a cluster-sized run keeps its partitioning untouched
    with loop_shuffle_width(spark, 10_000_000) as w:
        assert w == configured
        assert spark.conf.get(key) == before

    # mid-size: ceil(n / per_partition)
    with loop_shuffle_width(spark, 260_000, per_partition=50_000) as w:
        assert w == min(configured, 6)
    assert spark.conf.get(key) == before

    # restore happens even if the loop body raises
    try:
        with loop_shuffle_width(spark, 10_000):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before
