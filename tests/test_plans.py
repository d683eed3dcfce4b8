"""Plan audit over EVERY queries() entry (the Spark analogue of the
reference's ``tests/test_recorder.py`` physical-plan regression surface).

Scale rules enforced on the optimized physical plan of all 144 queries:

  * ``CartesianProduct`` is forbidden everywhere, no exceptions — an
    unbounded row-pair product is a 100-TB catastrophe.
  * ``BroadcastNestedLoopJoin`` is allowed only where the algorithm IS a
    broadcast-small-side scan by design, with a pinned maximum count:
    either a broadcast query/centroid set scored against every row
    (O(n × small), scan-bounded), a crossJoin of a 1-row global aggregate
    (corpus stats, vertex counts, fold results), or an operator whose
    SEMANTICS are a pairwise product (kronecker / outer product — output
    size is the product; the small side is broadcast).
  * ``Exchange SinglePartition`` is allowed only with a pinned maximum
    count, for 1-row global folds (reduce-to-scalar aggregates) and the
    bounded ≤256-row offset relations of the two-phase prefix-sum /
    quantile designs.

Any NEW nested-loop join or single-partition exchange — in a listed query
beyond its pinned count, or in any unlisted query — fails the suite.
"""

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# name -> (max BroadcastNestedLoopJoin, reason)
BNLJ_ALLOW = {
    "ann_cosine_topk": (1, "brute-force baseline: broadcast query set scans all vectors"),
    "ivf_topk": (2, "centroid routing + probe: broadcast centroid array, by design"),
    "ivf_pq": (2, "IVF routing + probe: broadcast centroid array, by design"),
    "ivf_pq_residual": (3, "coarse-kmeans centroid fold + IVF probe + PQ "
                           "centroid-array fold — all broadcast 1-row/"
                           "n_cells-row relations, by design"),
    "kronecker": (1, "operator semantics ARE the pairwise product; small side broadcast"),
    "outer_product": (1, "u⊗v semantics; one side broadcast"),
    "ewise_add_vector": (1, "broadcast 1-row dense-extent aggregate"),
    "bm25": (1, "broadcast 1-row corpus stats (N, avgdl)"),
    "centroid_classify": (1, "broadcast centroid-array 1-row fold"),
    "conductance": (1, "broadcast 1-row total-volume fold"),
    "corpus_stats": (1, "broadcast 1-row corpus aggregate"),
    "kmeans": (1, "broadcast 1-row centroid-array fold (zero-shuffle assignment)"),
    "semdedup": (3, "kmeans centroid fold + within-cluster stats broadcasts"),
    "tfidf_topk": (1, "broadcast 1-row document-count fold"),
    "triad_census": (1, "broadcast 1-row edge/vertex-count fold"),
    "attr_assortativity": (1, "broadcast 1-row moment fold"),
    "degree_drift": (3, "two snapshot 1-row mass folds + TV-distance merge"),
    "pmi_topk": (1, "broadcast 1-row total-bigram-count fold"),
    "heavy_hitters": (1, "broadcast 1-row total-token-count fold"),
    "eff_diameter": (1, "broadcast 1-row N(radius) fold from the NF curve"),
    "nmi": (1, "broadcast 1-row total-count fold"),
    "dsir_weights": (1, "broadcast 1-row corpus-total fold into the "
                        "bucket log-ratio table"),
}

# name -> (max Exchange SinglePartition, reason)
SP_ALLOW = {
    "reduce_scalar": (1, "the operator IS a 1-row global fold"),
    "triangle_count": (1, "1-row global count"),
    "four_cycles": (1, "1-row global count"),
    "modularity": (1, "1-row global modularity fold"),
    "assortativity": (1, "1-row moment fold"),
    "attr_assortativity": (2, "per-attribute moment folds"),
    "degree_quantiles": (1, "quantile merge over a ≤256-row per-partition sketch"),
    "powerlaw_alpha": (1, "1-row Hill-estimator fold"),
    "pack_sequences": (1, "two-phase prefix sum: ≤256-row partition-offset relation"),
    "shard_assign": (1, "two-phase rank: ≤256-row partition-offset relation"),
    "pipeline_pack": (1, "same prefix-sum offsets inside the e2e composite"),
    "bm25": (1, "1-row corpus-stats fold"),
    "centroid_classify": (1, "1-row centroid-array fold"),
    "conductance": (1, "1-row volume fold"),
    "corpus_stats": (1, "1-row corpus aggregate"),
    "kmeans": (1, "1-row centroid-array fold"),
    "semdedup": (3, "centroid fold + per-cluster stats folds"),
    "tfidf_topk": (1, "1-row document-count fold"),
    "triad_census": (2, "count folds feeding the census algebra"),
    "degree_drift": (3, "snapshot mass folds"),
    "degree_relabel": (1, "two-phase rank: ≤256-row partition-offset relation"),
    "relabel_locality": (3, "rank offsets (×2 mapping reuse) + 1-row gap fold"),
    "pmi_topk": (1, "1-row total-bigram-count fold"),
    "heavy_hitters": (1, "1-row total-token-count fold"),
    "triangles_incr": (1, "the operator RETURNS a 1-row delta count"),
    "nmi": (2, "1-row total fold + single global metric fold"),
    "spearman": (3, "two ≤P-row rank-offset relations + 1-row fold"),
    "ivf_pq_residual": (2, "1-row centroid-array folds (coarse kmeans + "
                           "PQ init), the kmeans precedent"),
    "dsir_weights": (1, "1-row corpus-total fold"),
}


@pytest.fixture(scope="module")
def all_plans(spark):
    """Build every query's optimized physical plan once (no execution
    beyond what the builders themselves materialize)."""
    qs = entrymod.queries()
    plans = {}
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        plans[name] = df._jdf.queryExecution().executedPlan().toString()
    return plans


def _names():
    return sorted(entrymod.queries())


@pytest.mark.parametrize("name", _names())
def test_plan_scale_rules(all_plans, name):
    plan = all_plans[name]
    assert "CartesianProduct" not in plan, (
        f"{name} plans a cartesian product")

    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    max_bnlj = BNLJ_ALLOW.get(name, (0, ""))[0]
    assert n_bnlj <= max_bnlj, (
        f"{name}: {n_bnlj} BroadcastNestedLoopJoin (allowed {max_bnlj}"
        f"{' — ' + BNLJ_ALLOW[name][1] if name in BNLJ_ALLOW else ''})")

    n_sp = plan.count("Exchange SinglePartition")
    max_sp = SP_ALLOW.get(name, (0, ""))[0]
    assert n_sp <= max_sp, (
        f"{name}: {n_sp} Exchange SinglePartition (allowed {max_sp}"
        f"{' — ' + SP_ALLOW[name][1] if name in SP_ALLOW else ''})")


def test_allowlists_not_stale():
    """Every allowlist entry must name a real query — dead entries hide
    regressions when a query is renamed."""
    names = set(entrymod.queries())
    assert set(BNLJ_ALLOW) <= names
    assert set(SP_ALLOW) <= names


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
