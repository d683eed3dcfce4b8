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
