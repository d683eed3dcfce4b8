"""Session-10 additions: training-batch assembly operators
(pipeline/packing.py) and partition/attribute/temporal graph metrics
(algorithms/metrics.py) — each vs a pure-Python replay."""

import hashlib
import math

from pyspark.sql import functions as F

from graph_python_spark.algorithms.metrics import (
    attribute_assortativity,
    conductance,
    snapshot_diff,
)
from graph_python_spark.pipeline.packing import (
    chunk_documents,
    dataset_split,
    pack_sequences,
    quantize_embeddings,
    tfidf_topk,
)

DOCS = [
    (1, "a b c d e"),
    (2, "a a b"),
    (3, ""),
    (4, "x y z w q r s t u v"),
    (5, "b"),
    (6, "c c c c c c c"),
]


def docs_df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def toks(text):
    return [t for t in text.split(" ") if t != ""]


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------
def test_pack_sequences_matches_serial_replay(spark):
    budget = 4
    out = {r.doc_id: r for r in pack_sequences(docs_df(spark), budget).collect()}
    order = sorted(
        [(hashlib.md5(str(d).encode()).hexdigest(), d, len(toks(t)))
         for d, t in DOCS if toks(t)])
    offset = 0
    for _h, d, n in order:
        r = out[d]
        assert r.n_tokens == n
        assert r.start_offset == offset
        assert r.bin_start == offset // budget
        assert r.bin_end == (offset + n - 1) // budget
        assert r.crosses == (1 if r.bin_end > r.bin_start else 0)
        offset += n
    assert set(out) == {d for d, t in DOCS if toks(t)}  # empty doc dropped


def test_pack_sequences_offsets_are_gapless(spark):
    rows = [(i, "tok " * (i % 7 + 1)) for i in range(200)]
    res = pack_sequences(docs_df(spark, rows), 64).collect()
    spans = sorted((r.start_offset, r.n_tokens) for r in res)
    pos = 0
    for s, n in spans:
        assert s == pos
        pos += n


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------
def test_chunk_documents_replay(spark):
    cs, ov = 3, 1
    stride = cs - ov
    out = chunk_documents(docs_df(spark), cs, ov).collect()
    got = {(r.doc_id, r.chunk_id): r for r in out}
    expect_n = 0
    for d, t in DOCS:
        tk = toks(t)
        if not tk:
            continue
        k = 1 + max(0, math.ceil((len(tk) - cs) / stride))
        expect_n += k
        for ci in range(k):
            start = ci * stride
            sl = tk[start:start + cs]
            r = got[(d, ci)]
            assert r.start_tok == start
            assert r.n_chunk_tokens == len(sl)
            assert r.chunk_md5 == hashlib.md5(" ".join(sl).encode()).hexdigest()
    assert len(out) == expect_n


def test_chunk_documents_single_chunk_when_short(spark):
    out = chunk_documents(docs_df(spark, [(9, "a b")]), 64, 16).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 2


# ---------------------------------------------------------------------------
# dataset_split
# ---------------------------------------------------------------------------
def test_dataset_split_deterministic_and_stable(spark):
    rows = [(i, "x") for i in range(500)]
    full = dict(dataset_split(docs_df(spark, rows)).collect())
    again = dict(dataset_split(docs_df(spark, rows)).collect())
    assert full == again
    # a row's split never changes when OTHER rows are added/removed
    sub = dict(dataset_split(docs_df(spark, rows[:100])).collect())
    assert all(full[k] == v for k, v in sub.items())
    frac_train = sum(1 for v in full.values() if v == "train") / 500
    assert 0.7 < frac_train < 0.9
    assert set(full.values()) == {"train", "valid", "test"}


# ---------------------------------------------------------------------------
# tfidf_topk
# ---------------------------------------------------------------------------
def test_tfidf_topk_replay(spark):
    out = tfidf_topk(docs_df(spark), k=2, max_df_frac=0.9).collect()
    n_docs = len(DOCS)
    tf = {}
    df = {}
    for d, t in DOCS:
        seen = set()
        for tok in toks(t):
            tf[(d, tok)] = tf.get((d, tok), 0) + 1
            if tok not in seen:
                seen.add(tok)
                df[tok] = df.get(tok, 0) + 1
    scores = {}
    for (d, tok), f_ in tf.items():
        if df[tok] <= 0.9 * n_docs:
            scores.setdefault(d, []).append(
                (-f_ * math.log(n_docs / df[tok]), tok, f_))
    for d, lst in scores.items():
        lst.sort()
        want = lst[:2]
        got = sorted([r for r in out if r.doc_id == d], key=lambda r: r.rank)
        assert [g.tok for g in got] == [w[1] for w in want]
        for g, w in zip(got, want):
            assert g.tf == w[2]
            assert abs(g.score - (-w[0])) < 1e-6


# ---------------------------------------------------------------------------
# quantize_embeddings
# ---------------------------------------------------------------------------
def test_quantize_embeddings_replay(spark):
    vecs = [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0]), (3, [2.0])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    for vid, xs in vecs:
        mx = max(abs(x) for x in xs)
        codes = [math.floor(x / mx * 127.0 + 0.5) if mx > 0 else 0 for x in xs]
        mse = sum((x - c * mx / 127.0) ** 2 for x, c in zip(xs, codes)) / len(xs)
        r = out[vid]
        assert r.n_dims == len(xs)
        assert r.sum_codes == sum(codes)
        assert abs(r.max_abs - round(mx, 6)) < 1e-9
        assert abs(r.mse - mse) < 1e-6
        assert all(-127 <= c <= 127 for c in codes)


# ---------------------------------------------------------------------------
# graph metrics
# ---------------------------------------------------------------------------
def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(i), int(j)) for i, j in pairs], "i long, j long")


def test_conductance_two_cliques_with_bridge(spark):
    # cliques {0,1,2} and {3,4,5} joined by one bridge 2-3
    pairs = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    mapping = spark.createDataFrame(
        [(v, v // 3) for v in range(6)], "id long, group long")
    out = {r.group: r for r in conductance(edges_df(spark, pairs), mapping).collect()}
    # each side: volume = 2*3 intra-endpoints + 1 bridge endpoint = 7, cut = 1
    for g in (0, 1):
        assert out[g].volume == 7
        assert out[g].cut == 1
        assert abs(out[g].conductance - round(1 / 7, 6)) < 1e-9


def test_conductance_single_group_is_zero(spark):
    pairs = [(0, 1), (1, 2)]
    mapping = spark.createDataFrame([(v, 0) for v in range(3)], "id long, group long")
    out = conductance(edges_df(spark, pairs), mapping).collect()
    assert len(out) == 1 and out[0].cut == 0 and out[0].conductance == 0.0


def test_attribute_assortativity_extremes(spark):
    # perfectly assortative: two mono-attribute components
    pairs = [(0, 1), (1, 2), (3, 4), (4, 5)]
    attrs = spark.createDataFrame(
        [(v, v // 3) for v in range(6)], "id long, attr long")
    r = attribute_assortativity(edges_df(spark, pairs), attrs).collect()[0]
    assert r.assortativity == 1.0
    assert r.n_intra == r.n_endpoints
    # perfectly DISassortative: complete bipartite K2,2 across attributes
    pairs2 = [(0, 2), (0, 3), (1, 2), (1, 3)]
    attrs2 = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, attr long")
    r2 = attribute_assortativity(edges_df(spark, pairs2), attrs2).collect()[0]
    assert r2.assortativity == -1.0
    assert r2.n_intra == 0


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 1), (4, 5, 2)], "i long, j long, v long")
    new = spark.createDataFrame(
        [(1, 2, 5), (6, 7, 1)], "i long, j long, v long")
    out = {(r.i, r.j): r for r in snapshot_diff(old, new).collect()}
    assert out[(1, 2)].status == "retained"
    assert (out[(1, 2)].w_old, out[(1, 2)].w_new) == (3, 5)
    assert out[(2, 3)].status == "removed" and out[(2, 3)].w_new == 0
    assert out[(6, 7)].status == "added" and out[(6, 7)].w_old == 0
    assert len(out) == 4


# ---------------------------------------------------------------------------
# walk_skipgrams / bpe_merge_candidates / topk_neighbors
# ---------------------------------------------------------------------------
def test_walk_skipgrams_replay(spark):
    from graph_python_spark.algorithms.walks import walk_skipgrams

    walks = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 11), (1, 2, 12), (1, 3, 10),
         (2, 0, 20), (2, 1, 21)],
        "walk long, step long, v long")
    out = {(r.center, r.context): r.pair_count
           for r in walk_skipgrams(walks, window=2).collect()}
    seq = {1: [10, 11, 12, 10], 2: [20, 21]}
    want = {}
    for vs in seq.values():
        for i, c in enumerate(vs):
            for j, x in enumerate(vs):
                if i != j and abs(i - j) <= 2:
                    want[(c, x)] = want.get((c, x), 0) + 1
    assert out == want


def test_bpe_merge_candidates_replay(spark):
    from graph_python_spark.pipeline.text import bpe_merge_candidates

    rows = [(1, "a b a b c"), (2, "a b"), (3, "c"), (4, "")]
    out = [(r.tok_a, r.tok_b, r.pair_count)
           for r in bpe_merge_candidates(docs_df(spark, rows), k=3).collect()]
    # pairs: (a,b)x3, (b,a)x1, (b,c)x1 -> top3 with tie-break (b,a)<(b,c)
    assert out == [("a", "b", 3), ("b", "a", 1), ("b", "c", 1)]


def test_topk_neighbors_replay(spark):
    from graph_python_spark.algorithms.vertexsim import topk_neighbors

    proj = spark.createDataFrame(
        [(1, 2, 5), (1, 3, 5), (2, 3, 9)], "u long, v long, weight long")
    out = {(r.id, r.rank): (r.rec, r.weight)
           for r in topk_neighbors(proj, k=2).collect()}
    assert out[(1, 1)] == (2, 5) and out[(1, 2)] == (3, 5)  # weight tie -> rec asc
    assert out[(2, 1)] == (3, 9) and out[(2, 2)] == (1, 5)
    assert out[(3, 1)] == (2, 9) and out[(3, 2)] == (1, 5)


# ---------------------------------------------------------------------------
# pca_top_component / token_entropy / pagerank_incremental
# ---------------------------------------------------------------------------
def test_pca_top_component_matches_numpy(spark):
    import numpy as np

    from graph_python_spark.pipeline.features import pca_top_component

    rng = np.random.RandomState(7)
    # anisotropic cloud: dominant direction along a fixed unit vector
    d, n = 8, 200
    u = rng.randn(d); u /= np.linalg.norm(u)
    X = rng.randn(n, d) * 0.1 + np.outer(rng.randn(n) * 3.0, u)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    out = pca_top_component(emb, iterations=8).collect()
    v = np.zeros(d)
    for r in out:
        v[r.pos] = r.loading
    # replay the same iteration in NumPy (float32 input like the engine)
    Xf = X.astype(np.float32).astype(np.float64)
    xc = Xf - Xf.mean(axis=0)
    w = np.ones(d)
    for _ in range(8):
        w = xc.T @ (xc @ w)
        w = w / np.max(np.abs(w))
    assert np.allclose(v, np.round(w, 6), atol=2e-6)
    # and it found the true dominant direction
    cos = abs(np.dot(v, u)) / (np.linalg.norm(v) * np.linalg.norm(u))
    assert cos > 0.99


def test_token_entropy_replay(spark):
    import math as m

    from graph_python_spark.pipeline.text import token_entropy

    out = {r.doc_id: r for r in token_entropy(docs_df(spark)).collect()}
    for d, t in DOCS:
        tk = toks(t)
        if not tk:
            assert d not in out
            continue
        n = len(tk)
        cnt = {}
        for x in tk:
            cnt[x] = cnt.get(x, 0) + 1
        h = -sum((c / n) * m.log(c / n) for c in cnt.values())
        assert out[d].n_tokens == n
        assert abs(out[d].entropy - h) < 1e-6
    # uniform doc maxes entropy, constant doc zeroes it
    assert out[6].entropy == 0.0
    assert abs(out[1].entropy - m.log(5)) < 1e-6


def test_pagerank_incremental_fixpoint_and_warmstart(spark):
    from graph_python_spark.algorithms.pagerank import (
        pagerank,
        pagerank_fixed,
        pagerank_incremental,
    )

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 0)],
        "i long, j long")
    converged, iters, _ = pagerank(e, tol=1e-10)
    converged = converged.localCheckpoint(eager=True)
    # warm-starting from the fixpoint stays at the fixpoint
    again = pagerank_incremental(e, converged, iterations=3)
    diff = (converged.withColumnRenamed("score", "s0")
            .join(again, "id")
            .agg(F.sum(F.abs(F.col("score") - F.col("s0"))).alias("d"))
            .first()["d"])
    assert diff < 1e-9
    # 3 warm iterations land closer to the fixpoint than 3 cold ones
    cold = pagerank_fixed(e, iterations=3)
    cold_diff = (converged.withColumnRenamed("score", "s0")
                 .join(cold, "id")
                 .agg(F.sum(F.abs(F.col("score") - F.col("s0"))).alias("d"))
                 .first()["d"])
    # (trivially true here since warm starts AT the fixpoint; the point is
    # the wiring: new-graph vertices absent from init get the 1/n prior)
    assert diff < cold_diff
    # a graph gaining a vertex: init lacks id=5, run must still cover it
    e2 = e.unionByName(spark.createDataFrame([(4, 5)], "i long, j long"))
    out2 = pagerank_incremental(e2, converged, iterations=2)
    assert out2.filter(F.col("id") == 5).count() == 1
    assert abs(out2.agg(F.sum("score")).first()[0] - 1.0) < 0.3


# ---------------------------------------------------------------------------
# event_bursts / event_transitions / maximal_matching
# ---------------------------------------------------------------------------
def _events_df(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [(i, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), u, t, 1.0)
         for i, (s, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double")


def test_event_bursts_flags_outlier_bucket(spark):
    from graph_python_spark.pipeline.temporal import event_bursts

    # 10 quiet hourly buckets with 1 event, one bucket with 50
    rows = [(h * 3600, 1, "view") for h in range(10)]
    rows += [(10 * 3600 + s, 1, "view") for s in range(50)]
    out = event_bursts(_events_df(spark, rows), 3600, z=3.0).collect()
    assert len(out) == 1
    assert out[0].n_events == 50
    # replay the z-score on exact moments
    import math as m
    counts = [1] * 10 + [50]
    nb, s1, s2 = len(counts), sum(counts), sum(c * c for c in counts)
    mean = s1 / nb
    sd = m.sqrt((nb * s2 - s1 * s1) / (nb * nb))
    assert abs(out[0].zscore - round((50 - mean) / sd, 6)) < 1e-9


def test_event_transitions_replay(spark):
    from graph_python_spark.pipeline.temporal import event_transitions

    rows = [(0, 1, "view"), (10, 1, "click"), (20, 1, "view"),
            (30, 1, "click"), (5, 2, "view"), (15, 2, "purchase")]
    out = {(r.from_type, r.to_type): (r.n_transitions, r.prob)
           for r in event_transitions(_events_df(spark, rows)).collect()}
    assert out[("view", "click")] == (2, round(2 / 3, 6))
    assert out[("view", "purchase")] == (1, round(1 / 3, 6))
    assert out[("click", "view")] == (1, 1.0)
    assert len(out) == 3


def test_maximal_matching_is_a_matching_and_maximal(spark):
    import random

    from graph_python_spark.algorithms.matching import maximal_matching

    rng = random.Random(3)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
    e = edges_df(spark, pairs)
    out = maximal_matching(e, rounds=8).collect()
    used = set()
    matched_edges = set()
    for r in out:
        assert r.a < r.b
        assert r.a not in used and r.b not in used  # vertex-disjoint
        used.add(r.a); used.add(r.b)
        matched_edges.add((r.a, r.b))
    # maximality: every original edge touches a matched vertex
    for i, j in pairs:
        a, b = min(i, j), max(i, j)
        if a == b:
            continue
        assert a in used or b in used, (a, b)


def test_maximal_matching_single_edge(spark):
    from graph_python_spark.algorithms.matching import maximal_matching

    out = maximal_matching(edges_df(spark, [(1, 2)]), rounds=2).collect()
    assert len(out) == 1 and (out[0].a, out[0].b, out[0].round) == (1, 2, 1)


# ---------------------------------------------------------------------------
# pipeline_pack_e2e / graph_summary / LSH index persistence
# ---------------------------------------------------------------------------
def test_pipeline_pack_e2e_stages_compose(spark):
    from graph_python_spark.pipeline.packing import pipeline_pack_e2e

    good = "the quick brown fox jumps over a lazy dog near the old river bank"
    rows = [(1, good), (2, good),              # exact dups: one survives
            (3, "a a a a a a a a a a a a a"),  # repetition-killed
            (4, "short text"),                 # too few words
            (5, good + " again and again today")]
    out = pipeline_pack_e2e(docs_df(spark, rows), budget=8,
                            train_frac=1.0, valid_frac=0.0).collect()
    ids = {r.doc_id for r in out}
    assert 2 not in ids and 3 not in ids and 4 not in ids
    assert ids <= {1, 5} and 1 in ids
    # offsets are gapless over the surviving stream
    spans = sorted((r.start_offset, r.n_tokens) for r in out)
    pos = 0
    for s, n in spans:
        assert s == pos
        pos += n


def test_graph_summary_replay(spark):
    from graph_python_spark.algorithms.metrics import graph_summary

    out = graph_summary(edges_df(spark, [(0, 1), (0, 2), (1, 2), (2, 0),
                                         (3, 3)])).collect()[0]
    assert out.n_vertices == 3 and out.n_edges == 4  # self-loop dropped
    assert out.max_out_degree == 2
    assert abs(out.mean_out_degree - round(4 / 3, 6)) < 1e-9
    assert abs(out.density - round(4 / 6, 6)) < 1e-9


def test_lsh_index_roundtrip(tmp_path, spark):
    from graph_python_spark.pipeline.similarity import (
        load_lsh_index,
        lsh_signatures,
        save_lsh_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "lsh_index")
    save_lsh_index(emb, path, dim=64, planes=6)
    loaded = load_lsh_index(spark, path)
    fresh = lsh_signatures(emb, dim=64, planes=6).select("vec_id", "bucket")
    assert loaded.count() == emb.count()
    diff = (loaded.join(fresh, ["vec_id", "bucket"], "full_outer")
            .filter(F.col("vec_id").isNull() | F.col("bucket").isNull()).count())
    assert diff == 0
    # partition pruning: a bucket filter reads a subset of files
    one = loaded.filter(F.col("bucket") == loaded.select("bucket").first()[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() > 0


# ---------------------------------------------------------------------------
# corpus_stats / label_centroids / stream_bursts
# ---------------------------------------------------------------------------
def test_corpus_stats_replay(spark):
    from graph_python_spark.pipeline.text import corpus_stats

    rows = [(1, "a b c", "en", "s0"), (2, "d e", "en", "s0"),
            (3, "f", "de", "s1"), (4, "", "de", "s1")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = {(r.lang, r.source): r for r in corpus_stats(df).collect()}
    assert out[("en", "s0")].n_docs == 2 and out[("en", "s0")].n_tokens == 5
    assert out[("de", "s1")].n_docs == 2 and out[("de", "s1")].n_tokens == 1
    assert abs(out[("en", "s0")].token_share - round(5 / 6, 6)) < 1e-9


def test_label_centroids_identity(spark):
    import numpy as np

    from graph_python_spark.pipeline.features import label_centroids

    rng = np.random.RandomState(11)
    vecs, rows = {}, []
    for vid in range(60):
        lab = vid % 3
        x = rng.randn(6).astype(np.float32)
        vecs.setdefault(lab, []).append(x.astype(np.float64))
        rows.append((vid, [float(v) for v in x], lab))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in label_centroids(emb).collect()}
    for lab, xs in vecs.items():
        X = np.vstack(xs)
        c = X.mean(axis=0)
        msd = ((X - c) ** 2).sum(axis=1).mean()
        r = out[lab]
        assert r.n_vecs == len(xs)
        assert abs(r.centroid_norm - np.linalg.norm(c)) < 1e-6
        assert abs(r.mean_sq_dist - msd) < 1e-6


def test_stream_bursts_flags_against_static_baseline(tmp_path, spark):
    import datetime as dt

    from graph_python_spark.streaming.streams import run_to_memory, stream_bursts

    path = str(tmp_path / "ev_stream")
    rows = [(i, dt.datetime(2026, 1, 1, 0, 0) + dt.timedelta(seconds=i), 1,
             "view", 1.0, None) for i in range(40)]           # burst hour 0
    rows += [(100 + h, dt.datetime(2026, 1, 1, h) + dt.timedelta(minutes=5),
              1, "view", 1.0, None) for h in range(1, 4)]      # quiet hours
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string").write.mode("overwrite").parquet(path)
    baseline = spark.createDataFrame(
        [("view", 2.0, 1.0)], "event_type string, mean_events double, sd_events double")
    out = stream_bursts(spark, path, baseline, bucket_seconds=3600,
                        watermark="0 seconds", z=3.0)
    run_to_memory(out, "bursts_sink", "append")
    got = spark.sql("select * from bursts_sink").collect()
    assert len(got) == 1 and got[0].n_events == 40
    assert abs(got[0].zscore - 38.0) < 1e-9


def test_powerlaw_alpha_recovers_exponent(spark):
    import math as m

    from graph_python_spark.algorithms.metrics import powerlaw_alpha

    # exact replay on a crafted degree sequence: vertex v has out-degree d_v
    degs = {0: 1, 1: 2, 2: 2, 3: 4, 4: 8, 5: 16}
    pairs = [(v, 1000 + t) for v, d in degs.items() for t in range(d)]
    out = powerlaw_alpha(edges_df(spark, pairs), d_min=2).collect()[0]
    tail = [d for d in degs.values() if d >= 2]
    alpha = 1.0 + len(tail) / sum(m.log(d / 2.0) for d in tail)
    assert out.n_tail == len(tail)
    assert abs(out.alpha - round(alpha, 6)) < 1e-9


def test_review_fix_edge_cases(spark):
    import pytest

    from graph_python_spark.algorithms.matching import maximal_matching
    from graph_python_spark.algorithms.metrics import (
        attribute_assortativity,
        powerlaw_alpha,
    )
    from graph_python_spark.pipeline.packing import dataset_split

    # matching rejects rounds < 1
    with pytest.raises(ValueError):
        maximal_matching(edges_df(spark, [(1, 2)]), rounds=0)
    # dataset_split rejects non-integral keys
    sdocs = spark.createDataFrame([("u1", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        dataset_split(sdocs)
    # single attribute class -> perfectly assortative by convention
    attrs = spark.createDataFrame([(0, 7), (1, 7), (2, 7)], "id long, attr long")
    r = attribute_assortativity(edges_df(spark, [(0, 1), (1, 2)]), attrs).collect()[0]
    assert r.assortativity == 1.0
    # regular graph: alpha is NULL (no slope information), not a crash
    reg = [(v, 100 + 2 * v + t) for v in range(5) for t in range(2)]
    out = powerlaw_alpha(edges_df(spark, reg), d_min=2).collect()[0]
    assert out.n_tail == 5 and out.alpha is None


def test_cc_incremental_matches_cold_and_converges_faster(spark):
    from graph_python_spark.algorithms.components import (
        cc_fixed_rounds,
        cc_incremental,
    )

    # two chains merged by an added bridge
    old_edges = edges_df(spark, [(0, 1), (1, 2), (10, 11), (11, 12)])
    new_edges = edges_df(spark, [(0, 1), (1, 2), (10, 11), (11, 12), (2, 10)])
    init = cc_fixed_rounds(old_edges, rounds=6)
    warm = {r.id: r.component
            for r in cc_incremental(new_edges, init, rounds=3).collect()}
    # all six vertices collapse to component 0 in few warm rounds
    assert set(warm.values()) == {0}
    # new vertex absent from init starts at its own id and still joins
    new2 = new_edges.unionByName(edges_df(spark, [(12, 99)]))
    warm2 = {r.id: r.component
             for r in cc_incremental(new2, init, rounds=4).collect()}
    assert warm2[99] == 0 and set(warm2.values()) == {0}


def test_four_cycle_count_replay(spark):
    from itertools import combinations

    from graph_python_spark.algorithms.triangles import four_cycle_count

    # C4 on a square = 1; K4 has 3 four-cycles
    sq = four_cycle_count(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]))
    assert sq.collect()[0].n_four_cycles == 1
    k4 = four_cycle_count(
        edges_df(spark, list(combinations(range(4), 2)))).collect()[0]
    assert k4.n_four_cycles == 3
    # random graph vs brute force
    import random
    rng = random.Random(5)
    pairs = list({(rng.randrange(12), rng.randrange(12)) for _ in range(40)})
    adj = {}
    for i, j in pairs:
        if i != j:
            adj.setdefault(i, set()).add(j)
            adj.setdefault(j, set()).add(i)
    brute = 0
    vs = sorted(adj)
    for u, v in combinations(vs, 2):
        cn = len(adj[u] & adj[v])
        brute += cn * (cn - 1) // 2
    brute //= 2
    got = four_cycle_count(edges_df(spark, pairs)).collect()[0].n_four_cycles
    assert got == brute


def test_degree_drift_identical_snapshots_zero_tv(spark):
    from graph_python_spark.algorithms.metrics import degree_drift

    e = edges_df(spark, [(0, 1), (0, 2), (1, 2), (3, 0)])
    out = degree_drift(e, e).collect()
    assert all(r.tv_distance == 0.0 for r in out)
    assert all(r.n_old == r.n_new for r in out)


def test_degree_drift_detects_shape_change(spark):
    from graph_python_spark.algorithms.metrics import degree_drift

    # old: all degree-1; new: one vertex with degree 8
    old = edges_df(spark, [(v, 100 + v) for v in range(8)])
    new = edges_df(spark, [(0, 200 + t) for t in range(8)])
    out = degree_drift(old, new).collect()
    tv = out[0].tv_distance
    assert tv == 1.0  # disjoint buckets: max drift


def test_chunk_dedup_ratio_replay(spark):
    from graph_python_spark.pipeline.packing import chunk_dedup_ratio

    shared = "x y z"  # a chunk-sized block shared by docs 1 and 2
    rows = [(1, shared), (2, shared + " extra tail tokens here"),
            (3, "totally unique content words")]
    out = {r.doc_id: r for r in
           chunk_dedup_ratio(docs_df(spark, rows), chunk_size=3,
                             overlap=0).collect()}
    # doc1's single chunk "x y z" == doc2's first chunk
    assert out[1].n_dup_chunks == 1 and out[1].dup_ratio == 1.0
    assert out[2].n_chunks == 3 and out[2].n_dup_chunks == 1
    assert out[3].n_dup_chunks == 0 and out[3].dup_ratio == 0.0


def test_quality_by_source_replay(spark):
    from graph_python_spark.pipeline.text import quality_by_source

    good = "the quick brown fox jumps over a lazy dog near the old river bank"
    rows = [(1, good, "en", "s0"), (2, "tiny", "en", "s0"),
            (3, good + " extended with several more ordinary words", "de", "s1")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = {(r.lang, r.source): r for r in quality_by_source(df).collect()}
    assert out[("en", "s0")].n_docs == 2 and out[("en", "s0")].n_keep == 1
    assert out[("en", "s0")].keep_rate == 0.5
    assert out[("de", "s1")].keep_rate == 1.0
