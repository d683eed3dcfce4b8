"""Differential test for product-quantization codes vs a dense NumPy
replica of the kmeans_fixed determinism contract (md5-ordered init, argmin
pp - 2*pc + cc with (d2, cid) tie-break, quantized-integer centroid
means), run independently per subspace."""

import hashlib

import numpy as np

from graph_python_spark.pipeline.similarity import KMEANS_SCALE, pq_codes


def _q(x):
    # ROUND-half-away-from-zero to match Spark's F.round on doubles
    return np.int64(np.floor(x * KMEANS_SCALE + 0.5)) if x >= 0 \
        else np.int64(np.ceil(x * KMEANS_SCALE - 0.5))


def _pq_numpy(X, m, k, iters):
    """Returns (assignments {(i, sub): (d2, cid)}, codebooks {sub: {cid: c}})
    — codebooks are the TRAINED centroids (after ``iters`` updates), the
    ones the final assignment and ADC both score against."""
    n, dim = X.shape
    L = dim // m
    order = sorted(range(n),
                   key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    out = {}
    books = {}
    for sub in range(m):
        P = X[:, sub * L:(sub + 1) * L].astype(np.float64)
        C = {cid: P[order[cid]].copy() for cid in range(k)}
        asg = {}
        for it in range(iters + 1):
            asg = {}
            for i in range(n):
                best = (np.inf, -1)
                pp = P[i] @ P[i]
                for cid in sorted(C):
                    c = C[cid]
                    d2 = pp - 2 * (P[i] @ c) + c @ c
                    if d2 < best[0] or (d2 == best[0] and cid < best[1]):
                        best = (d2, cid)
                asg[i] = best
            if it == iters:
                break
            newC = {}
            for cid in {b[1] for b in asg.values()}:
                members = [i for i in asg if asg[i][1] == cid]
                s = np.zeros(L, dtype=np.int64)
                for i in members:
                    s += np.array([_q(x) for x in P[i]])
                newC[cid] = s.astype(np.float64) / (len(members) * KMEANS_SCALE)
            C = newC
        books[sub] = C
        for i in range(n):
            out[(i, sub)] = asg[i]
    return out, books


def test_pq_codes_vs_numpy(spark):
    rng = np.random.RandomState(7)
    N, DIM, M, K, IT = 150, 16, 4, 8, 2
    X = np.round(rng.uniform(-1, 1, (N, DIM)), 3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>")
    got = {(r.vec_id, r.sub): (r.code, r.dist2)
           for r in pq_codes(emb, dim=DIM, m=M, k=K, iterations=IT).collect()}
    exp, _books = _pq_numpy(X, M, K, IT)
    assert len(got) == N * M
    for key, (code, dist2) in got.items():
        d2, cid = exp[key]
        assert code == cid, key
        assert np.isclose(dist2, round(d2, 6), atol=1e-9), key


def test_pq_reconstruction_improves_with_k(spark):
    rng = np.random.RandomState(8)
    N, DIM = 120, 8
    X = np.round(rng.uniform(-1, 1, (N, DIM)), 3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>")
    errs = {}
    for k in (2, 8):
        df = pq_codes(emb, dim=DIM, m=2, k=k, iterations=2)
        errs[k] = df.groupBy().sum("dist2").collect()[0][0]
    assert errs[8] < errs[2]  # richer codebook -> lower quantization error


def test_pq_adc_topk_vs_numpy(spark):
    rng = np.random.RandomState(9)
    N, DIM, M, K, IT, TOPK = 120, 16, 4, 8, 2, 5
    X = np.round(rng.uniform(-1, 1, (N, DIM)), 3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>")
    queries = [0, 7, 33]
    from graph_python_spark.pipeline.similarity import pq_adc_topk
    got = {}
    for r in pq_adc_topk(emb, queries, dim=DIM, k=TOPK, m=M,
                         codebook_k=K, iterations=IT).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.adist2))
    exp_assign, books = _pq_numpy(X, M, K, IT)
    L = DIM // M
    for q in queries:
        scores = []
        for i in range(N):
            if i == q:
                continue
            ad = 0.0
            for sub in range(M):
                qv = X[q, sub * L:(sub + 1) * L].astype(np.float64)
                c = books[sub][exp_assign[(i, sub)][1]]
                ad += qv @ qv - 2 * (qv @ c) + c @ c
            scores.append((round(ad, 6), i))
        scores.sort()
        exp = [(r + 1, i, d) for r, (d, i) in enumerate(scores[:TOPK])]
        assert sorted(got[q]) == exp, q
