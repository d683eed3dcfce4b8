"""NumPy oracle implementations of the graph algorithms.

Semantics track the reference notebooks exactly:
  * pagerank_3f  — ``notebooks/Pagerank Demo.ipynb`` cell 9 (LAGraph 3f):
    dense r, w = t ⊘ (d_out/damping) on the INTERSECTION (dangling vertices
    contribute nothing — teleport only), r = teleport + Aᵀw via plus_second.
  * fastsv_components — min-label fixpoint (``Connected Components --
    FastSV.ipynb``): labels are the minimum vertex id in each component.
  * label_propagation — synchronous argmax-of-neighbor-labels, deterministic
    tie-break = smallest label (BASELINE.md).
  * triangle_count — sum((L@L) * L) on the i<j-canonicalized undirected graph.
  * bfs_levels / bfs_parents / sssp — standard frontier semantics
    (``Example B.1/B.3``, SSSP notebook).
"""

from __future__ import annotations

import numpy as np


def pagerank_3f(edges, n, damping=0.85, itermax=100, tol=1e-4):
    """edges: iterable of (src, dst); binary graph. Returns (scores, iters)."""
    A = np.zeros((n, n), dtype=bool)
    for s, d in edges:
        A[s, d] = True
    d_out = A.sum(axis=1).astype(float)  # reduce_rowwise(plus) on binarized A
    has_out = d_out > 0
    d = np.where(has_out, d_out / damping, np.nan)

    teleport = (1 - damping) / n
    r = np.full(n, 1.0 / n)
    rdiff = 1.0
    iters = 0
    for _ in range(itermax):
        if rdiff <= tol:
            break
        t = r
        # w = t ./ d on intersection (only vertices with out-edges)
        w = np.where(has_out, t / d, 0.0)
        # r = teleport + A'w  (plus_second semiring: sum of w over in-neighbors)
        r = teleport + A.T.astype(float) @ w
        rdiff = np.abs(t - r).sum()
        iters += 1
    return r, iters


def fastsv_components(edges, n):
    """Connected components, min-label convention; undirected closure."""
    f = np.arange(n)
    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
        adj[d].append(s)
    changed = True
    while changed:
        changed = False
        # hook: every vertex adopts min(own, neighbors' labels)
        nf = f.copy()
        for v in range(n):
            for u in adj[v]:
                if f[u] < nf[v]:
                    nf[v] = f[u]
        # pointer jumping / shortcut: f = f[f]
        nf = np.minimum(nf, nf[nf])
        if not np.array_equal(nf, f):
            changed = True
        f = nf
    return f


def label_propagation(edges, n, max_sweeps=100):
    """Synchronous LPA: label[v] <- most frequent neighbor label, smallest
    label wins ties; vertices with no neighbors keep their own label."""
    labels = np.arange(n)
    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
        adj[d].append(s)
    for _ in range(max_sweeps):
        new = labels.copy()
        for v in range(n):
            if not adj[v]:
                continue
            counts = {}
            for u in adj[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = min(counts, key=lambda l: (-counts[l], l))
            new[v] = best
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangle_count(edges, n):
    """Exact triangles on the undirected simple graph: sum((L@L)*L), L = i<j."""
    L = np.zeros((n, n), dtype=np.int64)
    for s, d in edges:
        a, b = min(s, d), max(s, d)
        if a != b:
            L[a, b] = 1
    # wedges a<b<c closed by (a,c)
    return int(((L @ L) * L).sum())


def bfs_levels(edges, n, source):
    """Level BFS on the directed graph; level[source]=0; unreachable absent."""
    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
    level = {source: 0}
    frontier = [source]
    depth = 0
    while frontier:
        depth += 1
        nxt = []
        for v in frontier:
            for u in adj[v]:
                if u not in level:
                    level[u] = depth
                    nxt.append(u)
        frontier = nxt
    return level


def bfs_parents(edges, n, source):
    """Parent BFS (min_first: smallest-id parent wins); parent[source]=source."""
    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
    parent = {source: source}
    frontier = [source]
    while frontier:
        cand = {}
        for v in frontier:
            for u in adj[v]:
                if u not in parent:
                    cand[u] = min(cand.get(u, v), v)
        for u, p in cand.items():
            parent[u] = p
        frontier = sorted(cand)
    return parent


def sssp(edges_w, n, source):
    """Min-plus SSSP to fixpoint; distances for reachable vertices only."""
    dist = {source: 0.0}
    changed = True
    while changed:
        changed = False
        for s, d, w in edges_w:
            if s in dist:
                nd = dist[s] + w
                if nd < dist.get(d, np.inf):
                    dist[d] = nd
                    changed = True
    return dist


def hits_l1(edges, n, iterations=8):
    """HITS, L1-normalized at the end (identical direction to per-round L1
    normalization — non-negative iterates).  h0 = 1 everywhere.
    Returns (hub, auth) dense arrays summing to 1 each."""
    A = np.zeros((n, n), dtype=float)
    for s, d in edges:
        A[s, d] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iterations):
        a = A.T @ h
        h = A @ a
    return h / h.sum(), a / a.sum()


def ppr_fixed(edges, n, seeds, iterations=6, damping=0.85):
    """Personalized PageRank, fixed iterations, pagerank_3f dangling
    convention (dangling mass is dropped, not redistributed).  r0 = p.
    Returns the dense score vector (zero outside the K-hop seed hull)."""
    A = np.zeros((n, n), dtype=float)
    for s, d in edges:
        A[s, d] = 1.0
    d_out = A.sum(axis=1)
    has_out = d_out > 0
    p = np.zeros(n)
    for s in seeds:
        p[s] = 1.0 / len(seeds)
    r = p.copy()
    for _ in range(iterations):
        w = np.where(has_out, r / np.where(has_out, d_out, 1.0), 0.0)
        r = (1 - damping) * p + damping * (A.T @ w)
    return r


def kcore_peel(edges, n, k):
    """Iterative peeling to the k-core of the undirected simple graph.
    Returns dict {vertex: degree inside the k-core}."""
    nbrs = {v: set() for v in range(n)}
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    alive = {v for v in range(n) if len(nbrs[v]) >= k}
    changed = True
    while changed:
        deg = {v: sum(1 for u in nbrs[v] if u in alive) for v in alive}
        new_alive = {v for v in alive if deg[v] >= k}
        changed = new_alive != alive
        alive = new_alive
    return {v: sum(1 for u in nbrs[v] if u in alive) for v in alive}


def jaccard_neighbors(edges, n, min_sim=0.0):
    """Neighborhood Jaccard over the undirected simple graph: dict
    {(u, v): (common, sim)} for u < v with common >= 1, sim >= min_sim."""
    nbrs = {v: set() for v in range(n)}
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    out = {}
    for w in range(n):
        ns = sorted(nbrs[w])
        for ai in range(len(ns)):
            for bi in range(ai + 1, len(ns)):
                u, v = ns[ai], ns[bi]
                out[(u, v)] = out.get((u, v), 0) + 1
    res = {}
    for (u, v), common in out.items():
        sim = common / (len(nbrs[u]) + len(nbrs[v]) - common)
        if sim >= min_sim:
            res[(u, v)] = (common, sim)
    return res


def ktruss_peel(edges, n, k):
    """Iterative peeling to the k-truss: repeatedly drop every canonical
    a < b edge whose support (common neighbors of a and b in the current
    subgraph) is < k-2.  Returns dict {(a, b): support in the truss}."""
    cur = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        nbrs = {}
        for a, b in cur:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        sup = {e: len(nbrs[e[0]] & nbrs[e[1]]) for e in cur}
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return {e: sup[e] for e in cur}
        cur = nxt


def clustering_coeffs(edges, n):
    """Local clustering coefficient per vertex of the undirected simple
    graph.  Returns dict {v: (degree, triangles, coeff)} for vertices with
    degree >= 1."""
    nbrs = {}
    for a, b in edges:
        if a != b:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    out = {}
    for v, ns in nbrs.items():
        d = len(ns)
        t = sum(len(nbrs[u] & ns) for u in ns) // 2
        coeff = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
        out[v] = (d, t, coeff)
    return out


def betweenness_sources(edges, n, sources, max_levels=8):
    """Brandes dependency accumulation from the given sources (directed,
    unweighted, BFS capped at max_levels).  Returns dict {v: bc} over every
    vertex reached at level >= 1 from any source."""
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
    bc = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for d in range(max_levels):
            nxt = {}
            for v in levels[-1]:
                for w in adj.get(v, ()):
                    if w in dist and dist[w] <= d:
                        continue
                    nxt[w] = nxt.get(w, 0) + sigma[v]
            if not nxt:
                break
            for w, sg in nxt.items():
                dist[w] = d + 1
                sigma[w] = sg
            levels.append(sorted(nxt))
        delta = {v: 0.0 for v in dist}
        for d in range(len(levels) - 2, -1, -1):
            for v in levels[d]:
                for w in adj.get(v, ()):
                    if dist.get(w) == d + 1:
                        delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        for v, dl in delta.items():
            if dist[v] >= 1:
                bc[v] = bc.get(v, 0.0) + dl
    return bc


def luby_mis(edges, n, max_rounds=30):
    """Deterministic-Luby MIS replay: priority (v*2654435761) mod
    1000000007, winners beat all active neighbors, winners+neighborhoods
    retire each round; isolated actives auto-join.  Returns (set, rounds)."""
    C, P = 2654435761, 1000000007
    pr = lambda v: (v * C) % P
    nbrs = {}
    for a, b in edges:
        if a != b:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    active = set(nbrs)
    mis = set()
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        live = {v: {u for u in nbrs[v] if u in active} for v in active}
        if not any(live.values()):
            mis |= active
            break
        winners = {v for v, ns in live.items()
                   if ns and all(pr(v) < pr(u) for u in ns)}
        isolated = {v for v, ns in live.items() if not ns}
        mis |= winners | isolated
        gone = winners | {u for v in winners for u in live[v]} | isolated
        active -= gone
        if not active:
            break
    return mis, rounds


def scc_labels(edges, n):
    """SCC via iterative Tarjan; label = min vertex id in the component.
    Returns dict {v: label} for every vertex appearing in edges."""
    adj = {}
    verts = set()
    for a, b in edges:
        verts.add(a)
        verts.add(b)
        if a != b:
            adj.setdefault(a, []).append(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]
    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                lbl = min(comp)
                for w in comp:
                    out[w] = lbl
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out
