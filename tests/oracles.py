"""Independent numpy/networkx oracles (SURVEY §5.2.1) — NO Spark, NO engine
code; pure reimplementations used to validate the engine's results."""

from __future__ import annotations

import numpy as np


def pagerank_numpy(
    edges: list,
    nodes: list,
    damping: float = 0.85,
    max_iter: int = 200,
    tol: float = 1e-12,
    directed: bool = False,
    distribute_sinks: bool = True,
) -> dict:
    """Dense power iteration with the engine's exact semantics:
    r' = (1-d)/n + d*(A^T D^-1 r + sink_mass/n)."""
    idx = {v: i for i, v in enumerate(sorted(nodes))}
    n = len(idx)
    A = np.zeros((n, n))
    for e in edges:
        s, d = e[0], e[1]
        w = e[2] if len(e) > 2 else 1.0
        A[idx[s], idx[d]] = max(A[idx[s], idx[d]], w)
        if not directed:
            A[idx[d], idx[s]] = max(A[idx[d], idx[s]], w)
    out = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        nz = out > 0
        contrib = A[nz].T @ (r[nz] / out[nz])
        sink = r[~nz].sum() if distribute_sinks else 0.0
        new = (1 - damping) / n + damping * (contrib + sink / n)
        if np.abs(new - r).sum() <= tol:
            r = new
            break
        r = new
    return {v: r[i] for v, i in idx.items()}


def components_unionfind(edges: list, nodes: list) -> dict:
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges:
        a, b = find(e[0]), find(e[1])
        if a != b:
            parent[max(a, b)] = min(a, b)
    # canonical: min member id
    roots = {}
    for v in nodes:
        r = find(v)
        roots.setdefault(r, []).append(v)
    out = {}
    for r, members in roots.items():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def triangles_brute(edges: list, nodes: list) -> dict:
    """O(n^3) per-vertex triangle counts on the simple undirected graph."""
    adj = {v: set() for v in nodes}
    for e in edges:
        s, d = e[0], e[1]
        if s == d:
            continue
        adj[s].add(d)
        adj[d].add(s)
    tri = {v: 0 for v in nodes}
    ns = sorted(nodes)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            if b not in adj[a]:
                continue
            for c in ns:
                if c > b and c in adj[a] and c in adj[b]:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    return tri


def modularity_numpy(edges: list, labels: dict) -> float:
    """Matrix-form modularity on the symmetric adjacency (simple graph)."""
    nodes = sorted(labels)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for e in edges:
        s, d = e[0], e[1]
        w = e[2] if len(e) > 2 else 1.0
        A[idx[s], idx[d]] = max(A[idx[s], idx[d]], w)
        A[idx[d], idx[s]] = max(A[idx[d], idx[s]], w)
    two_w = A.sum()
    if two_w == 0:
        return 0.0
    k = A.sum(axis=1)
    q = 0.0
    for i, u in enumerate(nodes):
        for j, v in enumerate(nodes):
            if labels[u] == labels[v]:
                q += A[i, j] - k[i] * k[j] / two_w
    return q / two_w
