"""Dense numpy oracles for the spectral kernels (scipy is not installed,
so networkx's own pagerank/hits are unavailable).

The math mirrors the reference's comparison baseline
``/root/reference/scripts/scipy_impl.py:7-54`` (power iteration
``x = alpha*(x@S + danglemass*dangling_w) + (1-alpha)*p``, L1 stop
``err < n*tol``) and ``algorithms/link_analysis/hits_alg.py:9-62``.
Dense matrices — test sizes only.
"""

from __future__ import annotations

import networkx as nx
import numpy as np


def _adj(nxg, nodelist, weight="weight"):
    return nx.to_numpy_array(nxg, nodelist=nodelist, weight=weight)


def pagerank_oracle(
    nxg,
    alpha=0.85,
    personalization=None,
    max_iter=100,
    tol=1e-6,
    nstart=None,
    dangling=None,
    fixed_iters=None,
):
    nodes = list(nxg.nodes())
    n = len(nodes)
    if n == 0:
        return {}
    idx = {u: i for i, u in enumerate(nodes)}
    A = _adj(nxg, nodes)
    rowsum = A.sum(axis=1)
    S = np.divide(A, rowsum[:, None], out=np.zeros_like(A), where=rowsum[:, None] > 0)

    if nstart is None:
        x = np.full(n, 1.0 / n)
    else:
        x = np.array([nstart.get(u, 0.0) for u in nodes], dtype=float)
        x = x / x.sum()
    if personalization is None:
        p = np.full(n, 1.0 / n)
    else:
        p = np.array([personalization.get(u, 0.0) for u in nodes], dtype=float)
        p = p / p.sum()
    if dangling is None:
        dw = p
    else:
        dw = np.array([dangling.get(u, 0.0) for u in nodes], dtype=float)
        dw = dw / dw.sum()
    is_dangling = rowsum == 0

    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        xlast = x
        x = alpha * (xlast @ S + xlast[is_dangling].sum() * dw) + (1 - alpha) * p
        if fixed_iters is None and np.abs(x - xlast).sum() < n * tol:
            break
    return {u: x[idx[u]] for u in nodes}


def hits_oracle(nxg, max_iter=100, tol=1e-8, normalized=True):
    """Reference hits_alg.py:9-62: h <- A@a, a <- h@A, L-inf normalize each
    iteration; final L1 normalization when normalized=True."""
    nodes = list(nxg.nodes())
    n = len(nodes)
    A = _adj(nxg, nodes)
    h = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        hlast = h
        a = hlast @ A
        amax = a.max()
        if amax != 0:
            a = a / amax
        h = A @ a
        hmax = h.max()
        if hmax != 0:
            h = h / hmax
        if np.abs(h - hlast).sum() < tol * n:
            break
    if normalized:
        if h.sum() != 0:
            h = h / h.sum()
        if a.sum() != 0:
            a = a / a.sum()
    return (
        {u: h[i] for i, u in enumerate(nodes)},
        {u: a[i] for i, u in enumerate(nodes)},
    )


def katz_oracle(nxg, alpha=0.1, beta=1.0, max_iter=1000, tol=1e-6, normalized=True):
    """Reference centrality/katz.py:11-55: x <- alpha*(x@A) + beta."""
    nodes = list(nxg.nodes())
    n = len(nodes)
    A = _adj(nxg, nodes)
    x = np.zeros(n)
    b = np.full(n, float(beta))
    for _ in range(max_iter):
        xlast = x
        x = alpha * (xlast @ A) + b
        if np.abs(x - xlast).sum() < n * tol:
            if normalized:
                norm = np.sqrt((x * x).sum())
                if norm != 0:
                    x = x / norm
            return {u: x[i] for i, u in enumerate(nodes)}
    raise RuntimeError("katz oracle did not converge")


def eigenvector_oracle(nxg, max_iter=100, tol=1e-6, nstart=None):
    """Reference centrality/eigenvector.py:9-33: x <- x + x@A, L2 normalize,
    L1 convergence err < n*tol."""
    nodes = list(nxg.nodes())
    n = len(nodes)
    A = _adj(nxg, nodes)
    if nstart is None:
        x = np.full(n, 1.0 / n)
    else:
        x = np.array([nstart.get(u, 0.0) for u in nodes], dtype=float)
    for _ in range(max_iter):
        xlast = x
        x = xlast + xlast @ A
        norm = np.sqrt((x * x).sum()) or 1.0
        x = x / norm
        if np.abs(x - xlast).sum() < n * tol:
            return {u: x[i] for i, u in enumerate(nodes)}
    raise RuntimeError("eigenvector oracle did not converge")
