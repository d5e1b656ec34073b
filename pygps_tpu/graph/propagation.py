"""Propagation kernel for graph classification (Neumann et al. 2016).

Counterpart of pyGPs ``GraphExtensions/graphKernels.py::propagationKernel``:
label distributions diffuse over each graph's adjacency; at every
iteration node distributions are binned with a locality-sensitive hash
(random projection + random offset, bin width w); per-graph bin-count
vectors are compared by a linear base kernel and accumulated into a
graph×graph Gram matrix.

Written as one vectorised jnp program over the block-diagonal adjacency of
all graphs (node → graph membership via segment sums); hashing uses
``jax.random`` keys instead of global numpy state.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygps_tpu import config


def _row_normalize(A):
    s = jnp.sum(A, axis=1, keepdims=True)
    return A / jnp.maximum(s, 1e-12)


def propagationKernel(A, l, gr_id, h_max: int = 3, w: float = 1e-3,
                      dist: str = "tv", key=None, num_classes=None):
    """Graph×graph propagation-kernel Gram.

    Args:
      A:      (N, N) block-diagonal adjacency over all graphs' nodes.
      l:      (N,) integer node labels (−1 → unlabeled/uniform) or (N, C)
              label distributions.
      gr_id:  (N,) graph membership id in [0, G).
      h_max:  number of propagation iterations (kernel accumulates h_max+1
              rounds including the initial labels).
      w:      LSH bin width.
      dist:   'tv' (total variation — hash P directly) or 'hellinger'
              (hash √P), as in the reference.
      key:    PRNG key for the hash (default 0).

    Returns (G, G) Gram matrix (numpy float64-compatible jnp array).
    """
    A = config.asarray(A)
    gr_id = jnp.asarray(np.asarray(gr_id).astype(np.int32))
    G = int(np.asarray(gr_id).max()) + 1
    N = A.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)

    l_np = np.asarray(l)
    if l_np.ndim == 1:
        C = num_classes or int(l_np[l_np >= 0].max()) + 1
        P0 = np.full((N, C), 1.0 / C)
        labeled = l_np >= 0
        P0[labeled] = 0.0
        P0[labeled, l_np[labeled].astype(int)] = 1.0
        P = jnp.asarray(P0, dtype=A.dtype)
    else:
        P = config.asarray(l_np)
        C = P.shape[1]

    T = _row_normalize(A)
    K = jnp.zeros((G, G), dtype=A.dtype)

    for t in range(h_max + 1):
        key, k_v, k_b = jax.random.split(key, 3)
        feat = jnp.sqrt(jnp.maximum(P, 0.0)) if dist == "hellinger" else P
        v = jax.random.normal(k_v, (C,), dtype=A.dtype)
        b = jax.random.uniform(k_b, dtype=A.dtype) * w
        h = jnp.floor((feat @ v + b) / w).astype(jnp.int32)
        # compact bins: offset to nonnegative then count per (graph, bin)
        h = h - jnp.min(h)
        nbins = int(N)  # ≤ N distinct values; clamp into [0, N)
        h = jnp.clip(h, 0, nbins - 1)
        M = jnp.zeros((G, nbins), dtype=A.dtype).at[gr_id, h].add(1.0)
        K = K + M @ M.T
        P = T @ P

    return K


def propagationKernel_sparse(indptr, indices, data, l, gr_id, h_max: int = 3,
                             w: float = 1e-3, dist: str = "tv", seed: int = 0,
                             num_classes=None):
    """Sparse/native propagation kernel for large graph datasets.

    Same semantics as :func:`propagationKernel` but the adjacency is CSR
    and propagation/binning/Gram accumulation run through the native C++
    runtime (pygps_tpu/native; threaded SpMM + scatter counts), avoiding
    the O(N²) dense adjacency entirely.  Agrees with the dense path when
    fed the same hash draws (pinned by tests).
    """
    from pygps_tpu import native

    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32).copy()
    gr = np.ascontiguousarray(gr_id, dtype=np.int32)
    G = int(gr.max()) + 1
    N = len(indptr) - 1

    l_np = np.asarray(l)
    if l_np.ndim == 1:
        C = num_classes or int(l_np[l_np >= 0].max()) + 1
        P = np.full((N, C), 1.0 / C, dtype=np.float32)
        labeled = l_np >= 0
        P[labeled] = 0.0
        P[labeled, l_np[labeled].astype(int)] = 1.0
    else:
        P = np.ascontiguousarray(l_np, dtype=np.float32)
        C = P.shape[1]

    native.csr_row_normalize(indptr, data)
    key = jax.random.PRNGKey(seed)
    K = np.zeros((G, G), dtype=np.float64)
    for t in range(h_max + 1):
        key, k_v, k_b = jax.random.split(key, 3)
        feat = np.sqrt(np.maximum(P, 0.0)) if dist == "hellinger" else P
        v = np.asarray(jax.random.normal(k_v, (C,)), dtype=np.float64)
        b = float(jax.random.uniform(k_b)) * w
        h = np.floor((feat.astype(np.float64) @ v + b) / w).astype(np.int64)
        h -= h.min()
        nbins = N
        np.clip(h, 0, nbins - 1, out=h)
        M = native.bin_counts(h, gr, G, nbins)
        native.gram_accumulate(M, K)
        P = native.csr_spmm(indptr, indices, data, P)
    return K


def normalizeKernel(K):
    """K̂_ij = K_ij / √(K_ii K_jj) (reference graphKernels.normalizeKernel)."""
    K = config.asarray(K)
    d = jnp.sqrt(jnp.maximum(jnp.diag(K), 1e-12))
    return K / (d[:, None] * d[None, :])
