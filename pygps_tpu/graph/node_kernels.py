"""Node-level kernels from the graph Laplacian.

Counterpart of pyGPs ``GraphExtensions/nodeKernels.py``: diffusion, von
Neumann, p-step random walk, regularized Laplacian, pseudo-inverse
Laplacian kernels.  Spectral forms via a single symmetric eigendecomposition
(eigh lowers to TPU-friendly dense linalg); all return dense (N, N) PSD
matrices ready for ``cov.Pre``.
"""

from __future__ import annotations

import jax.numpy as jnp

from pygps_tpu import config


def _laplacian(A):
    A = config.asarray(A)
    d = jnp.sum(A, axis=1)
    return jnp.diag(d) - A


def diffKernel(A, beta: float = 1.0):
    """Diffusion kernel K = exp(−β L) (reference nodeKernels.diffKernel)."""
    L = _laplacian(A)
    w, V = jnp.linalg.eigh(L)
    return (V * jnp.exp(-beta * w)[None, :]) @ V.T


def vnKernel(A, alpha: float = 0.9):
    """Von Neumann kernel K = (I − α·A/ρ)⁻¹ with ρ the spectral radius
    (reference nodeKernels.vnKernel)."""
    A = config.asarray(A)
    n = A.shape[0]
    w = jnp.linalg.eigvalsh(A)
    rho = jnp.maximum(jnp.abs(w[0]), jnp.abs(w[-1]))
    return jnp.linalg.inv(jnp.eye(n, dtype=A.dtype) - alpha * A / rho)


def rwKernel(A, p: int = 2, a: float = 2.0):
    """p-step random-walk kernel K = (a·I − L̃)^p with L̃ the normalized
    Laplacian, a ≥ 2 (reference nodeKernels.rwKernel)."""
    A = config.asarray(A)
    d = jnp.sum(A, axis=1)
    dis = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-12))
    Ln = jnp.eye(A.shape[0], dtype=A.dtype) - (dis[:, None] * A) * dis[None, :]
    M = a * jnp.eye(A.shape[0], dtype=A.dtype) - Ln
    w, V = jnp.linalg.eigh(M)
    return (V * jnp.power(w, p)[None, :]) @ V.T


def regLapKernel(A, sigma: float = 1.0):
    """Regularized Laplacian K = (I + σ²·L)⁻¹
    (reference nodeKernels.regLapKernel)."""
    L = _laplacian(A)
    n = L.shape[0]
    return jnp.linalg.inv(jnp.eye(n, dtype=L.dtype) + sigma**2 * L)


def psInvLapKernel(A):
    """Pseudo-inverse of the Laplacian
    (reference nodeKernels.psInvLapKernel)."""
    L = _laplacian(A)
    return jnp.linalg.pinv(L)
