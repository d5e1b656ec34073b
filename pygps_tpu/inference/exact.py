"""Exact Gaussian-process inference (Gaussian likelihood).

TPU-native counterpart of pyGPs ``inf.Exact`` (inf.py:~100-200).  The
reference's math is kept exactly (§2.4 of SURVEY.md):

    sn2   = exp(2·lik.log_sigma)
    B     = K/sn2 + I,   L = chol(B)           (lower here)
    alpha = B⁻¹ (y − m) / sn2
    nlZ   = (y−m)ᵀα/2 + Σ log diag L + (n/2)·log(2π·sn2)

but the entire hand-derived gradient block (Q = B⁻¹/sn2 − ααᵀ, per-hyp
trace products) is deleted: ``dnlZ`` is ``jax.grad`` of :func:`nlml` over
the (mean, kernel, lik) pytree.  Everything here is jit-compatible; the
O(n³) Cholesky is XLA's (or, for the distributed path, the block Cholesky
in parallel/pcholesky.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygps_tpu import config
from pygps_tpu.core.posteriors import Posterior
from pygps_tpu.ops.trtri import inv_from_chol
from pygps_tpu.utils.tools import safe_cholesky, solve_chol


def _common(mean, kernel, lik, x, y):
    n = x.shape[0]
    # pinned-diag raw Gram: skips _train's symmetrize pass (~9 ms of a
    # 46 ms eval at n=8192 incl. its VJP transpose; asymmetry is f32-eps
    # level — see Kernel.Ktrain_pinned)
    K = kernel.Ktrain_pinned(x)
    m = mean(x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    B = K / sn2 + jnp.eye(n, dtype=x.dtype)
    L, _ = safe_cholesky(B)
    r = y - m
    alpha = solve_chol(L, r) / sn2
    nlZ = (0.5 * jnp.dot(r, alpha)
           + jnp.sum(jnp.log(jnp.diag(L)))
           + 0.5 * n * jnp.log(2.0 * jnp.pi * sn2))
    return L, alpha, sn2, nlZ


def posterior(mean, kernel, lik, x, y) -> Posterior:
    L, alpha, sn2, _ = _common(mean, kernel, lik, x, y)
    sW = jnp.full(x.shape[0], 1.0, dtype=x.dtype) / jnp.sqrt(sn2)
    return Posterior(alpha=alpha, sW=sW, L=L, is_tril=True)


@jax.custom_vjp
def _nlml_core(K, m, sn2, y):
    """NLML as a function of the assembled (K, m, sn2, y).

    Reverse mode uses the reference's analytic gradient identities
    (inf.py:~180: Q = K̃⁻¹ − ααᵀ; ∂nlZ/∂K = Q/2, ∂/∂m = −α,
    ∂/∂sn2 = tr(Q)/2, ∂/∂y = α) instead of differentiating through the
    Cholesky — one triangular-solve pair replaces the chol-VJP's
    solve+matmul chain (~1.3× faster NLML+grad at n=8k, MEASUREMENTS.md)."""
    n = y.shape[0]
    B = K / sn2 + jnp.eye(n, dtype=K.dtype)
    L, _ = safe_cholesky(B)
    r = y - m
    alpha = solve_chol(L, r) / sn2
    return (0.5 * jnp.dot(r, alpha)
            + jnp.sum(jnp.log(jnp.diag(L)))
            + 0.5 * n * jnp.log(2.0 * jnp.pi * sn2))


def _nlml_core_fwd(K, m, sn2, y):
    n = y.shape[0]
    B = K / sn2 + jnp.eye(n, dtype=K.dtype)
    L, _ = safe_cholesky(B)
    r = y - m
    alpha = solve_chol(L, r) / sn2
    nlZ = (0.5 * jnp.dot(r, alpha)
           + jnp.sum(jnp.log(jnp.diag(L)))
           + 0.5 * n * jnp.log(2.0 * jnp.pi * sn2))
    return nlZ, (L, alpha, sn2)


def _nlml_core_bwd(res, g):
    L, alpha, sn2 = res
    n = alpha.shape[0]
    if config.GEMM_INVERSE:
        # blocked W = L⁻¹ then WᵀW: all-GEMM, rides the MXU instead of the
        # ~7 TF/s TRSM unit (ops/trtri.py; toggle config.use_gemm_inverse).
        # GEMMs run at EXACT_BWD_PRECISION ("high" default — gradient-
        # gated vs f64, probe_bwd_precision.py) rather than the global
        # "highest" pin; no-op under CPU/f64 parity.
        Kinv = inv_from_chol(
            L, precision=config.EXACT_BWD_PRECISION) / sn2  # K̃⁻¹
    else:
        Kinv = solve_chol(L, jnp.eye(n, dtype=L.dtype)) / sn2   # K̃⁻¹
    Q = Kinv - alpha[:, None] * alpha[None, :]
    return (g * 0.5 * Q, -g * alpha, g * 0.5 * jnp.trace(Q), g * alpha)


_nlml_core.defvjp(_nlml_core_fwd, _nlml_core_bwd)


def nlml(mean, kernel, lik, x, y) -> jax.Array:
    """Negative log marginal likelihood — differentiable in all
    hyperparameters via the functor pytrees (analytic VJP inside;
    pinned-diag raw Gram, see Kernel.Ktrain_pinned)."""
    K = kernel.Ktrain_pinned(x)
    m = mean(x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    return _nlml_core(K, m, sn2, y)


def evaluate(mean, kernel, lik, x, y):
    """(Posterior, nlZ) in one pass — the engine entry point."""
    L, alpha, sn2, nlZ = _common(mean, kernel, lik, x, y)
    sW = jnp.full(x.shape[0], 1.0, dtype=x.dtype) / jnp.sqrt(sn2)
    return Posterior(alpha=alpha, sW=sW, L=L, is_tril=True), nlZ
