"""Iterative (matrix-free) exact-GP inference — BBMM/SLQ style.

No reference counterpart (pyGPs' only big-n story is FITC); this is the
modern iterative path from the retrieved literature (GPyTorch "Blackbox
Matrix-Matrix" inference; "Exact GPs on a Million Data Points"):

* quadratic term and posterior solves: preconditioned CG (exact to tol)
* log det: stochastic Lanczos quadrature (unbiased-ish MC estimate)
* gradients: the reference's Q-form identities with the trace estimated
  by Hutchinson probes sharing the CG machinery:
      ∂nlZ/∂θ = ½ E_z[zᵀ K̃⁻¹ (∂K̃/∂θ) z] − ½ αᵀ (∂K̃/∂θ) α
  implemented as a custom VJP whose K-cotangent is the low-rank
  estimator ½(Ẑ K̃⁻¹Ẑᵀ/P − ααᵀ) — only matvecs and (n × P) solves.

Memory: O(n·P); compute: O(n² · cg_iters) per evaluation — runs at n
where the dense Cholesky no longer fits.  For multi-chip, pair with a
row-sharded matvec (the Gram rows from parallel/ring_gram).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from pygps_tpu.utils.cg import cg_solve, slq_logdet

_DEFAULTS = dict(num_probes=16, lanczos_iters=25, cg_tol=1e-6,
                 cg_iters=256)


def _matvec_fn(K, sn2):
    def mv(X):
        return K @ X + sn2 * X
    return mv


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _nlml_core(K, m, sn2, y, seed, num_probes, lanczos_iters, cg_cfg):
    n = y.shape[0]
    mv = _matvec_fn(K, sn2)
    r = y - m
    key = jax.random.PRNGKey(seed)
    alpha, _, _ = cg_solve(mv, r[:, None], tol=cg_cfg[0],
                           max_iters=cg_cfg[1],
                           M_inv_diag=1.0 / (jnp.diag(K) + sn2))
    alpha = alpha[:, 0]
    logdet = slq_logdet(mv, n, key, num_probes=num_probes,
                        lanczos_iters=lanczos_iters, dtype=K.dtype)
    return (0.5 * jnp.dot(r, alpha) + 0.5 * logdet
            + 0.5 * n * jnp.log(2.0 * jnp.pi))


def _nlml_fwd(K, m, sn2, y, seed, num_probes, lanczos_iters, cg_cfg):
    n = y.shape[0]
    mv = _matvec_fn(K, sn2)
    r = y - m
    key = jax.random.PRNGKey(seed)
    Minv = 1.0 / (jnp.diag(K) + sn2)
    alpha, _, _ = cg_solve(mv, r[:, None], tol=cg_cfg[0],
                           max_iters=cg_cfg[1], M_inv_diag=Minv)
    alpha = alpha[:, 0]
    logdet = slq_logdet(mv, n, key, num_probes=num_probes,
                        lanczos_iters=lanczos_iters, dtype=K.dtype)
    nlZ = (0.5 * jnp.dot(r, alpha) + 0.5 * logdet
           + 0.5 * n * jnp.log(2.0 * jnp.pi))
    return nlZ, (K, sn2, alpha, Minv)


def _nlml_bwd(seed, num_probes, lanczos_iters, cg_cfg, res, g):
    K, sn2, alpha, Minv = res
    n = alpha.shape[0]
    mv = _matvec_fn(K, sn2)
    key = jax.random.PRNGKey(seed + 1)
    Z = jax.random.rademacher(key, (n, num_probes), dtype=K.dtype)
    W, _, _ = cg_solve(mv, Z, tol=cg_cfg[0], max_iters=cg_cfg[1],
                       M_inv_diag=Minv)
    # E[K̃⁻¹] estimator: W Zᵀ / P (symmetrized); tr(K̃⁻¹ ∂K̃) = E[zᵀK̃⁻¹ ∂K̃ z]
    Kbar = g * 0.5 * ((W @ Z.T + Z @ W.T) / (2.0 * num_probes)
                      - alpha[:, None] * alpha[None, :])
    trKinv = jnp.sum(W * Z) / num_probes
    sn2_bar = g * 0.5 * (trKinv - jnp.dot(alpha, alpha))
    m_bar = -g * alpha
    y_bar = g * alpha
    return Kbar, m_bar, sn2_bar, y_bar


_nlml_core.defvjp(_nlml_fwd, _nlml_bwd)


def nlml(mean, kernel, lik, x, y, seed=0, num_probes=16, lanczos_iters=25,
         cg_tol=1e-6, cg_iters=256):
    """Matrix-free exact-GP NLML (stochastic logdet/trace, exact solves)."""
    K = kernel.Ktrain(x)
    m = mean(x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    return _nlml_core(K, m, sn2, y, seed, num_probes, lanczos_iters,
                      (cg_tol, cg_iters))


def posterior_solve(mean, kernel, lik, x, y, cg_tol=1e-8, cg_iters=512):
    """alpha = K̃⁻¹(y − m) by CG (exact posterior mean path)."""
    K = kernel.Ktrain(x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    r = y - mean(x)
    alpha, it, res = cg_solve(_matvec_fn(K, sn2), r[:, None], tol=cg_tol,
                              max_iters=cg_iters,
                              M_inv_diag=1.0 / (jnp.diag(K) + sn2))
    return alpha[:, 0], it, res
