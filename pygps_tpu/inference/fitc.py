"""FITC sparse-GP inference (Exact / Laplace / EP).

TPU-native counterpart of pyGPs ``inf.FITC_Exact`` (inf.py:~750-900),
``inf.FITC_Laplace`` (:~900-1150) and ``inf.FITC_EP`` (:~1150-1400).

FITC prior: K̂ = Qff + diag(diagKff − qff) with Qff = Kfu Kuu⁻¹ Kuf and
jitter snu2 = 1e-6·sn2 on Kuu (the reference's rule,
config.FITC_JITTER_REL).

* ``exact_*`` — the full O(n·m²) Woodbury regression path (derivation in
  :func:`exact_evaluate`); gradients via jax.grad (all ops
  differentiable).  The posterior lives on the inducing points with a
  **non-triangular** L = −(Kuu'⁻¹ − A⁻¹), exercising the reference's
  second predict formula (gp.py:~290-320; SURVEY.md §2.4).
* ``laplace_*`` / ``ep_*`` — thin re-exports of the structured O(n·m²)
  engines in laplace.py / ep.py (single generic engine over the
  prior-operator interface, inference/priors.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from pygps_tpu import config
from pygps_tpu.core.posteriors import Posterior
from pygps_tpu.inference import ep as _ep
from pygps_tpu.inference import laplace as _laplace
from pygps_tpu.utils.tools import safe_cholesky, solve_tril, solve_tril_T


def _fitc_parts(kernel, lik_sn2, x):
    """(diagKff, Luu, V) with Kuu' = Kuu + snu2·I = Luu Luuᵀ and
    V = Luu⁻¹ Kuf, so Qff = VᵀV."""
    diagKff, Kuu, Kuf = kernel.fitc_train(x)
    m = Kuu.shape[0]
    snu2 = config.FITC_JITTER_REL * lik_sn2
    Luu, _ = safe_cholesky(Kuu + snu2 * jnp.eye(m, dtype=Kuu.dtype))
    V = solve_tril(Luu, Kuf)
    return diagKff, Luu, V


def exact_evaluate(mean, kernel, lik, x, y):
    """FITC regression: (Posterior over inducing values, nlZ).

    Derivation (Woodbury / matrix-determinant lemma), Λ = diag(g) with
    g = diagKff − qff + sn2:
      A        = Kuu' + Kuf Λ⁻¹ Kfu = Luu (I + Vs Vsᵀ) Luuᵀ,  Vs = V/√g
      alpha_u  = A⁻¹ Kuf Λ⁻¹ (y−m) = Luu⁻ᵀ Lu⁻ᵀ be,  be = Lu⁻¹ Vs ys
      log det(Qff+Λ) = 2Σ log diag Lu + Σ log g
      (y−m)ᵀ(Qff+Λ)⁻¹(y−m) = ysᵀys − beᵀbe,   ys = (y−m)/√g
      f*-var   = k** − K*u (Kuu'⁻¹ − A⁻¹) Ku*
    """
    n = x.shape[0]
    m_mean = mean(x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    diagKff, Luu, V = _fitc_parts(kernel, sn2, x)
    g = diagKff - jnp.sum(V * V, axis=0) + sn2
    sg = jnp.sqrt(g)
    Vs = V / sg[None, :]
    nu = V.shape[0]
    Lu, _ = safe_cholesky(jnp.eye(nu, dtype=x.dtype) + Vs @ Vs.T)
    ys = (y - m_mean) / sg
    be = solve_tril(Lu, Vs @ ys)
    nlZ = (jnp.sum(jnp.log(jnp.diag(Lu)))
           + 0.5 * (jnp.sum(jnp.log(g)) + jnp.dot(ys, ys) - jnp.dot(be, be)
                    + n * jnp.log(2.0 * jnp.pi)))
    alpha = solve_tril_T(Luu, solve_tril_T(Lu, be))
    # L_post = −(Kuu'⁻¹ − A⁻¹): fs2 = kss + Σ(Ks ∘ (L Ks)) (non-tril branch)
    iLuu = solve_tril(Luu, jnp.eye(nu, dtype=x.dtype))
    M = solve_tril(Lu, iLuu)                 # Lu⁻¹ Luu⁻¹
    Lpost = -(iLuu.T @ iLuu - M.T @ M)
    sW = jnp.ones(nu, dtype=x.dtype)
    return Posterior(alpha=alpha, sW=sW, L=Lpost, is_tril=False), nlZ


def exact_nlml(mean, kernel, lik, x, y):
    return exact_evaluate(mean, kernel, lik, x, y)[1]


# Structured O(n·m²) classification engines (shared generic implementation)
laplace_evaluate = _laplace.fitc_evaluate
laplace_nlml = _laplace.fitc_nlml
ep_evaluate = _ep.fitc_evaluate
ep_nlml = _ep.fitc_nlml
