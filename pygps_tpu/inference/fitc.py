"""FITC sparse-GP inference (Exact / Laplace / EP).

TPU-native counterpart of pyGPs ``inf.FITC_Exact`` (inf.py:~750-900),
``inf.FITC_Laplace`` (:~900-1150) and ``inf.FITC_EP`` (:~1150-1400).

FITC prior: K̂ = Qff + diag(diagKff − qff) with Qff = Kfuu Kuu⁻¹ Kuf and
jitter snu2 = 1e-6·sn2 on Kuu (the reference's rule, config.FITC_JITTER_REL).

* ``FITC_Exact`` is the full O(n·m²) Woodbury path (derivation in
  :func:`exact_evaluate`); gradients via jax.grad (all ops differentiable).
  The posterior lives on the inducing points with a **non-triangular** L =
  −(Kuu'⁻¹ − A⁻¹), exercising the reference's second predict formula
  (gp.py:~290-320; SURVEY.md §2.4).
* ``FITC_Laplace`` / ``FITC_EP`` currently materialise the FITC prior as a
  dense n×n matrix and reuse the standard Laplace/parallel-EP engines —
  semantically identical to the reference's O(n·m²) specialisations but
  O(n³); the Woodbury-structured versions are a planned optimisation.
  Their posteriors are converted to inducing-point form for O(m) predict.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygps_tpu import config
from pygps_tpu.core.posteriors import Posterior
from pygps_tpu.inference import ep as _ep
from pygps_tpu.inference import laplace as _laplace
from pygps_tpu.utils.tools import (safe_cholesky, solve_chol, solve_tril,
                                   solve_tril_T)


def _fitc_parts(kernel, lik_sn2, x):
    """(diagKff, Luu, V, u) with Kuu' = Kuu + snu2·I = Luu Luuᵀ and
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
    # A⁻¹ = Luu⁻ᵀ Lu⁻ᵀ Lu⁻¹ Luu⁻¹ via triangular solves
    iLuu = solve_tril(Luu, jnp.eye(nu, dtype=x.dtype))
    M = solve_tril(Lu, iLuu)                 # Lu⁻¹ Luu⁻¹
    iA = M.T @ M
    iKuu = iLuu.T @ iLuu
    Lpost = -(iKuu - iA)
    sW = jnp.ones(nu, dtype=x.dtype)
    return Posterior(alpha=alpha, sW=sW, L=Lpost, is_tril=False), nlZ


def exact_nlml(mean, kernel, lik, x, y):
    return exact_evaluate(mean, kernel, lik, x, y)[1]


# ---------------------------------------------------------------------------
# Dense FITC prior fallback for Laplace / EP
# ---------------------------------------------------------------------------


from pygps_tpu.core.functor import Functor, register


@register
class _FITCPriorKernel(Functor):
    """Adapter presenting the FITC prior K̂ as a dense kernel to the
    standard Laplace/EP engines (duck-types Ktrain only). Registered as a
    pytree so it can flow through jit/grad/stop_gradient."""

    _hyp_fields = ("kernel", "sn2")

    def __init__(self, kernel, sn2_for_jitter):
        self.kernel = kernel
        self.sn2 = sn2_for_jitter

    def Ktrain(self, x):
        diagKff, Luu, V = _fitc_parts(self.kernel, self.sn2, x)
        Q = V.T @ V
        return Q + jnp.diag(jnp.maximum(diagKff - jnp.diag(Q), 0.0))


def _to_inducing_posterior(kernel, lik, x, post_f, fhat_ctx):
    """Convert a posterior over f (alpha_f, sW, L_f tril over n) into the
    inducing-point representation used by FITC predict.

    With site precision W = sW² and site targets encoded by alpha_f
    (μ_post = K̂ alpha_f + m), the inducing-value posterior under the FITC
    model has:
      mean coeffs  alpha_u = A⁻¹ Kuf Λ⁻¹ Λ (…) — equivalently obtained from
      the Gaussian pseudo-observations implied by (alpha_f, W).
    We use the pseudo-data route: the non-Gaussian posterior
    q(f) = N(K̂ α + m, (K̂⁻¹+W)⁻¹) equals the exact posterior of a Gaussian
    model with heteroscedastic noise 1/W and targets
    ŷ = m + K̂α + W⁻¹α  (standard Laplace/EP ↔ pseudo-Gauss equivalence).
    """
    diagKff, Luu, V = _fitc_parts(kernel, fhat_ctx["sn2_jitter"], x)
    W = post_f.sW ** 2
    alpha_f = post_f.alpha
    Khat_alpha = fhat_ctx["Khat"] @ alpha_f
    # heteroscedastic noise = 1/W; guard W→0 with a cap
    Winv = 1.0 / jnp.maximum(W, 1e-10)
    g = diagKff - jnp.sum(V * V, axis=0) + Winv
    sg = jnp.sqrt(g)
    Vs = V / sg[None, :]
    nu = V.shape[0]
    Lu, _ = safe_cholesky(jnp.eye(nu, dtype=x.dtype) + Vs @ Vs.T)
    yhat_minus_m = Khat_alpha + Winv * alpha_f
    ys = yhat_minus_m / sg
    be = solve_tril(Lu, Vs @ ys)
    alpha_u = solve_tril_T(Luu, solve_tril_T(Lu, be))
    iLuu = solve_tril(Luu, jnp.eye(nu, dtype=x.dtype))
    M = solve_tril(Lu, iLuu)
    iA = M.T @ M
    iKuu = iLuu.T @ iLuu
    Lpost = -(iKuu - iA)
    sW = jnp.ones(nu, dtype=x.dtype)
    return Posterior(alpha=alpha_u, sW=sW, L=Lpost, is_tril=False)


def laplace_evaluate(mean, kernel, lik, x, y):
    sn2_for_jitter = jnp.asarray(1.0, x.dtype)  # snu2 anchor when lik has no sn2
    prior = _FITCPriorKernel(kernel, sn2_for_jitter)
    post_f, nlZ = _laplace.evaluate(mean, prior, lik, x, y)
    ctx = {"sn2_jitter": sn2_for_jitter, "Khat": prior.Ktrain(x)}
    return _to_inducing_posterior(kernel, lik, x, post_f, ctx), nlZ


def laplace_nlml(mean, kernel, lik, x, y):
    prior = _FITCPriorKernel(kernel, jnp.asarray(1.0, x.dtype))
    return _laplace.nlml(mean, prior, lik, x, y)


def ep_evaluate(mean, kernel, lik, x, y, ttau0=None, tnu0=None):
    sn2_for_jitter = jnp.asarray(1.0, x.dtype)
    prior = _FITCPriorKernel(kernel, sn2_for_jitter)
    post_f, nlZ, sites = _ep.evaluate(mean, prior, lik, x, y, ttau0, tnu0)
    ctx = {"sn2_jitter": sn2_for_jitter, "Khat": prior.Ktrain(x)}
    return _to_inducing_posterior(kernel, lik, x, post_f, ctx), nlZ, sites


def ep_nlml(mean, kernel, lik, x, y, ttau0=None, tnu0=None):
    prior = _FITCPriorKernel(kernel, jnp.asarray(1.0, x.dtype))
    return _ep.nlml(mean, prior, lik, x, y, ttau0, tnu0)
