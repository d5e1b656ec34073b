"""Laplace-approximation inference for non-Gaussian likelihoods.

TPU-native counterpart of pyGPs ``inf.Laplace`` (inf.py:~250-450).
Restructured for jit (SURVEY.md §7.1 delta 5):

* Newton iteration on the latent mode runs under ``lax.while_loop`` with a
  *backtracking* line search on the objective
  ψ(a) = ½ aᵀKa − Σ log p(y | Ka + m)  (the reference uses a 1-D Brent
  search, ``tools.brentmin`` — jit-hostile; backtracking is the
  jit-friendly equivalent with the same monotone-descent guarantee).
* W = −d²log p/df² is clipped at 0 for non-log-concave likelihoods (the
  reference's guard, inf.py:~300 verify-tagged).
* Hyperparameter gradients: instead of the reference's hand-assembled
  explicit + implicit terms (through d3lp), the mode f̂(θ) is exposed as a
  differentiable function via ``jax.custom_vjp`` + the implicit function
  theorem: at the mode f̂ = m + K·∇log p(y|f̂), so
  df̂ = (I + KW)⁻¹ (∂/∂θ)[m + K·d1], and
  (I + KW)⁻¹ v = v − sW·B⁻¹·sW·K·v with B = I + sW K sW (Woodbury).
  ``jax.grad`` of :func:`nlml` then reproduces the reference's full dnlZ
  (explicit + implicit) automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from pygps_tpu.core.posteriors import Posterior
from pygps_tpu.utils.tools import safe_cholesky, solve_chol

_MAX_NEWTON = 40
_MAX_BACKTRACK = 15
_TOL = 1e-6


def _psi(a, K, m, lik, y):
    f = K @ a + m
    return 0.5 * jnp.dot(a, K @ a) - jnp.sum(lik.log_density(y, f)), f


def _newton_mode(mean_f, K, lik, y, a0):
    """Find the posterior mode; returns a with f̂ = K a + m. Runs entirely
    under lax.while_loop (not differentiated — see mode() below)."""
    m = mean_f

    def newton_step(a):
        f = K @ a + m
        _, d1, d2, _ = lik.laplace_derivs(y, f)
        W = jnp.maximum(-d2, 0.0)
        sW = jnp.sqrt(W)
        B = jnp.eye(K.shape[0], dtype=K.dtype) + (sW[:, None] * K) * sW[None, :]
        L, _ = safe_cholesky(B)
        b = W * (f - m) + d1
        # target a* = b − sW B⁻¹ sW K b ; direction Δa = a* − a
        a_star = b - sW * solve_chol(L, sW * (K @ b))
        return a_star - a

    def backtrack(a, da, psi_old):
        def cond(state):
            s, psi_new, it = state
            return jnp.logical_and(psi_new > psi_old, it < _MAX_BACKTRACK)

        def body(state):
            s, _, it = state
            s = s * 0.5
            psi_new, _ = _psi(a + s * da, K, m, lik, y)
            return s, psi_new, it + 1

        psi1, _ = _psi(a + da, K, m, lik, y)
        s, psi_new, _ = lax.while_loop(cond, body, (jnp.asarray(1.0, K.dtype), psi1, 0))
        improved = psi_new <= psi_old
        return jnp.where(improved, s, 0.0), jnp.where(improved, psi_new, psi_old)

    def cond(state):
        a, psi_old, dpsi, it = state
        return jnp.logical_and(dpsi > _TOL, it < _MAX_NEWTON)

    def body(state):
        a, psi_old, _, it = state
        da = newton_step(a)
        s, psi_new = backtrack(a, da, psi_old)
        return a + s * da, psi_new, psi_old - psi_new, it + 1

    psi0, _ = _psi(a0, K, m, lik, y)
    a, _, _, _ = lax.while_loop(
        cond, body, (a0, psi0, jnp.asarray(jnp.inf, K.dtype), 0)
    )
    return a


@partial(jax.custom_vjp, nondiff_argnums=())
def _mode(m, K, lik, y):
    """Differentiable posterior mode f̂(m, K, lik)."""
    a0 = jnp.zeros_like(y)
    a = _newton_mode(m, K, lik, y, a0)
    return K @ a + m


def _mode_fwd(m, K, lik, y):
    f = _mode(m, K, lik, y)
    return f, (m, K, lik, y, f)


def _mode_bwd(res, v):
    m, K, lik, y, f = res
    _, _, d2, _ = lik.laplace_derivs(y, f)
    W = jnp.maximum(-d2, 0.0)
    sW = jnp.sqrt(W)
    B = jnp.eye(K.shape[0], dtype=K.dtype) + (sW[:, None] * K) * sW[None, :]
    L, _ = safe_cholesky(B)
    # u = (I + W K)⁻¹ v  (transpose of (I + K W)⁻¹ acting on cotangent)
    u = v - sW * solve_chol(L, sW * (K @ v))

    f_hat = lax.stop_gradient(f)

    def r(m_, K_, lik_):
        _, d1, _, _ = lik_.laplace_derivs(y, f_hat)
        return m_ + K_ @ d1

    _, vjp_fn = jax.vjp(r, m, K, lik)
    dm, dK, dlik = vjp_fn(u)
    return dm, dK, dlik, jax.tree_util.tree_map(jnp.zeros_like, y)


_mode.defvjp(_mode_fwd, _mode_bwd)


def _nlz_at_mode(m, K, lik, y, f):
    """nlZ of the Laplace approximation given (differentiable) mode f."""
    lp, d1, d2, _ = lik.laplace_derivs(y, f)
    W = jnp.maximum(-d2, 0.0)
    sW = jnp.sqrt(W)
    B = jnp.eye(K.shape[0], dtype=K.dtype) + (sW[:, None] * K) * sW[None, :]
    L, _ = safe_cholesky(B)
    # at the mode: f − m = K a with a = d1
    a = d1
    nlZ = (0.5 * jnp.dot(a, f - m) - jnp.sum(lp)
           + jnp.sum(jnp.log(jnp.diag(L))))
    return nlZ, (a, sW, L)


def nlml(mean, kernel, lik, x, y):
    """Differentiable Laplace NLML (implicit mode derivatives included)."""
    K = kernel.Ktrain(x)
    m = mean(x)
    f = _mode(m, K, lik, y)
    nlZ, _ = _nlz_at_mode(m, K, lik, y, f)
    return nlZ


def evaluate(mean, kernel, lik, x, y):
    """(Posterior, nlZ) — engine entry point. Posterior keeps the reference
    contract: alpha = ∇log p(y|f̂), sW = √W, L = chol(I + sW K sW)."""
    K = kernel.Ktrain(x)
    m = mean(x)
    f = _mode(m, K, lik, y)
    nlZ, (a, sW, L) = _nlz_at_mode(m, K, lik, y, f)
    return Posterior(alpha=a, sW=sW, L=L, is_tril=True), nlZ
