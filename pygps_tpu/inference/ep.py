"""Expectation-Propagation inference, restructured as parallel EP.

TPU-native counterpart of pyGPs ``inf.EP`` (inf.py:~500-700).  The
reference sweeps sites *sequentially* with rank-1 posterior updates
(O(n²) per site → O(n³) per sweep, inherently serial — SURVEY.md §3.3
note).  On TPU all site updates of a sweep are batched (damped parallel
EP) under ``lax.while_loop``: per sweep one Cholesky of B = I + sW K sW
plus matmuls, fully on the MXU.  Convergence tolerance matches the
reference (|ΔnlZ| < 1e-4); parity is statistical, not bitwise
(BASELINE.md: "within MC/solver tolerance").

The EP energy implemented here (derivation in comments below) is exact for
a Gaussian likelihood — tests pin nlZ_EP == nlZ_exact in that case.

Hyperparameter gradients: at an EP fixed point the energy is stationary in
the site parameters, so ``dnlZ`` is ``jax.grad`` of the energy with sites
``stop_gradient``-ed — the same "hold sites fixed" rule the reference's
hand-written dnlZ assembly uses (inf.py:~680).

Warm starting: the reference caches ``last_ttau/last_tnu`` on the engine
instance (making ``inf.EP`` stateful during optimization).  Here the pure
function accepts optional initial sites; the engine wrapper in
``engines.py`` reproduces the stateful caching outside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pygps_tpu.core.posteriors import Posterior
from pygps_tpu.utils.tools import safe_cholesky, solve_chol, solve_tril

_MIN_SWEEPS = 2
_MAX_SWEEPS = 60
_TOL = 1e-4
_DAMP = 0.7          # damping factor for parallel site updates


def _posterior_from_sites(K, m, ttau, tnu):
    """q(f) = N(mu, Sigma) for prior N(m, K) and sites exp(−½ttau f²+tnu f).

    Sigma = (K⁻¹ + T̃)⁻¹ = K − K sW B⁻¹ sW K,  B = I + sW K sW
    mu    = Sigma (K⁻¹ m + ν̃) = (m − K sW B⁻¹ sW m) + Sigma ν̃
    """
    n = K.shape[0]
    sW = jnp.sqrt(jnp.maximum(ttau, 0.0))
    B = jnp.eye(n, dtype=K.dtype) + (sW[:, None] * K) * sW[None, :]
    L, _ = safe_cholesky(B)
    V = solve_tril(L, sW[:, None] * K)            # V'V = K sW B⁻¹ sW K
    Sigma = K - V.T @ V
    w = solve_chol(L, sW * m)                     # B⁻¹ sW m
    mu = (m - K @ (sW * w)) + Sigma @ tnu
    return Sigma, mu, L, sW, w


def _energy(K, m, lik, y, ttau, tnu):
    """EP approximation of −log Z.

    Z_EP = G · Π_i (Ẑ_i / z̃_i) with
      G    = ∫ N(f|m,K) Π t̃_i(f_i) df            (Gaussian integral)
      Ẑ_i = ∫ N(f_i|μ₋ᵢ, σ²₋ᵢ) p(y_i|f_i) df_i    (exp of lik.ep_moments lZ)
      z̃_i = ∫ N(f_i|μ₋ᵢ, σ²₋ᵢ) t̃_i(f_i) df_i    (closed form)

    log G = −Σ log diag L + ½ ν̃ᵀμ + ½ ν̃ᵀ(m − K sW w) − ½ mᵀ sW w
    log z̃ = −½log(1+τ̃v₀) + (m₀/v₀+ν̃)² v₀ / (2(1+τ̃v₀)) − m₀²/(2v₀)
    (m₀, v₀ = cavity mean/variance).  Exact for Gaussian likelihoods.
    """
    Sigma, mu, L, sW, w = _posterior_from_sites(K, m, ttau, tnu)
    sig = jnp.diag(Sigma)
    # cavity
    tau_n = 1.0 / sig - ttau
    nu_n = mu / sig - tnu
    v0 = 1.0 / tau_n
    m0 = nu_n * v0
    lZ, _, _ = lik.ep_moments(y, m0, v0)
    logG = (-jnp.sum(jnp.log(jnp.diag(L)))
            + 0.5 * jnp.dot(tnu, mu)
            + 0.5 * jnp.dot(tnu, m - K @ (sW * w))
            - 0.5 * jnp.dot(m, sW * w))
    t = 1.0 + ttau * v0
    log_zt = (-0.5 * jnp.log(t)
              + (m0 / v0 + tnu) ** 2 * v0 / (2.0 * t)
              - m0 * m0 / (2.0 * v0))
    return -(logG + jnp.sum(lZ) - jnp.sum(log_zt))


def _ep_sweeps(K, m, lik, y, ttau0, tnu0):
    """Damped parallel-EP fixed point; returns (ttau, tnu, nlZ, sweeps)."""

    def sweep(carry):
        ttau, tnu, nlZ_old, dn, it = carry
        Sigma, mu, _, _, _ = _posterior_from_sites(K, m, ttau, tnu)
        sig = jnp.diag(Sigma)
        tau_n = 1.0 / sig - ttau
        nu_n = mu / sig - tnu
        # guard: cavity precision must stay positive
        tau_n = jnp.maximum(tau_n, 1e-10)
        v0 = 1.0 / tau_n
        m0 = nu_n * v0
        _, dlZ, d2lZ = lik.ep_moments(y, m0, v0)
        denom = 1.0 + d2lZ * v0
        denom = jnp.where(jnp.abs(denom) < 1e-10, 1e-10, denom)
        ttau_new = jnp.maximum(-d2lZ / denom, 0.0)
        tnu_new = (dlZ - m0 * d2lZ) / denom
        ttau = (1.0 - _DAMP) * ttau + _DAMP * ttau_new
        tnu = (1.0 - _DAMP) * tnu + _DAMP * tnu_new
        nlZ = _energy(K, m, lik, y, ttau, tnu)
        return ttau, tnu, nlZ, jnp.abs(nlZ - nlZ_old), it + 1

    def cond(carry):
        _, _, nlZ, dn, it = carry
        not_converged = jnp.logical_or(dn > _TOL, it < _MIN_SWEEPS)
        return jnp.logical_and(not_converged, it < _MAX_SWEEPS)

    init = (ttau0, tnu0, jnp.asarray(jnp.inf, K.dtype),
            jnp.asarray(jnp.inf, K.dtype), 0)
    ttau, tnu, nlZ, _, it = lax.while_loop(cond, sweep, init)
    return ttau, tnu, nlZ, it


def _sites(mean, kernel, lik, x, y, ttau0=None, tnu0=None):
    K = kernel.Ktrain(x)
    m = mean(x)
    if ttau0 is None:
        ttau0 = jnp.zeros_like(y)
        tnu0 = jnp.zeros_like(y)
    ttau, tnu, _, it = _ep_sweeps(K, m, lik, y, ttau0, tnu0)
    return ttau, tnu, it


def nlml(mean, kernel, lik, x, y, ttau0=None, tnu0=None):
    """Differentiable EP NLML (sites found non-diff, held fixed for grad —
    valid by EP-energy stationarity)."""
    K = kernel.Ktrain(x)
    m = mean(x)
    sg = lax.stop_gradient
    ttau, tnu, _ = _sites(
        _Frozen(mean), _Frozen(kernel), _Frozen(lik),
        sg(x), sg(y),
        None if ttau0 is None else sg(ttau0),
        None if tnu0 is None else sg(tnu0),
    )
    return _energy(K, m, lik, y, sg(ttau), sg(tnu))


def _Frozen(functor):
    """Stop-gradient every leaf of a functor pytree."""
    return jax.tree_util.tree_map(lax.stop_gradient, functor)


def evaluate(mean, kernel, lik, x, y, ttau0=None, tnu0=None):
    """(Posterior, nlZ, (ttau, tnu)) — engine entry point.

    Posterior keeps the reference contract:
      sW = √ttau, L = chol(I + sW K sW),
      alpha = K⁻¹(mu − m) computed stably as ν̃ − sW·B⁻¹·sW·(K ν̃ + m... )
    derived from mu = m − K sW w + Sigma ν̃:
      K⁻¹(mu − m) = ν̃ − sW B⁻¹ sW (K ν̃ + m) ≡ alpha.
    """
    K = kernel.Ktrain(x)
    m = mean(x)
    if ttau0 is None:
        ttau0 = jnp.zeros_like(y)
        tnu0 = jnp.zeros_like(y)
    ttau, tnu, nlZ, _ = _ep_sweeps(K, m, lik, y, ttau0, tnu0)
    n = K.shape[0]
    sW = jnp.sqrt(jnp.maximum(ttau, 0.0))
    B = jnp.eye(n, dtype=K.dtype) + (sW[:, None] * K) * sW[None, :]
    L, _ = safe_cholesky(B)
    alpha = tnu - sW * solve_chol(L, sW * (K @ tnu + m))
    post = Posterior(alpha=alpha, sW=sW, L=L, is_tril=True)
    return post, nlZ, (ttau, tnu)
