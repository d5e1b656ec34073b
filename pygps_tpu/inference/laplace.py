"""Laplace-approximation inference for non-Gaussian likelihoods.

TPU-native counterpart of pyGPs ``inf.Laplace`` (inf.py:~250-450) and the
structured ``inf.FITC_Laplace`` (inf.py:~900-1150) — ONE engine written
against the prior-operator interface (inference/priors.py): the dense
path uses explicit K; the FITC path runs the same Newton/energy code in
O(n·m²) Woodbury algebra, exactly the reference's complexity split.

Restructured for jit (SURVEY.md §7.1 delta 5):

* Newton iteration under ``lax.while_loop`` with *backtracking* line search
  on ψ(a) = ½ aᵀK̂a − Σ log p(y | K̂a + m) (the reference uses a 1-D Brent
  search, ``tools.brentmin`` — jit-hostile; backtracking keeps the
  monotone-descent guarantee).
* W = −d²log p/df² clipped at 0 for non-log-concave likelihoods
  (reference guard, inf.py:~300 verify-tagged).
* Hyperparameter gradients via the implicit function theorem
  (``jax.custom_vjp``): at the mode f̂ = m + K̂·d1(f̂), so
  (I + K̂W)⁻¹ v = v − sW·B⁻¹·sW·K̂·v (Woodbury) gives the mode
  cotangent; ``jax.grad`` of :func:`nlml` then reproduces the reference's
  full dnlZ (explicit + implicit d3lp terms) automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pygps_tpu import config
from pygps_tpu.core.posteriors import Posterior
from pygps_tpu.inference.priors import DenseOps, FITCOps
from pygps_tpu.utils.tools import safe_cholesky, solve_tril, solve_tril_T

_MAX_NEWTON = 40
_MAX_BACKTRACK = 15
_TOL = 1e-6


def _psi(a, ops, m, lik, y):
    f = ops.matvec(a) + m
    return 0.5 * jnp.dot(a, ops.matvec(a)) - jnp.sum(lik.log_density(y, f))


def _newton_mode(ops, m, lik, y, a0):
    """Posterior-mode coefficients a with f̂ = K̂ a + m (non-diff; see
    _mode)."""

    def newton_target(a):
        f = ops.matvec(a) + m
        _, d1, d2, _ = lik.laplace_derivs(y, f)
        W = jnp.maximum(-d2, 0.0)
        aux = ops.with_W(W)
        b = W * (f - m) + d1
        return b - ops.apply_A(aux, ops.matvec(b))

    def backtrack(a, da, psi_old):
        def cond(state):
            s, psi_new, it = state
            return jnp.logical_and(psi_new > psi_old, it < _MAX_BACKTRACK)

        def body(state):
            s, _, it = state
            s = s * 0.5
            return s, _psi(a + s * da, ops, m, lik, y), it + 1

        psi1 = _psi(a + da, ops, m, lik, y)
        s, psi_new, _ = lax.while_loop(
            cond, body, (jnp.asarray(1.0, m.dtype), psi1, 0))
        improved = psi_new <= psi_old
        return jnp.where(improved, s, 0.0), jnp.where(improved, psi_new,
                                                      psi_old)

    def cond(state):
        a, psi_old, dpsi, it = state
        return jnp.logical_and(dpsi > _TOL, it < _MAX_NEWTON)

    def body(state):
        a, psi_old, _, it = state
        da = newton_target(a) - a
        s, psi_new = backtrack(a, da, psi_old)
        return a + s * da, psi_new, psi_old - psi_new, it + 1

    psi0 = _psi(a0, ops, m, lik, y)
    a, _, _, _ = lax.while_loop(
        cond, body, (a0, psi0, jnp.asarray(jnp.inf, m.dtype), 0))
    return a


@jax.custom_vjp
def _mode(m, ops, lik, y):
    """Differentiable posterior mode f̂(m, K̂, lik)."""
    a = _newton_mode(ops, m, lik, y, jnp.zeros_like(y))
    return ops.matvec(a) + m


def _mode_fwd(m, ops, lik, y):
    f = _mode(m, ops, lik, y)
    return f, (m, ops, lik, y, f)


def _mode_bwd(res, v):
    m, ops, lik, y, f = res
    _, _, d2, _ = lik.laplace_derivs(y, f)
    W = jnp.maximum(-d2, 0.0)
    aux = ops.with_W(W)
    u = v - ops.apply_A(aux, ops.matvec(v))     # (I + W K̂)⁻¹ v
    f_hat = lax.stop_gradient(f)

    def r(m_, ops_, lik_):
        _, d1, _, _ = lik_.laplace_derivs(y, f_hat)
        return m_ + ops_.matvec(d1)

    _, vjp_fn = jax.vjp(r, m, ops, lik)
    dm, dops, dlik = vjp_fn(u)
    return dm, dops, dlik, jax.tree_util.tree_map(jnp.zeros_like, y)


_mode.defvjp(_mode_fwd, _mode_bwd)


def _nlz_at_mode(m, ops, lik, y, f):
    lp, d1, d2, _ = lik.laplace_derivs(y, f)
    W = jnp.maximum(-d2, 0.0)
    aux = ops.with_W(W)
    a = d1                                  # at the mode: f − m = K̂ a
    nlZ = (0.5 * jnp.dot(a, f - m) - jnp.sum(lp)
           + 0.5 * ops.logdetB(aux))
    return nlZ, (a, jnp.sqrt(W), aux)


def nlml_ops(m, ops, lik, y):
    f = _mode(m, ops, lik, y)
    return _nlz_at_mode(m, ops, lik, y, f)[0]


@jax.custom_vjp
def _mode_warm(m, ops, lik, y, a0):
    """Mode with a warm-started Newton iteration (reference caches
    ``last_alpha`` on inf.Laplace, inf.py:~260 verify-tagged)."""
    a = _newton_mode(ops, m, lik, y, lax.stop_gradient(a0))
    return ops.matvec(a) + m


def _mode_warm_fwd(m, ops, lik, y, a0):
    f = _mode_warm(m, ops, lik, y, a0)
    return f, (m, ops, lik, y, f)


def _mode_warm_bwd(res, v):
    dm, dops, dlik, dy = _mode_bwd(res, v)
    return dm, dops, dlik, dy, jnp.zeros_like(res[3])


_mode_warm.defvjp(_mode_warm_fwd, _mode_warm_bwd)


def nlml_with_state_ops(m, ops, lik, y, a0):
    """(nlZ, a_new): warm-startable Laplace NLML (aux-threaded by the
    optimizer exactly like EP sites)."""
    f = _mode_warm(m, ops, lik, y, a0)
    nlZ, (a, _, _) = _nlz_at_mode(m, ops, lik, y, f)
    return nlZ, (lax.stop_gradient(a),)


# ---------------------------------------------------------------------------
# Dense entry points (reference inf.Laplace)
# ---------------------------------------------------------------------------


def nlml(mean, kernel, lik, x, y):
    ops = DenseOps(kernel.Ktrain(x))
    return nlml_ops(mean(x), ops, lik, y)


def evaluate(mean, kernel, lik, x, y):
    ops = DenseOps(kernel.Ktrain(x))
    m = mean(x)
    f = _mode(m, ops, lik, y)
    nlZ, (a, sW, aux) = _nlz_at_mode(m, ops, lik, y, f)
    L, is_tril = ops.posterior_L(aux)
    return Posterior(alpha=a, sW=sW, L=L, is_tril=is_tril), nlZ


# ---------------------------------------------------------------------------
# FITC entry points (reference inf.FITC_Laplace, O(n·m²))
# ---------------------------------------------------------------------------


def _fitc_ops(kernel, x):
    diagKff, Kuu, Kuf = kernel.fitc_train(x)
    nu = Kuu.shape[0]
    snu2 = config.FITC_JITTER_REL * 1.0   # anchor: unit-scale jitter base
    Luu, _ = safe_cholesky(Kuu + snu2 * jnp.eye(nu, dtype=x.dtype))
    V = solve_tril(Luu, Kuf)
    D = jnp.maximum(diagKff - jnp.sum(V * V, axis=0), 0.0)
    return FITCOps(D=D, V=V), Luu


def fitc_nlml(mean, kernel, lik, x, y):
    ops, _ = _fitc_ops(kernel, x)
    return nlml_ops(mean(x), ops, lik, y)


def inducing_posterior(ops: FITCOps, Luu, m, alpha_f, W):
    """Convert an (alpha, W) posterior over f into the inducing-point
    (alpha_u, L_u) pair used by FITC predict (non-tril branch).

    Pseudo-Gauss route: q(f) equals the exact posterior of the FITC model
    with heteroscedastic noise 1/W and targets ŷ − m = K̂α + W⁻¹α; then
      g    = D + 1/W,  Vs = V/√g,  Lu = chol(I + Vs Vsᵀ)
      α_u  = Luu⁻ᵀ Lu⁻ᵀ Lu⁻¹ Vs (ŷ−m)/√g
      L_u  = −(Kuu'⁻¹ − A⁻¹) = Luu⁻ᵀ(Lu⁻ᵀLu⁻¹ − I)Luu⁻¹ ... expanded via
             iLuu terms (all m×m).
    """
    Winv = 1.0 / jnp.maximum(W, 1e-10)
    g = ops.D + Winv
    sg = jnp.sqrt(g)
    Vs = ops.V / sg[None, :]
    nu = ops.V.shape[0]
    Lu, _ = safe_cholesky(jnp.eye(nu, dtype=m.dtype) + Vs @ Vs.T)
    yhat_minus_m = ops.matvec(alpha_f) + Winv * alpha_f
    be = solve_tril(Lu, Vs @ (yhat_minus_m / sg))
    alpha_u = solve_tril_T(Luu, solve_tril_T(Lu, be))
    iLuu = solve_tril(Luu, jnp.eye(nu, dtype=m.dtype))
    Mm = solve_tril(Lu, iLuu)
    Lpost = -(iLuu.T @ iLuu - Mm.T @ Mm)
    sW = jnp.ones(nu, dtype=m.dtype)
    return Posterior(alpha=alpha_u, sW=sW, L=Lpost, is_tril=False)


def fitc_evaluate(mean, kernel, lik, x, y):
    ops, Luu = _fitc_ops(kernel, x)
    m = mean(x)
    f = _mode(m, ops, lik, y)
    nlZ, (a, sW, aux) = _nlz_at_mode(m, ops, lik, y, f)
    post = inducing_posterior(ops, Luu, m, a, sW * sW)
    return post, nlZ


def nlml_with_state(mean, kernel, lik, x, y, a0):
    ops = DenseOps(kernel.Ktrain(x))
    return nlml_with_state_ops(mean(x), ops, lik, y, a0)


def fitc_nlml_with_state(mean, kernel, lik, x, y, a0):
    ops, _ = _fitc_ops(kernel, x)
    return nlml_with_state_ops(mean(x), ops, lik, y, a0)
