"""Expectation-Propagation inference, restructured as parallel EP.

TPU-native counterpart of pyGPs ``inf.EP`` (inf.py:~500-700) and the
structured ``inf.FITC_EP`` (inf.py:~1150-1400) — ONE engine over the
prior-operator interface (inference/priors.py): dense path O(n³)/sweep,
FITC path O(n·m²)/sweep, the reference's complexity split.

The reference sweeps sites *sequentially* with rank-1 updates (inherently
serial, SURVEY.md §3.3); here all site updates of a sweep are batched
(damped parallel EP) under ``lax.while_loop`` — per sweep one factorization
+ matmuls on the MXU.  Convergence tolerance matches the reference
(|ΔnlZ| < 1e-4); parity is statistical (BASELINE.md "within MC/solver
tolerance").

EP energy (derivation): Z_EP = G · Π_i (Ẑ_i / z̃_i) with
  G    = ∫ N(f|m,K̂) Π t̃_i(f_i) df          (Gaussian integral)
  Ẑ_i  = ∫ N(f_i|μ₋ᵢ, σ²₋ᵢ) p(y_i|f_i) df_i  (lik.ep_moments lZ)
  z̃_i  = ∫ N(f_i|μ₋ᵢ, σ²₋ᵢ) t̃_i(f_i) df_i  (closed form)
  log G = −½ log det B + ½ ν̃ᵀμ + ½ ν̃ᵀ(m − K̂·A·m) − ½ mᵀ·A·m,
  A = sW B⁻¹ sW,  B = I + sW K̂ sW.
Exact for Gaussian likelihoods (pinned by tests against inf.Exact).

Gradients: at an EP fixed point the energy is stationary in the site
parameters, so ``dnlZ`` is ``jax.grad`` of the energy with sites
stop-gradiented — the reference's "hold sites fixed" rule (inf.py:~680).

Warm starting: the reference caches ``last_ttau/last_tnu`` on the engine
instance (stateful ``inf.EP``); the engine wrapper in engines.py
reproduces that outside jit via the optional ``ttau0/tnu0`` arguments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pygps_tpu.core.posteriors import Posterior
from pygps_tpu.inference.laplace import _fitc_ops, inducing_posterior
from pygps_tpu.inference.priors import DenseOps

_MIN_SWEEPS = 2
_MAX_SWEEPS = 60
_TOL = 1e-4
#: initial/maximum damping.  0.9 (near-undamped) converges in fewer sweeps
#: than the conservative 0.7 on every probit configuration measured
#: (tests pass, energy-reject guard catches the rare unstable sweep);
#: rejected sweeps still halve it adaptively.
_DAMP = 0.9
#: Anderson(1) mixing bounds for the fixed-point acceleration: θ≈ρ/(ρ−1)
#: for linear contraction rate ρ (measured ρ≈0.66 endgame → θ≈−2).
_ANDERSON_LO = -10.0
_ANDERSON_HI = 0.9


def _moments_from_sites(ops, m, ttau, tnu):
    """(diag Σ, μ, aux) of q(f) for sites exp(−½ ttau f² + tnu f)."""
    aux = ops.with_W(ttau)
    sig = ops.diag_Sigma(aux)
    t = m + ops.matvec(tnu)
    mu = t - ops.matvec(ops.apply_A(aux, t))
    return sig, mu, aux


def _init_moments(ops, m, ttau0, tnu0):
    """Initial q-moments; the all-zero (cold-start) case is closed form
    (Σ = K̂, μ = m) — skips one full factorization + TRSM per cold
    evaluation (~12 % of an 8-sweep EP NLML at n=4096 on v5e)."""

    def cold(_):
        return ops.diag(), m, ops.zero_W_aux()

    def warm(_):
        return _moments_from_sites(ops, m, ttau0, tnu0)

    is_cold = jnp.logical_and(jnp.all(ttau0 == 0.0), jnp.all(tnu0 == 0.0))
    return lax.cond(is_cold, cold, warm, None)


def _energy(ops, m, lik, y, ttau, tnu):
    sig, mu, aux = _moments_from_sites(ops, m, ttau, tnu)
    return _energy_from(ops, m, lik, y, ttau, tnu, sig, mu, aux)


def _energy_from(ops, m, lik, y, ttau, tnu, sig, mu, aux):
    """EP energy given the already-computed q-moments/factorization for
    these sites (saves the second per-sweep factorization)."""
    tau_n = 1.0 / sig - ttau
    nu_n = mu / sig - tnu
    v0 = 1.0 / tau_n
    m0 = nu_n * v0
    lZ, _, _ = lik.ep_moments(y, m0, v0)
    Am = ops.apply_A(aux, m)
    logG = (-0.5 * ops.logdetB(aux)
            + 0.5 * jnp.dot(tnu, mu)
            + 0.5 * jnp.dot(tnu, m - ops.matvec(Am))
            - 0.5 * jnp.dot(m, Am))
    t = 1.0 + ttau * v0
    log_zt = (-0.5 * jnp.log(t)
              + (m0 / v0 + tnu) ** 2 * v0 / (2.0 * t)
              - m0 * m0 / (2.0 * v0))
    return -(logG + jnp.sum(lZ) - jnp.sum(log_zt))


def _ep_sweeps(ops, m, lik, y, ttau0, tnu0):
    """Damped parallel sweeps with *adaptive* damping and Anderson(1)
    acceleration.

    Guard: a sweep that worsens the energy is rejected, the damping
    halves, and the acceleration history resets (the reference's "fall
    back to last good sites on divergence" guard, inf.py:~650
    verify-tagged); successful sweeps relax the damping back up.

    Acceleration: parallel EP is a fixed-point iteration s ← F(s) on the
    stacked natural site parameters s = (τ̃, ν̃) with linear endgame rate
    ρ ≈ 0.5–0.7 (measured); Anderson mixing with window 1,
      θ = ⟨g, g − g₋⟩/‖g − g₋‖²,  s⁺ = F(s) − θ·(F(s) − F(s₋)),
    collapses that tail (typ. 9→7 sweeps; a non-converging oscillation at
    extreme hyperparameters went 60→14 sweeps AND reached a lower
    energy).  τ̃ is re-clipped at 0 after extrapolation."""
    two_n = 2 * y.shape[0]
    nn = y.shape[0]

    def sweep(carry):
        (ttau, tnu, sig, mu, aux, nlZ_old, dn, it, damp,
         F_prev, g_prev, have_hist) = carry
        tau_n = jnp.maximum(1.0 / sig - ttau, 1e-10)   # cavity precision
        nu_n = mu / sig - tnu
        v0 = 1.0 / tau_n
        m0 = nu_n * v0
        _, dlZ, d2lZ = lik.ep_moments(y, m0, v0)
        denom = 1.0 + d2lZ * v0
        denom = jnp.where(jnp.abs(denom) < 1e-10, 1e-10, denom)
        ttau_new = jnp.maximum(-d2lZ / denom, 0.0)
        tnu_new = (dlZ - m0 * d2lZ) / denom

        s = jnp.concatenate([ttau, tnu])
        F = jnp.concatenate([ttau_new, tnu_new])
        g = F - s
        # Anderson(1) extrapolation when history exists, else damped plain
        dg = g - g_prev
        theta = jnp.dot(g, dg) / jnp.maximum(jnp.dot(dg, dg),
                                             jnp.asarray(1e-30, m.dtype))
        theta = jnp.clip(theta, _ANDERSON_LO, _ANDERSON_HI)
        s_acc = F - theta * (F - F_prev)
        s_damped = damp * F + (1.0 - damp) * s
        s_prop = jnp.where(have_hist, s_acc, s_damped)
        ttau_prop = jnp.maximum(s_prop[:nn], 0.0)
        tnu_prop = s_prop[nn:]
        # the sweep's single factorization: moments of the PROPOSED sites
        # serve both the energy check and (on acceptance) the next sweep
        sig_p, mu_p, aux_p = _moments_from_sites(ops, m, ttau_prop,
                                                 tnu_prop)
        nlZ_prop = _energy_from(ops, m, lik, y, ttau_prop, tnu_prop,
                                sig_p, mu_p, aux_p)
        worse = jnp.logical_and(jnp.isfinite(nlZ_old),
                                ~(nlZ_prop < nlZ_old + 0.1))
        worse = jnp.logical_or(worse, ~jnp.isfinite(nlZ_prop))

        def sel(a, b):
            return jnp.where(worse, a, b)

        ttau = sel(ttau, ttau_prop)
        tnu = sel(tnu, tnu_prop)
        sig = sel(sig, sig_p)
        mu = sel(mu, mu_p)
        aux = jax.tree_util.tree_map(sel, aux, aux_p)
        nlZ = sel(nlZ_old, nlZ_prop)
        dn_new = jnp.where(worse, jnp.asarray(jnp.inf, m.dtype),
                           jnp.abs(nlZ_prop - nlZ_old))
        damp = jnp.where(worse, jnp.maximum(damp * 0.5, 0.05),
                         jnp.minimum(damp * 1.1, _DAMP))
        # on reject: reset acceleration history (it proposed the bad step)
        F_prev_n = jnp.where(worse, jnp.zeros(two_n, m.dtype), F)
        g_prev_n = jnp.where(worse, jnp.zeros(two_n, m.dtype), g)
        have_n = jnp.logical_and(~worse, jnp.asarray(True))
        return (ttau, tnu, sig, mu, aux, nlZ, dn_new, it + 1, damp,
                F_prev_n, g_prev_n, have_n)

    def cond(carry):
        nlZ, dn, it = carry[5], carry[6], carry[7]
        not_converged = jnp.logical_or(dn > _TOL, it < _MIN_SWEEPS)
        return jnp.logical_and(not_converged, it < _MAX_SWEEPS)

    sig0, mu0, aux0 = _init_moments(ops, m, ttau0, tnu0)
    init = (ttau0, tnu0, sig0, mu0, aux0, jnp.asarray(jnp.inf, m.dtype),
            jnp.asarray(jnp.inf, m.dtype), 0,
            jnp.asarray(_DAMP, m.dtype),
            jnp.zeros(two_n, m.dtype), jnp.zeros(two_n, m.dtype),
            jnp.asarray(False))
    out = lax.while_loop(cond, sweep, init)
    ttau, tnu, nlZ, it = out[0], out[1], out[5], out[7]
    return ttau, tnu, nlZ, it, (out[2], out[3], out[4])


def _frozen(functor):
    return jax.tree_util.tree_map(lax.stop_gradient, functor)


def _auto_pre_rank(n):
    """Default low-rank pre-EP rank: off for small n (dense sweeps are
    cheap there), 256 once the dense per-sweep O(n³) dominates."""
    return 0 if n < 2048 else 256


def _lowrank_presolve(K, m, lik, y, ttau0, tnu0, rank):
    """Cold-start accelerator: converge EP on a rank-``rank``
    pivoted-Cholesky surrogate of K (exact diagonal + top eigenspace,
    FITCOps Woodbury algebra → O(n·rank²) per sweep, ~100× cheaper than
    a dense sweep at n=4096), then hand the sites to the dense loop as a
    warm start.  The dense fixed point is then typically 2 sweeps away
    instead of 7–9.  No reference counterpart (the reference's only
    warm start is the stateful site cache, inf.py:~500); this is the
    TPU-native schedule for the same sweep loop.

    Applied only when the incoming sites are cold — a warm start from
    the optimizer's previous step is already better than the surrogate
    fixed point."""
    from pygps_tpu.inference.priors import FITCOps
    from pygps_tpu.utils.pchol import pivoted_cholesky

    K = lax.stop_gradient(K)
    rank = min(int(rank), K.shape[0])

    def cold(_):
        row_fn = lambda i: lax.dynamic_index_in_dim(K, i, 0,
                                                    keepdims=False)
        Lpc, _ = pivoted_cholesky(row_fn, jnp.diag(K), rank)
        D = jnp.maximum(jnp.diag(K) - jnp.sum(Lpc * Lpc, axis=0), 1e-10)
        pre_ops = FITCOps(D=D, V=Lpc)
        t, v, _, _, _ = _ep_sweeps(pre_ops, lax.stop_gradient(m),
                                   _frozen(lik), lax.stop_gradient(y),
                                   ttau0, tnu0)
        return t, v

    def warm(_):
        return ttau0, tnu0

    is_cold = jnp.logical_and(jnp.all(ttau0 == 0.0), jnp.all(tnu0 == 0.0))
    return lax.cond(is_cold, cold, warm, None)


def _efs_primal(K, m, lik, y, ttau, tnu, nlZ0, sW, Lb, m0, v0):
    return nlZ0


def _efs_fwd(K, m, lik, y, ttau, tnu, nlZ0, sW, Lb, m0, v0):
    return nlZ0, (K, m, lik, y, ttau, tnu, sW, Lb, m0, v0)


def _efs_bwd(res, g):
    from pygps_tpu.utils.tools import solve_chol

    K, m, lik, y, ttau, tnu, sW, Lb, m0, v0 = res
    # ∂nlZ/∂K = ½(A − bbᵀ), ∂nlZ/∂m = −b with b = ν̃ − A(m + Kν̃),
    # A = sW B⁻¹ sW (GPML infEP.m F-form; derivation in the docstring of
    # energy_fixed_sites_dense).  One n×n triangular-solve pass — the
    # only O(n³) op of the whole backward.
    h = m + K @ tnu
    Ah = sW * solve_chol(Lb, sW * h)
    bvec = tnu - Ah
    Amat = sW[:, None] * solve_chol(Lb, jnp.diag(sW))
    Kbar = (0.5 * g) * (Amat - jnp.outer(bvec, bvec))
    mbar = -g * bvec
    # likelihood-parameter cotangent: −Σ ∂lZ/∂φ at FIXED cavities
    def lik_term(lk):
        lZ, _, _ = lk.ep_moments(y, m0, v0)
        return -jnp.sum(lZ)

    _, lik_vjp = jax.vjp(lik_term, lik)
    (likbar,) = lik_vjp(g)
    z = lambda a: jnp.zeros_like(a)
    return (Kbar, mbar, likbar, z(y), z(ttau), z(tnu),
            jnp.zeros(()), z(sW), z(Lb), z(m0), z(v0))


energy_fixed_sites_dense = jax.custom_vjp(_efs_primal)
energy_fixed_sites_dense.defvjp(_efs_fwd, _efs_bwd)
energy_fixed_sites_dense.__doc__ = """EP energy at fixed moment-matched
sites, with the ANALYTIC fixed-point gradient instead of autodiff
through the energy expression.

At an EP fixed point the energy is stationary in the site parameters
AND the cavity parameters (moment matching makes
∂(Σ lZᵢ − Σ log z̃ᵢ)/∂cavity = 0), so the total hyperparameter gradient
reduces to the partial derivative of log G (which depends on θ only
through K and m) plus the likelihood's direct ∂lZ/∂φ term — the
reference's closed form (GPML infEP.m; R&W eq. 5.41 generalized to
nonzero mean):

  ∂nlZ/∂K = ½(A − bbᵀ),  ∂nlZ/∂m = −b,
  b = ν̃ − A(m + Kν̃),    A = sW B⁻¹ sW.

Derivation: logG = −½ log det B + ν̃ᵀm + ½ν̃ᵀKν̃ − ½hᵀAh with
h = m + Kν̃; ∂(−½logdetB)/∂K = −½A, ∂(½ν̃ᵀKν̃)/∂K = ½ν̃ν̃ᵀ,
∂(−½hᵀAh)/∂K = −sym(Ah·ν̃ᵀ) + ½(Ah)(Ah)ᵀ (dA = −A dK A), which
collapses to ½bbᵀ − ½A; nlZ = −logG-part flips the sign.

vs the previous path (full autodiff through the differentiable energy):
the forward re-factorization AND its ~2n³ VJP are replaced by the
sweep loop's own byproducts + ONE triangular-solve pass, saving ≈ one
sweep's worth of work per NLML+grad evaluation.  The gradients agree
to O(site residual) — the same stationarity argument the site
stop-gradient already relied on (inf.py:~680 'hold sites fixed')."""


def nlml_ops(ops, m, lik, y, ttau0=None, tnu0=None):
    """Differentiable EP NLML over a prior operator (sites found without
    gradients, held fixed for the energy — valid by EP stationarity)."""
    sg = lax.stop_gradient
    if ttau0 is None:
        ttau0 = jnp.zeros_like(y)
        tnu0 = jnp.zeros_like(y)
    ttau, tnu, _, _, moments = _ep_sweeps(_frozen(ops), sg(m), _frozen(lik),
                                          sg(y), sg(ttau0), sg(tnu0))
    return _energy_dispatch(ops, m, lik, y, sg(ttau), sg(tnu), moments)


def _energy_dispatch(ops, m, lik, y, ttau, tnu, moments):
    """Dense operators route through the analytic fixed-point gradient
    (energy_fixed_sites_dense — saves the energy re-factorization and
    its autodiff transpose); structured (FITC) operators keep the
    generic autodiff energy.

    Cap interaction (round-4 advisor): the analytic gradient assumes
    cavity/moment-matching stationarity, which holds only when
    ``_ep_sweeps`` converged (dn ≤ _TOL).  If the loop exits at the
    _MAX_SWEEPS=60 cap unconverged, the gradient carries an extra
    O(site residual) error on top of the O(site residual) the autodiff
    path's site stop-gradient already carries — same order, larger
    constant.  Convergence is a traced value inside jit, so a runtime
    fallback would compile BOTH energy paths (a dense re-factorization
    + its VJP) into every EP program via lax.cond; given the rejection-
    damped sweep loop converges in practice (worst measured: 14 sweeps
    at extreme hyperparameters, see _ep_sweeps), we accept the cap risk
    and keep the knob: set ``config.EP_ANALYTIC_GRAD = False`` to force
    the autodiff energy when optimizing in regimes where EP may hit the
    cap."""
    from pygps_tpu import config

    sg = lax.stop_gradient
    if isinstance(ops, DenseOps) and config.EP_ANALYTIC_GRAD:
        sig, mu, aux = moments
        # cheap O(n²) forward value from the converged factorization
        nlZ0 = sg(_energy_from(_frozen(ops), sg(m), _frozen(lik), sg(y),
                               ttau, tnu, sig, mu, aux))
        sW, Lb = aux
        tau_n = jnp.maximum(1.0 / sig - ttau, 1e-10)
        v0 = 1.0 / tau_n
        m0 = (mu / sig - tnu) * v0
        return energy_fixed_sites_dense(ops.K, m, lik, y, ttau, tnu,
                                        nlZ0, sg(sW), sg(Lb), sg(m0),
                                        sg(v0))
    return _energy(ops, m, lik, y, ttau, tnu)


def nlml_with_sites_ops(ops, m, lik, y, ttau0, tnu0):
    """(nlZ, (ttau, tnu)) — energy plus converged sites, for warm-started
    optimization (the reference's stateful ``last_ttau/last_tnu`` cache,
    inf.py:~500, threaded functionally through the optimizer loop)."""
    sg = lax.stop_gradient
    ttau, tnu, _, _, moments = _ep_sweeps(_frozen(ops), sg(m), _frozen(lik),
                                          sg(y), sg(ttau0), sg(tnu0))
    nlZ = _energy_dispatch(ops, m, lik, y, sg(ttau), sg(tnu), moments)
    return nlZ, (sg(ttau), sg(tnu))


def nlml_with_sites(mean, kernel, lik, x, y, ttau0, tnu0, pre_rank=None):
    ops = DenseOps(kernel.Ktrain(x))
    m = mean(x)
    pre_rank = _auto_pre_rank(y.shape[0]) if pre_rank is None else pre_rank
    if pre_rank > 0:
        ttau0, tnu0 = _lowrank_presolve(ops.K, m, lik, y,
                                        lax.stop_gradient(ttau0),
                                        lax.stop_gradient(tnu0), pre_rank)
    return nlml_with_sites_ops(ops, m, lik, y, ttau0, tnu0)


def fitc_nlml_with_sites(mean, kernel, lik, x, y, ttau0, tnu0):
    ops, _ = _fitc_ops(kernel, x)
    return nlml_with_sites_ops(ops, mean(x), lik, y, ttau0, tnu0)


def _alpha_from_sites(ops, m, ttau, tnu):
    """alpha = K̂⁻¹(μ − m) = ν̃ − A(K̂ ν̃ + m)."""
    aux = ops.with_W(ttau)
    return tnu - ops.apply_A(aux, ops.matvec(tnu) + m), aux


# ---------------------------------------------------------------------------
# Dense entry points (reference inf.EP)
# ---------------------------------------------------------------------------


def nlml(mean, kernel, lik, x, y, ttau0=None, tnu0=None, pre_rank=None):
    ops = DenseOps(kernel.Ktrain(x))
    m = mean(x)
    if ttau0 is None:
        ttau0 = jnp.zeros_like(y)
        tnu0 = jnp.zeros_like(y)
    pre_rank = _auto_pre_rank(y.shape[0]) if pre_rank is None else pre_rank
    if pre_rank > 0:
        ttau0, tnu0 = _lowrank_presolve(ops.K, m, lik, y,
                                        lax.stop_gradient(ttau0),
                                        lax.stop_gradient(tnu0), pre_rank)
    return nlml_ops(ops, m, lik, y, ttau0, tnu0)


def evaluate(mean, kernel, lik, x, y, ttau0=None, tnu0=None, pre_rank=None):
    ops = DenseOps(kernel.Ktrain(x))
    m = mean(x)
    if ttau0 is None:
        ttau0 = jnp.zeros_like(y)
        tnu0 = jnp.zeros_like(y)
    pre_rank = _auto_pre_rank(y.shape[0]) if pre_rank is None else pre_rank
    if pre_rank > 0:
        ttau0, tnu0 = _lowrank_presolve(ops.K, m, lik, y, ttau0, tnu0,
                                        pre_rank)
    ttau, tnu, nlZ, _, _ = _ep_sweeps(ops, m, lik, y, ttau0, tnu0)
    alpha, aux = _alpha_from_sites(ops, m, ttau, tnu)
    L, is_tril = ops.posterior_L(aux)
    sW = jnp.sqrt(jnp.maximum(ttau, 0.0))
    post = Posterior(alpha=alpha, sW=sW, L=L, is_tril=is_tril)
    return post, nlZ, (ttau, tnu)


# ---------------------------------------------------------------------------
# FITC entry points (reference inf.FITC_EP, O(n·m²))
# ---------------------------------------------------------------------------


def fitc_nlml(mean, kernel, lik, x, y, ttau0=None, tnu0=None):
    ops, _ = _fitc_ops(kernel, x)
    return nlml_ops(ops, mean(x), lik, y, ttau0, tnu0)


def fitc_evaluate(mean, kernel, lik, x, y, ttau0=None, tnu0=None):
    ops, Luu = _fitc_ops(kernel, x)
    m = mean(x)
    if ttau0 is None:
        ttau0 = jnp.zeros_like(y)
        tnu0 = jnp.zeros_like(y)
    ttau, tnu, nlZ, _, _ = _ep_sweeps(ops, m, lik, y, ttau0, tnu0)
    alpha, _ = _alpha_from_sites(ops, m, ttau, tnu)
    post = inducing_posterior(ops, Luu, m, alpha, ttau)
    return post, nlZ, (ttau, tnu)
