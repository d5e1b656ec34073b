"""Test-only float64 oracles reproducing the REFERENCE's algorithms.

The reference mount is empty (see SURVEY.md provenance note), so verbatim
demo fixtures cannot be captured.  These oracles substitute: from-scratch
numpy/scipy implementations of the reference's *algorithm semantics* —

* :func:`sequential_ep` — pyGPs ``inf.EP``'s sequential site sweep
  (inf.py:~500-700 per SURVEY.md §3.3): per-site cavity → probit moment
  match → rank-1 Sherman–Morrison posterior update, with a full
  ``epComputeParams``-style recompute (Cholesky) after each sweep;
  convergence |ΔnlZ| < 1e-4, sweeps in [2, 10].
* :func:`brentmin_laplace` — pyGPs ``inf.Laplace``'s Newton iteration with
  a 1-D Brent line search over the step length along the Newton direction
  (inf.py:~250-450, ``tools.brentmin``).

They share NO code with pygps_tpu (scipy.special probit moments, plain
numpy linear algebra, scipy Brent) so agreement pins the package's
restructured engines (parallel EP under lax.while_loop; backtracking
Newton with IFT gradients) against reference *semantics*, not just
against their own frozen goldens.

The EP marginal likelihood is assembled from first principles,
log Z_EP = log G + Σᵢ (log Ẑᵢ − log z̃ᵢ), with each piece computed
directly (Gaussian integrals in f64) rather than via any simplified
grouped formula — an independent check of the package's energy identity.
"""

from __future__ import annotations

import numpy as np
from scipy import optimize as sopt
from scipy.special import log_ndtr

_LOG2PI = np.log(2.0 * np.pi)


# ---------------------------------------------------------------------------
# probit (Erf / cum-Gauss) likelihood pieces, scipy-based
# ---------------------------------------------------------------------------


def erf_ep_moments(y, mu, s2):
    """(lZ, dlZ, d2lZ) of ∫ Φ(y·f) N(f|mu, s2) df — reference lik.Erf in
    EP mode (lik.py:~200), standard probit-moment formulas."""
    y = np.sign(y)
    z = y * mu / np.sqrt(1.0 + s2)
    lZ = log_ndtr(z)
    # N(z)/Φ(z), computed in log space for stability
    log_npdf = -0.5 * z * z - 0.5 * _LOG2PI
    ratio = np.exp(log_npdf - lZ)
    dlZ = y * ratio / np.sqrt(1.0 + s2)
    d2lZ = -ratio * (z + ratio) / (1.0 + s2)
    return lZ, dlZ, d2lZ


def erf_laplace_derivs(y, f):
    """(lp, d1, d2, d3) of log Φ(y·f) wrt f — reference lik.Erf in
    Laplace mode."""
    y = np.sign(y)
    z = y * f
    lp = log_ndtr(z)
    log_npdf = -0.5 * z * z - 0.5 * _LOG2PI
    r = np.exp(log_npdf - lp)              # N(z)/Φ(z)
    d1 = y * r
    d2 = -r * (z + r)
    d3 = y * r * (z * z - 1.0 + 3.0 * z * r + 2.0 * r * r)
    return lp, d1, d2, d3


# ---------------------------------------------------------------------------
# sequential EP (reference inf.EP semantics)
# ---------------------------------------------------------------------------


def _ep_log_marginal(K, m, y, ttau, tnu, Sigma, mu, moments):
    """log Z_EP from first principles (f64 dense algebra).

    log G   = ∫ N(f|m,K) Πᵢ exp(−½ τ̃ᵢ fᵢ² + ν̃ᵢ fᵢ) df
    log Ẑᵢ  = lik moment lZ at the cavity
    log z̃ᵢ  = ∫ N(f|μ₋ᵢ,σ₋ᵢ²) exp(−½ τ̃ᵢ f² + ν̃ᵢ f) df (1-D closed form)

    Assembled in the Cholesky-stable Woodbury form (K itself may be
    numerically singular; B = I + sW K sW is not):
      |K||K⁻¹+T̃| = |B|;   (K⁻¹+T̃)⁻¹ = K − K sW B⁻¹ sW K;
      log G = −½ log|B| + ½ bᵀ(K⁻¹+T̃)⁻¹b + ν̃ᵀm − ½ mᵀT̃m,  b = ν̃ − T̃m.
    """
    n = len(m)
    sW = np.sqrt(np.maximum(ttau, 0.0))
    B = np.eye(n) + (sW[:, None] * K) * sW[None, :]
    LB = np.linalg.cholesky(B)
    logdetB = 2.0 * np.log(np.diag(LB)).sum()
    b = tnu - ttau * m
    Kb = K @ b
    Cb = Kb - K @ (sW * np.linalg.solve(
        LB.T, np.linalg.solve(LB, sW * Kb)))
    logG = (-0.5 * logdetB + 0.5 * b @ Cb + tnu @ m
            - 0.5 * m @ (ttau * m))

    sig = np.diag(Sigma)
    tau_n = 1.0 / sig - ttau                 # cavity precision
    nu_n = mu / sig - tnu                    # cavity linear term
    lZ, _, _ = moments(y, nu_n / tau_n, 1.0 / tau_n)
    log_zt = (0.5 * np.log(tau_n / (tau_n + ttau))
              + (nu_n + tnu) ** 2 / (2.0 * (tau_n + ttau))
              - nu_n ** 2 / (2.0 * tau_n))
    return logG + np.sum(lZ) - np.sum(log_zt)


def _ep_recompute(K, m, ttau, tnu):
    """epComputeParams (reference inf.py:~650): recompute (Sigma, mu) from
    the sites via one Cholesky of B = I + sW K sW."""
    n = len(m)
    sW = np.sqrt(np.maximum(ttau, 0.0))
    B = np.eye(n) + (sW[:, None] * K) * sW[None, :]
    L = np.linalg.cholesky(B)
    V = np.linalg.solve(L, sW[:, None] * K)
    Sigma = K - V.T @ V
    t = K @ tnu + m
    alpha = tnu - sW * np.linalg.solve(L.T, np.linalg.solve(L, sW * t))
    mu = K @ alpha + m
    return Sigma, mu


def sequential_ep(K, m, y, moments=erf_ep_moments, tol=1e-4,
                  min_sweeps=2, max_sweeps=10):
    """Reference inf.EP: sequential site loop with rank-1 updates.

    Returns (ttau, tnu, nlZ, mu, Sigma, n_sweeps).
    """
    K = np.asarray(K, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64).reshape(-1)
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    n = len(y)
    ttau = np.zeros(n)
    tnu = np.zeros(n)
    Sigma = K.copy()
    mu = m.copy()
    nlZ_old = np.inf
    sweeps = 0
    while sweeps < max_sweeps:
        for i in range(n):
            tau_ni = 1.0 / Sigma[i, i] - ttau[i]
            nu_ni = mu[i] / Sigma[i, i] - tnu[i]
            _, dlZ, d2lZ = moments(y[i], nu_ni / tau_ni, 1.0 / tau_ni)
            dlZ = float(np.asarray(dlZ).reshape(()))
            d2lZ = float(np.asarray(d2lZ).reshape(()))
            ttau_old_i, tnu_old_i = ttau[i], tnu[i]
            denom = 1.0 + d2lZ / tau_ni
            ttau[i] = max(-d2lZ / denom, 0.0)
            tnu[i] = (dlZ - nu_ni / tau_ni * d2lZ) / denom
            dtt = ttau[i] - ttau_old_i
            dtn = tnu[i] - tnu_old_i
            si = Sigma[:, i].copy()
            ci = dtt / (1.0 + dtt * si[i])
            Sigma -= ci * np.outer(si, si)
            mu -= (ci * (mu[i] + si[i] * dtn) - dtn) * si
        Sigma, mu = _ep_recompute(K, m, ttau, tnu)
        nlZ = -_ep_log_marginal(K, m, y, ttau, tnu, Sigma, mu, moments)
        sweeps += 1
        if sweeps >= min_sweeps and abs(nlZ - nlZ_old) < tol:
            break
        nlZ_old = nlZ
    return ttau, tnu, nlZ, mu, Sigma, sweeps


# ---------------------------------------------------------------------------
# brentmin-Newton Laplace (reference inf.Laplace semantics)
# ---------------------------------------------------------------------------


def brentmin_laplace(K, m, y, derivs=erf_laplace_derivs, tol=1e-9,
                     max_newton=60):
    """Reference inf.Laplace: Newton iterations on
    ψ(f) = ½(f−m)ᵀK⁻¹(f−m) − Σ log p(y|f) with a Brent 1-D line search
    over the step along the Newton direction (tools.brentmin).

    Returns (f_hat, nlZ, psi_at_mode).
    """
    K = np.asarray(K, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64).reshape(-1)
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    n = len(y)
    Kinv = np.linalg.inv(K)

    def psi(f):
        d = f - m
        lp = derivs(y, f)[0]
        return 0.5 * d @ Kinv @ d - np.sum(lp)

    f = m.copy()
    psi_old = psi(f)
    for _ in range(max_newton):
        _, d1, d2, _ = derivs(y, f)
        W = np.maximum(-d2, 0.0)
        sW = np.sqrt(W)
        B = np.eye(n) + (sW[:, None] * K) * sW[None, :]
        L = np.linalg.cholesky(B)
        b = W * (f - m) + d1
        t = sW * (K @ b)
        a_new = b - sW * np.linalg.solve(L.T, np.linalg.solve(L, t))
        f_new = K @ a_new + m
        df = f_new - f
        # Brent line search on s ∈ [0, 2] (reference brentmin over the
        # Newton step length)
        res = sopt.minimize_scalar(lambda s: psi(f + s * df),
                                   bounds=(0.0, 2.0), method="bounded",
                                   options={"xatol": 1e-10})
        f = f + res.x * df
        psi_new = psi(f)
        if abs(psi_old - psi_new) < tol:
            psi_old = psi_new
            break
        psi_old = psi_new

    _, d1, d2, _ = derivs(y, f)
    W = np.maximum(-d2, 0.0)
    sW = np.sqrt(W)
    B = np.eye(n) + (sW[:, None] * K) * sW[None, :]
    L = np.linalg.cholesky(B)
    nlZ = psi_old + np.sum(np.log(np.diag(L)))
    return f, nlZ, psi_old
