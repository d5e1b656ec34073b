"""Whitened stochastic variational sparse GP (SVGP).

North-star VI component (BASELINE.json: "whitened variational sparse GP")
— no reference counterpart (pyGPs's only sparse method is FITC).  Standard
Titsias/Hensman construction in the whitened parameterization:

    u = m_u + L_uu v,  q(v) = N(μ, S),  S = C Cᵀ (C lower triangular)
    q(f_i) = N(m(x_i) + W_iᵀ μ,  K_ii − ‖W_i‖² + ‖Cᵀ W_i‖²),
    W = L_uu⁻¹ K_uf
    ELBO = Σ_i E_{q(f_i)}[log p(y_i|f_i)] − KL(q(v) ‖ N(0, I))
    KL   = ½(‖μ‖² + ‖C‖_F² − 2 Σ log |diag C| − m)

Expected log-likelihoods use each likelihood's closed form when cheap
(Gauss) and 32-point Gauss–Hermite otherwise — any Likelihood works.
Inducing inputs, variational params and all hyperparameters train jointly
with optax under one jit (minibatched; the jitted step is O(b·m² + m³)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from pygps_tpu import config
from pygps_tpu.core.likelihoods import _GH_T, _GH_W, Gauss
from pygps_tpu.core.posteriors import Posterior
from pygps_tpu.utils.tools import safe_cholesky, solve_tril


class SVGPParams(NamedTuple):
    z: jax.Array          # (m, d) inducing inputs
    mu: jax.Array         # (m,) whitened mean
    c_raw: jax.Array      # (m, m) lower-tri factor of S (raw; tril applied)
    prior: tuple          # (mean, kernel, lik) functor pytree


def init_params(mean, kernel, lik, z0) -> SVGPParams:
    z0 = config.asarray(z0)
    m = z0.shape[0]
    return SVGPParams(
        z=z0,
        mu=jnp.zeros(m, z0.dtype),
        c_raw=jnp.eye(m, dtype=z0.dtype),
        prior=(mean, kernel, lik),
    )


def _whitened_marginals(params: SVGPParams, x):
    mean, kernel, lik = params.prior
    z = params.z
    m = z.shape[0]
    Kuu = kernel.Ktrain(z) + 1e-6 * jnp.eye(m, dtype=z.dtype)
    Luu, _ = safe_cholesky(Kuu)
    Kuf = kernel.K(z, x)
    W = solve_tril(Luu, Kuf)                  # (m, n)
    C = jnp.tril(params.c_raw)
    fmu = mean(x) + W.T @ params.mu
    kff = kernel.Kdiag(x)
    CtW = C.T @ W
    fs2 = jnp.maximum(kff - jnp.sum(W * W, 0) + jnp.sum(CtW * CtW, 0), 1e-12)
    return fmu, fs2, C, Luu


def _expected_log_lik(lik, y, fmu, fs2):
    if isinstance(lik, Gauss):
        sn2 = jnp.exp(2.0 * lik.log_sigma)
        return (-0.5 * jnp.log(2.0 * jnp.pi * sn2)
                - 0.5 * ((y - fmu) ** 2 + fs2) / sn2)
    t = jnp.asarray(_GH_T, fmu.dtype)
    w = jnp.asarray(_GH_W, fmu.dtype) / jnp.sqrt(jnp.pi)
    f = fmu[:, None] + jnp.sqrt(2.0 * fs2)[:, None] * t[None, :]
    return jnp.sum(w * lik.log_density(y[:, None], f), axis=-1)


def elbo(params: SVGPParams, x, y, n_total=None):
    """Evidence lower bound (minibatch-scaled when n_total is given)."""
    _, _, lik = params.prior
    fmu, fs2, C, _ = _whitened_marginals(params, x)
    ell = jnp.sum(_expected_log_lik(lik, y, fmu, fs2))
    if n_total is not None:
        ell = ell * (n_total / x.shape[0])
    m = params.mu.shape[0]
    diag = jnp.abs(jnp.diag(C)) + 1e-12
    kl = 0.5 * (jnp.sum(params.mu ** 2) + jnp.sum(jnp.tril(C) ** 2)
                - 2.0 * jnp.sum(jnp.log(diag)) - m)
    return ell - kl


def fit(params: SVGPParams, x, y, num_steps=500, batch_size=None, lr=0.01,
        seed=0):
    """Adam on −ELBO; returns (params, elbo_history)."""
    x = config.asarray(x)
    y = config.asarray(y).reshape(-1)
    n = x.shape[0]
    bs = batch_size if batch_size is not None and batch_size < n else None
    tx = optax.adam(lr)

    def loss(p, xb, yb):
        return -elbo(p, xb, yb, n_total=n if bs is not None else None)

    @jax.jit
    def step(p, opt_state, key):
        if bs is not None:
            idx = jax.random.choice(key, n, (bs,), replace=False)
            xb, yb = x[idx], y[idx]
        else:
            xb, yb = x, y
        v, g = jax.value_and_grad(loss)(p, xb, yb)
        updates, opt_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, -v

    opt_state = tx.init(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_steps)
    hist = []
    for i, k in enumerate(keys):
        params, opt_state, e = step(params, opt_state, k)
        if i % 25 == 0 or i == num_steps - 1:   # avoid per-step host syncs
            hist.append(float(e))
    return params, hist


def posterior(params: SVGPParams) -> Posterior:
    """Posterior over whitened inducing values in the (alpha, sW, L)
    contract: predictive mean = K(z, x*)ᵀ alpha + m(x*) with
    alpha = Luu⁻ᵀ μ; covariance handled via the non-tril branch with
    L = Luu⁻ᵀ (C Cᵀ − I) Luu⁻¹."""
    fake_x = params.z
    mean, kernel, lik = params.prior
    m = params.z.shape[0]
    Kuu = kernel.Ktrain(params.z) + 1e-6 * jnp.eye(m, dtype=params.z.dtype)
    Luu, _ = safe_cholesky(Kuu)
    C = jnp.tril(params.c_raw)
    alpha = jax.scipy.linalg.solve_triangular(
        Luu.T, params.mu, lower=False)
    iLuu = solve_tril(Luu, jnp.eye(m, dtype=params.z.dtype))
    Lmat = iLuu.T @ (C @ C.T - jnp.eye(m, dtype=params.z.dtype)) @ iLuu
    sW = jnp.ones(m, dtype=params.z.dtype)
    return Posterior(alpha=alpha, sW=sW, L=Lmat, is_tril=False)


def predict(params: SVGPParams, xs, ys=None):
    """(lp, ymu, ys2, fmu, fs2) at test points."""
    xs = config.asarray(xs)
    mean, kernel, lik = params.prior
    fmu, fs2, _, _ = _whitened_marginals(params, xs)
    lp, ymu, ys2 = lik.predict(fmu, fs2, y=None if ys is None
                               else config.asarray(ys).reshape(-1))
    return lp, ymu, ys2, fmu, fs2
