"""MCMC diagnostics: split-R̂ and effective sample size.

The reference has no sampling, hence no diagnostics; the north star
requires ESS/R-hat reporting for the chain-sharded samplers
(SURVEY.md §5.5).  Vectorised implementations of the standard estimators
(Gelman et al., BDA3 / Vehtari et al. 2021 split forms).
"""

from __future__ import annotations

import jax.numpy as jnp


def split_rhat(samples: jnp.ndarray) -> jnp.ndarray:
    """Split-R̂ per dimension. samples: (T, C, dim)."""
    T, C, dim = samples.shape
    half = T // 2
    x = jnp.concatenate([samples[:half], samples[half:2 * half]], axis=1)
    t, c = x.shape[0], x.shape[1]
    chain_mean = x.mean(axis=0)                    # (c, dim)
    chain_var = x.var(axis=0, ddof=1)              # (c, dim)
    B = t * chain_mean.var(axis=0, ddof=1)         # between
    W = chain_var.mean(axis=0)                     # within
    var_hat = (t - 1) / t * W + B / t
    return jnp.sqrt(var_hat / W)


def ess(samples: jnp.ndarray, max_lag: int | None = None) -> jnp.ndarray:
    """Bulk effective sample size per dimension via autocorrelation sums
    with Geyer initial-monotone truncation. samples: (T, C, dim)."""
    T, C, dim = samples.shape
    max_lag = max_lag or min(T - 1, 1000)
    x = samples - samples.mean(axis=0, keepdims=True)
    var = (x * x).mean(axis=(0, 1)) + 1e-300

    # autocorrelation at each lag, averaged over chains
    def rho(lag):
        num = (x[:T - lag] * x[lag:]).mean(axis=(0, 1))
        return num / var

    lags = jnp.arange(1, max_lag + 1)
    rhos = jnp.stack([rho(int(l)) for l in lags])   # (max_lag, dim)
    # Geyer: sum consecutive pairs, truncate at first negative pair sum
    pair = rhos[0:-1:2] + rhos[1::2]                # (max_lag//2, dim)
    pos = jnp.cumprod(pair > 0, axis=0).astype(samples.dtype)
    tau = 1.0 + 2.0 * jnp.sum(pair * pos, axis=0)
    return T * C / jnp.maximum(tau, 1e-6)
