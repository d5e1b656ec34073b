"""Sequential Monte Carlo over GP hyperparameters.

North-star component (BASELINE.json: "SMC over hyperparameters") — no
reference counterpart.  Likelihood-tempered SMC sampler (Del Moral et al.
2006 structure, written fresh):

  targets π_β(θ) ∝ p(θ) · L(θ)^β along a β: 0 → 1 schedule,
  importance reweighting between stages, systematic resampling when the
  effective sample size drops below half the population, and K HMC moves
  at the current temperature to rejuvenate particles.

The particle population is a vmapped batch — one jitted program, shardable
across the mesh the same way as the NUTS chain population.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pygps_tpu.inference.hmc import hmc_kernel


def _systematic_resample(key, log_w, n):
    w = jax.nn.softmax(log_w)
    u = (jax.random.uniform(key) + jnp.arange(n)) / n
    cum = jnp.cumsum(w)
    return jnp.searchsorted(cum, u)


def sample_smc(log_prior_fn, log_lik_fn, q0, key, num_stages=20,
               n_hmc_moves=3, hmc_steps=8, eps=0.05,
               ess_threshold=0.5, staged=False):
    """Tempered SMC. q0: (P, dim) initial particles from the prior.

    ``staged=True`` dispatches one jitted program PER TEMPERING STAGE
    (a Python loop over the β schedule; β endpoints are traced scalars,
    so the program compiles once) instead of one lax.scan over all
    stages.  Same numerics; the monolithic scan packs num_stages ×
    n_hmc_moves × hmc_steps NLML+grad evals into one dispatch, which at
    realistic n exceeds the tunnel runtime's per-dispatch execution
    budget and faults the worker (measured at n=2048: the ~480-leapfrog
    program crashed the device; staged per-stage dispatches run ~7 s
    each).  Models default to staged dispatch on TPU-size problems.

    Returns (particles (P, dim), log_evidence_estimate, stats)."""
    Pn, dim = q0.shape
    betas = jnp.linspace(0.0, 1.0, num_stages + 1)
    inv_mass = jnp.ones(dim, q0.dtype)

    llik_v = jax.vmap(log_lik_fn)

    def stage(carry, sidx):
        q, log_w, logZ, key = carry
        b0, b1 = betas[sidx], betas[sidx + 1]
        ll = llik_v(q)
        ll = jnp.where(jnp.isfinite(ll), ll, -1e30)
        dlw = (b1 - b0) * ll
        # evidence increment: log mean of incremental weights under the
        # current normalized weights
        wn = jax.nn.softmax(log_w)
        logZ = logZ + jax.nn.logsumexp(jnp.log(wn + 1e-300) + dlw)
        log_w = log_w + dlw
        # resample if ESS low
        wn = jax.nn.softmax(log_w)
        ess = 1.0 / jnp.sum(wn * wn)
        key, k_rs, k_mv = jax.random.split(key, 3)
        idx = _systematic_resample(k_rs, log_w, Pn)
        do_rs = ess < ess_threshold * Pn
        q = jnp.where(do_rs, q[idx], q)
        log_w = jnp.where(do_rs, jnp.zeros_like(log_w), log_w)

        # rejuvenate with HMC at temperature b1
        def logp(t):
            return log_prior_fn(t) + b1 * log_lik_fn(t)

        def move(i, qk):
            q, key = qk
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, Pn)
            q, _, _ = jax.vmap(
                hmc_kernel, in_axes=(None, 0, 0, None, None, None)
            )(logp, q, keys, eps, inv_mass, hmc_steps)
            return q, key

        q, key = lax.fori_loop(0, n_hmc_moves, move, (q, k_mv))
        return (q, log_w, logZ, key), ess

    init = (q0, jnp.zeros(Pn, q0.dtype), jnp.zeros((), q0.dtype), key)
    if staged:
        stage_j = jax.jit(stage)
        carry, ess_hist = init, []
        for s in range(num_stages):
            carry, ess = stage_j(carry, jnp.asarray(s))
            jax.block_until_ready(ess)       # keep each dispatch bounded
            ess_hist.append(ess)
        q, log_w, logZ, _ = carry
        return q, logZ, {"log_w": log_w, "ess_history": jnp.stack(ess_hist)}
    (q, log_w, logZ, _), ess_hist = lax.scan(
        stage, init, jnp.arange(num_stages))
    return q, logZ, {"log_w": log_w, "ess_history": ess_hist}
