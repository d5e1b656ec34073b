"""Hamiltonian Monte Carlo over GP hyperparameters.

The reference's only hyperparameter-fitting story is gradient descent on
the NLML (opt.py); the north star (BASELINE.json) replaces/augments it with
sampling: chains vmapped within a chip and sharded across the mesh, with
dual-averaging step-size adaptation synchronized across ALL chains by psum
(SURVEY.md §2.2 "DP analog").

This module provides the shared machinery (leapfrog, dual averaging,
Welford diagonal mass adaptation, the chain-sharding wrapper) and plain
HMC; NUTS builds on it in nuts.py.

Everything is jit-compatible and vmappable: fixed step counts, masked
divergences, no data-dependent Python control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class _DA(NamedTuple):
    mu: jax.Array
    log_eps: jax.Array
    log_eps_bar: jax.Array
    h_bar: jax.Array
    t: jax.Array


def dual_averaging_init(eps0):
    le = jnp.log(eps0)
    z = jnp.zeros_like(le)
    return _DA(mu=jnp.log(10.0) + le, log_eps=le, log_eps_bar=z, h_bar=z,
               t=z)


def dual_averaging_update(s: _DA, accept_prob, target=0.8, gamma=0.05,
                          t0=10.0, kappa=0.75) -> _DA:
    t = s.t + 1.0
    h_bar = ((1.0 - 1.0 / (t + t0)) * s.h_bar
             + (target - accept_prob) / (t + t0))
    log_eps = s.mu - jnp.sqrt(t) / gamma * h_bar
    w = t ** (-kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * s.log_eps_bar
    return _DA(mu=s.mu, log_eps=log_eps, log_eps_bar=log_eps_bar,
               h_bar=h_bar, t=t)


class WelfordState(NamedTuple):
    count: jax.Array
    mean: jax.Array
    m2: jax.Array


def welford_init(dim, dtype=jnp.float64):
    return WelfordState(jnp.zeros((), dtype), jnp.zeros(dim, dtype),
                        jnp.zeros(dim, dtype))


def welford_update(s: WelfordState, x) -> WelfordState:
    c = s.count + 1.0
    d = x - s.mean
    mean = s.mean + d / c
    m2 = s.m2 + d * (x - mean)
    return WelfordState(c, mean, m2)


def welford_var(s: WelfordState):
    var = s.m2 / jnp.maximum(s.count - 1.0, 1.0)
    # shrink toward unit scale (Stan-style n/(n+5) weighting; unit target
    # because log-hyperparameters are already roughly unit-scaled)
    w = s.count / (s.count + 5.0)
    return w * var + (1.0 - w) * jnp.ones_like(var)


def leapfrog(q, p, eps, inv_mass, grad_fn, n_steps):
    """``n_steps`` leapfrog steps of H = U(q) + ½ pᵀ M⁻¹ p (diag M)."""

    def step(_, carry):
        q, p, g = carry
        p = p - 0.5 * eps * g
        q = q + eps * inv_mass * p
        g = grad_fn(q)
        p = p - 0.5 * eps * g
        return q, p, g

    g0 = grad_fn(q)
    q, p, g = lax.fori_loop(0, n_steps, step, (q, p, g0))
    return q, p


def hmc_kernel(logp_fn, q, key, eps, inv_mass, n_steps):
    """One HMC transition; returns (q_new, accept_prob, diverged)."""
    neg_logp = lambda qq: -logp_fn(qq)
    grad_fn = jax.grad(neg_logp)
    k1, k2 = jax.random.split(key)
    p = jax.random.normal(k1, q.shape, q.dtype) / jnp.sqrt(inv_mass)
    H0 = neg_logp(q) + 0.5 * jnp.sum(inv_mass * p * p)
    q_new, p_new = leapfrog(q, p, eps, inv_mass, grad_fn, n_steps)
    H1 = neg_logp(q_new) + 0.5 * jnp.sum(inv_mass * p_new * p_new)
    dH = H1 - H0
    diverged = jnp.logical_or(~jnp.isfinite(dH), dH > 1000.0)
    accept_prob = jnp.where(diverged, 0.0, jnp.minimum(1.0, jnp.exp(-dH)))
    accept = jax.random.uniform(k2, dtype=q.dtype) < accept_prob
    q_out = jnp.where(accept, q_new, q)
    return q_out, accept_prob, diverged


def sample_hmc(logp_fn, q0, key, num_warmup=300, num_samples=300,
               n_steps=16, eps0=0.1, target_accept=0.8,
               cross_chain_mean=None, warm_state=None):
    """Adaptive HMC for a batch of chains (q0: (C, dim), vmapped inside).

    ``cross_chain_mean(x)``: optional reduction used for the dual-averaging
    signal — pass a psum-based mean inside shard_map to synchronize step
    size across a sharded chain population (the north-star requirement);
    defaults to the local across-chain mean.
    """
    C, dim = q0.shape
    ccm = cross_chain_mean or (lambda x: jnp.mean(x))
    kern = jax.vmap(hmc_kernel, in_axes=(None, 0, 0, None, None, None))

    def warm_step(carry, key_t):
        q, da, wf = carry
        eps = jnp.exp(da.log_eps)
        keys = jax.random.split(key_t, C)
        q, ap, div = kern(logp_fn, q, keys, eps, welford_var(wf), n_steps)
        da = dual_averaging_update(da, ccm(ap), target=target_accept)

        # accumulate all chains into one Welford stream
        def upd(wf, qs):
            def body(i, s):
                return welford_update(s, qs[i])
            return lax.fori_loop(0, C, body, wf)
        wf = upd(wf, q)
        return (q, da, wf), ap

    def draw_step(carry, key_t):
        q, eps, inv_mass = carry
        keys = jax.random.split(key_t, C)
        q, ap, div = kern(logp_fn, q, keys, eps, inv_mass, n_steps)
        return (q, eps, inv_mass), (q, ap)

    k_warm, k_draw = jax.random.split(key)
    if warm_state is not None:
        # resume: adaptation state from a checkpoint, no re-warmup
        eps, inv_mass = warm_state
        q = q0
    else:
        da = dual_averaging_init(jnp.asarray(eps0, q0.dtype))
        wf = welford_init(dim, q0.dtype)
        (q, da, wf), _ = lax.scan(warm_step, (q0, da, wf),
                                  jax.random.split(k_warm, num_warmup))
        eps = jnp.exp(da.log_eps_bar)
        inv_mass = welford_var(wf)
    (q_final, _, _), (samples, accept) = lax.scan(
        draw_step, (q, eps, inv_mass), jax.random.split(k_draw, num_samples))
    return samples, {"accept_prob": accept, "step_size": eps,
                     "inv_mass": inv_mass, "q_final": q_final}
