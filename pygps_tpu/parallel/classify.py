"""Distributed GP classification: Laplace / parallel-EP over the mesh.

The generic engines (inference/laplace.py, inference/ep.py) run unchanged
over :class:`parallel.ops.DistributedOps` — the Gram matrix never exists
unsharded.  No reference counterpart (pyGPs classification is dense
single-node only).
"""

from __future__ import annotations

import jax.numpy as jnp

from pygps_tpu.inference import ep as _ep
from pygps_tpu.inference import laplace as _laplace
from pygps_tpu.parallel.ops import DistributedOps
from pygps_tpu.parallel.ring_gram import gram_bc


def _ops(kernel, x, mesh, block, axis):
    K_bc = gram_bc(kernel, x, mesh, block, axis)
    return DistributedOps(K_bc, mesh, axis)


def laplace_nlml(mean, kernel, lik, x, y, mesh, block=256, axis="shard"):
    ops = _ops(kernel, x, mesh, block, axis)
    return _laplace.nlml_ops(mean(x), ops, lik, y)


def laplace_predict_parts(mean, kernel, lik, x, y, mesh, block=256,
                          axis="shard"):
    """(alpha, W): enough for predictive marginals —
    fmu* = m* + Ksᵀ alpha;  fs2* = kss − Σ V², V = L⁻¹ sW Ks with L the
    distributed factor of B(W)."""
    ops = _ops(kernel, x, mesh, block, axis)
    m = mean(x)
    f = _laplace._mode(m, ops, lik, y)
    _, d1, d2, _ = lik.laplace_derivs(y, f)
    W = jnp.maximum(-d2, 0.0)
    return d1, W, ops


def ep_nlml(mean, kernel, lik, x, y, mesh, block=256, axis="shard",
            ttau0=None, tnu0=None):
    ops = _ops(kernel, x, mesh, block, axis)
    return _ep.nlml_ops(ops, mean(x), lik, y, ttau0, tnu0)


def predict(mean, kernel, lik, x, xs, alpha, W, ops):
    """Predictive (lp=None, ymu, ys2, fmu, fs2) from Laplace/EP parts."""
    from pygps_tpu.parallel.pcholesky import psolve_tril

    aux = ops.with_W(W)
    sW, L = aux
    Ks = kernel.K(x, xs)
    kss = kernel.Kdiag(xs)
    fmu = mean(xs) + Ks.T @ alpha
    V = psolve_tril(L, sW[:, None] * Ks, ops.mesh, ops.axis)
    fs2 = jnp.maximum(kss - jnp.sum(V * V, axis=0), 0.0)
    lp, ymu, ys2 = lik.predict(fmu, fs2)
    return lp, ymu, ys2, fmu, fs2
