"""Distributed exact GP inference over a device mesh.

The n=100k north star (BASELINE.md): the Gram matrix is born sharded
(ring_gram.gram_bc), factored by the distributed blocked Cholesky
(pcholesky), and NLML + gradients never materialise an unsharded n×n array.

Gradient strategy: reverse-differentiating through the panel loop would
checkpoint every panel state (O(n²·n/b) memory).  Instead the NLML as a
function of (K_bc, m, sn2, y) gets the *analytic* reference gradients
(inf.Exact dnlZ assembly, inf.py:~180, SURVEY.md §2.4) via jax.custom_vjp:

    Q         = K̃⁻¹ − ααᵀ           (K̃ = K + sn2·I, via pinv_chol)
    ∂nlZ/∂K   = Q/2
    ∂nlZ/∂m   = −α
    ∂nlZ/∂sn2 = tr(Q)/2
    ∂nlZ/∂y   = α

Autodiff then carries these cotangents through the (local, shard_map'ed)
Gram construction into kernel/mean hyperparameters — hand-derived matrix
calculus only where structurally necessary, autodiff everywhere else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pygps_tpu.parallel import mesh as pmesh
from pygps_tpu.parallel.pcholesky import pcholesky, plogdet_chol, psolve_chol
from pygps_tpu.parallel.pinverse import pinv_chol
from pygps_tpu.parallel.ring_gram import gram_bc


def _factor_solve(K_bc, r, sn2, mesh_, axis, update_dtype=None):
    """L of K̃/sn2 + ... — factor B = (K + sn2 I) directly in bc layout."""
    p, m, b, n = K_bc.shape

    def add_diag(Kl):
        Kl = Kl[0]
        d = lax.axis_index(axis)
        gidx = d + p * jnp.arange(m)
        col = jax.vmap(lambda g: g * b + jnp.arange(b))(gidx)      # (m, b)
        eye_rows = (col[:, :, None] ==
                    jnp.arange(n)[None, None, :]).astype(Kl.dtype)
        return (Kl + sn2 * eye_rows)[None]

    addI = shard_map(add_diag, mesh=mesh_, in_specs=(P(axis),),
                     out_specs=P(axis), check_vma=False)
    B_bc = addI(K_bc)
    L = pcholesky(B_bc, mesh_, axis, update_dtype=update_dtype)
    alpha = psolve_chol(L, r, mesh_, axis)
    logdet = plogdet_chol(L, mesh_, axis)
    return L, alpha, logdet


def make_dist_nlml_core(mesh_: Mesh, axis: str = "shard",
                        update_dtype=None):
    """Returns nlml_core(K_bc, m, sn2, y) -> nlZ with analytic VJP.

    ``update_dtype=jnp.bfloat16`` runs the Cholesky trailing-update GEMMs
    (the n³/(3p) FLOP hot spot) AND the backward inverse's coupling GEMMs
    (2n³/p) in bf16 with f32 accumulation — panels, diagonal
    factorizations, and triangular solves stay full precision.  Error
    budget characterized in
    tests/test_parallel.py::test_distributed_exact_bf16_updates."""

    @jax.custom_vjp
    def nlml_core(K_bc, mvec, sn2, y):
        n = y.shape[0]
        r = y - mvec
        L, alpha, logdet = _factor_solve(K_bc, r, sn2, mesh_, axis,
                                         update_dtype)
        return (0.5 * jnp.dot(r, alpha) + 0.5 * logdet
                + 0.5 * n * jnp.log(2.0 * jnp.pi))

    def fwd(K_bc, mvec, sn2, y):
        n = y.shape[0]
        r = y - mvec
        L, alpha, logdet = _factor_solve(K_bc, r, sn2, mesh_, axis,
                                         update_dtype)
        nlZ = (0.5 * jnp.dot(r, alpha) + 0.5 * logdet
               + 0.5 * n * jnp.log(2.0 * jnp.pi))
        return nlZ, (L, alpha, sn2)

    def bwd(res, g):
        L, alpha, sn2 = res
        p, m, b, n = L.shape
        Kinv_bc = pinv_chol(L, mesh_, axis,
                            update_dtype=update_dtype)  # (p,m,b,n) of K̃⁻¹

        def q_local(Ki, al):
            Ki = Ki[0]
            d = lax.axis_index(axis)
            gidx = d + p * jnp.arange(m)
            rows = jax.vmap(
                lambda gg: lax.dynamic_slice(al, (gg * b,), (b,)))(gidx)
            Q = Ki - rows[:, :, None] * al[None, None, :]
            # trace contribution: diagonal entries of my blocks
            col = jax.vmap(lambda gg: gg * b + jnp.arange(b))(gidx)
            dmask = (col[:, :, None] == jnp.arange(n)[None, None, :])
            tr = lax.psum(jnp.sum(jnp.where(dmask, Q, 0.0)), axis)
            return Q[None], tr[None]

        qf = shard_map(q_local, mesh=mesh_, in_specs=(P(axis), P()),
                       out_specs=(P(axis), P()), check_vma=False)
        Q_bc, trQ = qf(Kinv_bc, alpha)
        trQ = trQ[0]
        return (g * 0.5 * Q_bc, -g * alpha, g * 0.5 * trQ, g * alpha)

    nlml_core.defvjp(fwd, bwd)
    return nlml_core


class DistributedExact:
    """Distributed exact-GPR engine: nlml/posterior over a mesh.

    ``block`` is the Cholesky panel width (MXU-aligned, default 256 on TPU).
    Inputs must currently be pre-padded to a (block·p) multiple by the
    caller (models pad transparently via utils; see bench.py).

    ``precision``: "highest" (default, true-f32 trailing updates) or
    "bf16" — Cholesky trailing-update GEMMs AND the backward inverse's
    2n³/p coupling GEMMs run in bf16 with f32 accumulation (~2× MXU rate
    on v5e); panels, diagonal factorizations, and triangular solves stay
    f32.  Use where downstream tolerances allow (NLML for sampling /
    optimization steps — not tight posterior solves); error budget in
    tests/test_parallel.py::test_distributed_exact_bf16_updates.
    """

    def __init__(self, mesh_: Mesh | None = None, block: int = 256,
                 axis: str = "shard", precision: str = "highest"):
        self.mesh = mesh_ if mesh_ is not None else pmesh.make_mesh()
        self.block = block
        self.axis = axis
        if precision not in ("highest", "bf16"):
            raise ValueError(f"unknown precision {precision!r}")
        self.update_dtype = jnp.bfloat16 if precision == "bf16" else None
        self._core = make_dist_nlml_core(self.mesh, axis,
                                         update_dtype=self.update_dtype)

    def nlml(self, mean, kernel, lik, x, y):
        sn2 = jnp.exp(2.0 * lik.log_sigma)
        K_bc = gram_bc(kernel, x, self.mesh, self.block, self.axis)
        mvec = mean(x)
        return self._core(K_bc, mvec, sn2, y)

    def posterior_parts(self, mean, kernel, lik, x, y):
        """(L_bc, alpha, sn2): enough to predict (alpha replicated).
        Always full precision — posterior solves need the tight factor."""
        sn2 = jnp.exp(2.0 * lik.log_sigma)
        K_bc = gram_bc(kernel, x, self.mesh, self.block, self.axis)
        r = y - mean(x)
        L, alpha_tilde, _ = _factor_solve(K_bc, r, sn2, self.mesh, self.axis)
        return L, alpha_tilde, sn2

    def predict(self, mean, kernel, lik, x, y, xs, parts=None):
        """(ym, ys2, fm, fs2): full distributed predictive at xs.

        μ* = m(x*) + K*ᵀ K̃⁻¹ (y−m);  σ*² = k** − ‖L⁻¹K*‖² with L the
        distributed factor of K̃ = K + sn2·I (solved via psolve_tril).
        """
        from pygps_tpu.parallel.pcholesky import psolve_tril

        if parts is None:
            parts = self.posterior_parts(mean, kernel, lik, x, y)
        L, alpha, sn2 = parts
        Ks = kernel.K(x, xs)
        kss = kernel.Kdiag(xs)
        ms = mean(xs)
        fmu = ms + Ks.T @ alpha
        V = psolve_tril(L, Ks, self.mesh, self.axis)
        fs2 = jnp.maximum(kss - jnp.sum(V * V, axis=0), 0.0)
        _, ymu, ys2 = lik.predict(fmu, fs2)
        return ymu, ys2, fmu, fs2
