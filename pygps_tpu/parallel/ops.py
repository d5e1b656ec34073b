"""Distributed prior-operator: Laplace/EP classification over the mesh.

Third implementation of the prior-operator interface
(inference/priors.py) after DenseOps and FITCOps: the Gram matrix lives
bc-row-sharded, B = I + sW K sW is factored by the distributed Cholesky,
solves ride psolve, and the EP marginal variances come from a
column-sharded triangular solve (the pinverse pattern, exploiting K's
symmetry: the bc row slab IS the transposed column slab).

With this, ``laplace.nlml_ops`` / ``ep.nlml_ops`` — written once — run
distributed GP *classification* at Gram sizes no single chip can hold
(the reference caps classification at single-node dense, inf.py:~250-700).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map, tree_util
from jax.sharding import Mesh, PartitionSpec as P

from pygps_tpu.parallel.pcholesky import (pcholesky_ad, plogdet_chol,
                                          psolve_chol)


@tree_util.register_pytree_node_class
class DistributedOps:
    """Prior operator over a bc-row-sharded K (p, m, b, n)."""

    def __init__(self, K_bc, mesh: Mesh, axis: str = "shard"):
        self.K_bc = K_bc
        self.mesh = mesh
        self.axis = axis

    def tree_flatten(self):
        return (self.K_bc,), (self.mesh, self.axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    # -- core ---------------------------------------------------------------
    def matvec(self, v):
        p, m, b, n = self.K_bc.shape
        axis = self.axis

        def body(Kl, v_):
            Kl = Kl[0]
            out_loc = jnp.einsum("mbn,n->mb", Kl, v_)       # my rows
            out_all = lax.all_gather(out_loc, axis)          # (p, m, b)
            return jnp.swapaxes(out_all, 0, 1).reshape(n)

        f = shard_map(body, mesh=self.mesh, in_specs=(P(axis), P()),
                      out_specs=P(), check_vma=False)
        return f(self.K_bc, v)

    def diag(self):
        p, m, b, n = self.K_bc.shape
        axis = self.axis

        def body(Kl):
            Kl = Kl[0]
            d = lax.axis_index(axis)
            gidx = d + p * jnp.arange(m)
            col = jax.vmap(lambda g: g * b + jnp.arange(b))(gidx)
            dloc = jax.vmap(
                lambda blk, c: jax.vmap(lambda row, cc: row[cc])(blk, c)
            )(Kl, col)                                       # (m, b)
            dall = lax.all_gather(dloc, axis)
            return jnp.swapaxes(dall, 0, 1).reshape(n)

        f = shard_map(body, mesh=self.mesh, in_specs=(P(axis),),
                      out_specs=P(), check_vma=False)
        return f(self.K_bc)

    def _B_bc(self, W):
        """bc layout of B = I + sW K sW."""
        p, m, b, n = self.K_bc.shape
        axis = self.axis
        sW = jnp.sqrt(jnp.maximum(W, 0.0))

        def body(Kl, sW_):
            Kl = Kl[0]
            d = lax.axis_index(axis)
            gidx = d + p * jnp.arange(m)
            rows_sW = jax.vmap(
                lambda g: lax.dynamic_slice(sW_, (g * b,), (b,)))(gidx)
            B = Kl * rows_sW[:, :, None] * sW_[None, None, :]
            col = jax.vmap(lambda g: g * b + jnp.arange(b))(gidx)
            eye_rows = (col[:, :, None] ==
                        jnp.arange(n)[None, None, :]).astype(Kl.dtype)
            return (B + eye_rows)[None]

        f = shard_map(body, mesh=self.mesh, in_specs=(P(axis), P()),
                      out_specs=P(axis), check_vma=False)
        return f(self.K_bc, sW)

    def with_W(self, W):
        sW = jnp.sqrt(jnp.maximum(W, 0.0))
        L = pcholesky_ad(self._B_bc(W), self.mesh, axis=self.axis)
        return (sW, L)

    def zero_W_aux(self):
        """with_W(0) in closed form (B = I ⇒ L = I): saves the cold-start
        EP sweep's distributed factorization.  _B_bc(0) assembles exactly
        the bc-layout identity (the K term is scaled to zero)."""
        n = self.K_bc.shape[-1]
        zeros = jnp.zeros(n, dtype=self.K_bc.dtype)
        return (zeros, self._B_bc(zeros))

    def apply_A(self, aux, v):
        sW, L = aux
        return sW * psolve_chol(L, sW * v, self.mesh, self.axis)

    def logdetB(self, aux):
        _, L = aux
        return plogdet_chol(L, self.mesh, self.axis)

    def diag_Sigma(self, aux):
        """diag(K − (sWK)ᵀ B⁻¹ (sWK)) = diagK − colsums (L⁻¹ sW K)².

        Column-sharded forward substitution (pinverse pattern): K's
        symmetry makes my RHS column slab the transpose of my bc row slab.

        At p=1 the reverse pass takes the analytic VJP below
        (:func:`_diag_sigma_p1`): plain autodiff through the blocked
        forward-substitution loop stacks an (n/b, n, n) residual — 8 GB
        at n=16384, a measured compile OOM in distributed EP
        (MEASUREMENTS round-5 distributed-classification section).
        """
        sW, L = aux
        if self.mesh.devices.size == 1:
            return _diag_sigma_p1(self.K_bc, sW, L, self.mesh, self.axis)
        return self._diag_sigma_impl(sW, L)

    def _diag_sigma_impl(self, sW, L):
        p, m, b, n = self.K_bc.shape
        nb = m * p
        nloc = m * b
        axis = self.axis

        def body(Ll, Kl, sW_):
            Ll, Kl = Ll[0], Kl[0]
            d = lax.axis_index(axis)
            gidx = d + p * jnp.arange(m)
            # RHS: (sW K)[:, mycols] = sW ⊙ K[:, mycols] = sW ⊙ (my rows)ᵀ
            R = (jnp.transpose(Kl, (2, 0, 1)).reshape(n, nloc)
                 * sW_[:, None])

            def fwd(k, Z):
                owner = k % p
                kloc = k // p
                cs = k * b
                row = lax.dynamic_index_in_dim(Ll, kloc, axis=0,
                                               keepdims=False)
                row = lax.psum(jnp.where(d == owner, row,
                                         jnp.zeros_like(row)), axis)
                S = row @ Z
                L_kk = lax.dynamic_slice(row, (cs * 0, cs), (b, b))
                R_k = lax.dynamic_slice(R, (cs, cs * 0), (b, nloc))
                Z_k = lax.linalg.triangular_solve(
                    L_kk, R_k - S, left_side=True, lower=True)
                return lax.dynamic_update_slice(Z, Z_k, (cs, cs * 0))

            Z = lax.fori_loop(0, nb, fwd, jnp.zeros((n, nloc), Kl.dtype))
            qdiag_loc = jnp.sum(Z * Z, axis=0)               # (nloc,)
            # my diag(K): entries of my row blocks at their own columns
            col = jax.vmap(lambda g: g * b + jnp.arange(b))(gidx)
            dK_loc = jax.vmap(
                lambda blk, c: jax.vmap(lambda row, cc: row[cc])(blk, c)
            )(Kl, col).reshape(nloc)
            out_loc = dK_loc - qdiag_loc
            out_all = lax.all_gather(out_loc.reshape(m, b), axis)
            return jnp.swapaxes(out_all, 0, 1).reshape(n)

        f = shard_map(body, mesh=self.mesh,
                      in_specs=(P(axis), P(axis), P()), out_specs=P(),
                      check_vma=False)
        return f(L, self.K_bc, sW)

    def posterior_L(self, aux):
        raise NotImplementedError(
            "distributed posteriors are handled by the DistGP* models; "
            "the (alpha, sW, L) dense contract does not apply")


# ---------------------------------------------------------------------------
# Analytic VJP for diag_Sigma at p=1 (O(n²)-memory reverse pass)
# ---------------------------------------------------------------------------


from functools import partial as _partial

from pygps_tpu.parallel.mesh import from_block_cyclic, to_block_cyclic


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _diag_sigma_p1(K_bc, sW, L_bc, mesh, axis):
    ops = DistributedOps(K_bc, mesh, axis)
    return ops._diag_sigma_impl(sW, L_bc)


def _diag_sigma_p1_fwd(K_bc, sW, L_bc, mesh, axis):
    return _diag_sigma_p1(K_bc, sW, L_bc, mesh, axis), (K_bc, sW, L_bc)


def _diag_sigma_p1_bwd(mesh, axis, res, sbar):
    """Reverse pass of sig = diag(K) − colsums(V²), V = L⁻¹ (sW ⊙ Kᵀ),
    written against the forward's EXACT dataflow (R built from the
    stored bc row slab TRANSPOSED — for a symmetric K the value is the
    textbook one, but the per-entry cotangent must follow the
    implementation):

        V̄ = −2 V · s̄        (column-scaled)
        T  = L⁻ᵀ V̄
        K̄ = diag(s̄) + Tᵀ · sW  (column-scaled — the transpose of
                                 ⟨sW ⊙ T, dKᵀ⟩)
        sW̄ᵢ = Σ_c T_ic Kᵀ_ic
        L̄  = −tril(T Vᵀ)      (flows on into pcholesky_ad's backward)

    The solves go through the blocked explicit inverse
    (ops/trtri.tril_inverse) + GEMMs, NOT lax.linalg.triangular_solve:
    XLA-TPU's triangular_solve lowering with an n×n RHS materializes
    the whole ladder of partial-update buffers (measured: 68 GB
    requested at n=16384) — the same reason the dense engine's backward
    uses the GEMM-rate inverse.  V is recomputed instead of stored;
    everything is O(n²) live — vs the O(n²·n/b) residual stack plain
    autodiff makes XLA save through the blocked substitution loop
    (8 GB at n=16384, measured compile OOM)."""
    from pygps_tpu.ops.trtri import tril_inverse

    K_bc, sW, L_bc = res
    p, m, b, n = K_bc.shape
    prec = lax.Precision.HIGHEST
    K = from_block_cyclic(K_bc)
    L = jnp.tril(from_block_cyclic(L_bc))
    Winv = tril_inverse(L, precision=prec)            # L⁻¹, blocked GEMMs
    Kt = K.T
    R = sW[:, None] * Kt
    V = jnp.matmul(Winv, R, precision=prec)           # L⁻¹ R
    Vbar = -2.0 * V * sbar[None, :]
    T = jnp.matmul(Winv.T, Vbar, precision=prec)      # L⁻ᵀ V̄
    Kbar = jnp.diag(sbar) + T.T * sW[None, :]
    sWbar = jnp.sum(T * Kt, axis=1)
    Lbar = -jnp.tril(jnp.matmul(T, V.T, precision=prec))
    return (to_block_cyclic(Kbar, b, p), sWbar, to_block_cyclic(Lbar, b, p))


_diag_sigma_p1.defvjp(_diag_sigma_p1_fwd, _diag_sigma_p1_bwd)
