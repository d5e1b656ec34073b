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


def _factor_solve(K_bc, r, sn2, mesh_, axis, update_dtype=None,
                  gemm_precision=None, lookahead=False):
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
    L = pcholesky(B_bc, mesh_, axis, update_dtype=update_dtype,
                  gemm_precision=gemm_precision, lookahead=lookahead)
    alpha = psolve_chol(L, r, mesh_, axis)
    logdet = plogdet_chol(L, mesh_, axis)
    return L, alpha, logdet


def make_dist_nlml_core(mesh_: Mesh, axis: str = "shard",
                        update_dtype=None, gemm_precision=None,
                        lookahead=False):
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
                                         update_dtype, gemm_precision,
                                         lookahead)
        return (0.5 * jnp.dot(r, alpha) + 0.5 * logdet
                + 0.5 * n * jnp.log(2.0 * jnp.pi))

    def fwd(K_bc, mvec, sn2, y):
        n = y.shape[0]
        r = y - mvec
        L, alpha, logdet = _factor_solve(K_bc, r, sn2, mesh_, axis,
                                         update_dtype, gemm_precision,
                                         lookahead)
        nlZ = (0.5 * jnp.dot(r, alpha) + 0.5 * logdet
               + 0.5 * n * jnp.log(2.0 * jnp.pi))
        return nlZ, (L, alpha, sn2)

    def bwd(res, g):
        L, alpha, sn2 = res
        p, m, b, n = L.shape
        Kinv_bc = pinv_chol(L, mesh_, axis,
                            update_dtype=update_dtype,
                            gemm_precision=gemm_precision)  # K̃⁻¹ (p,m,b,n)

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

    ``precision``: "highest" (default — bf16_6x f32 GEMMs everywhere),
    "high", or "bf16".

    * "high" (RECOMMENDED for large n): all O(n³) GEMMs — trailing
      updates, panel solves, backward-inverse coupling — run at
      ``Precision.HIGH`` (bf16_3x on f32 operands, contraction error
      ~2⁻²¹): ~2× the HIGHEST MXU rate with near-f32 accuracy, and
      PSD-safe at any n of practical interest (λ_min perturbation
      ~2⁻²¹·√n·‖K‖ ≈ 1e-4 at n=100k).
    * "bf16" — operands CAST to bf16 (1-pass, fastest) with f32
      accumulation.  **Unsafe for ill-conditioned kernels at scale**:
      the factor's λ_min perturbation grows as ~2⁻⁹·√n·‖K‖, which
      crosses a noise floor sn²=0.14·‖K‖ near n≈2k and produces NaN
      factors (measured, round-3 bf16 trajectory study — on CPU too,
      so it is arithmetic, not a TPU bug).  Use only when
      sn² ≳ 2⁻⁹·√n·‖K‖ (large-noise / well-conditioned problems).

    ``layout``: "1d" (default — block-cyclic row layout, constant
    per-device panel traffic) or "2d" — the (pr × pc) process grid
    (SURVEY.md §2.2 TP row) where per-device per-panel volume drops to
    n·b/pr + n·b/pc, mandatory at pod scale.  With layout="2d", pass a
    2-axis mesh (see exact2d.make_grid_mesh) or let the engine build a
    near-square grid from the visible devices; Gram, factor, solves,
    inverse, and prediction all stay in the 2-D layout end-to-end.
    """

    def __init__(self, mesh_: Mesh | None = None, block: int = 256,
                 axis: str = "shard", precision: str = "highest",
                 layout: str = "1d", lookahead: str | bool = "auto",
                 inv_chunks: int = 8):
        if precision not in ("highest", "high", "bf16"):
            raise ValueError(f"unknown precision {precision!r}")
        if layout not in ("1d", "2d"):
            raise ValueError(f"unknown layout {layout!r}")
        self.block = block
        self.layout = layout
        self.update_dtype = jnp.bfloat16 if precision == "bf16" else None
        self.gemm_precision = (lax.Precision.HIGH if precision == "high"
                               else None)
        if layout == "2d":
            if lookahead is True:
                raise ValueError("lookahead is a 1-D-layout schedule; "
                                 "the 2-D engine has no lookahead "
                                 "variant (leave it 'auto')")
            self.lookahead = False
            from pygps_tpu.parallel import exact2d

            if mesh_ is None or len(mesh_.axis_names) != 2:
                import numpy as np

                if mesh_ is not None:
                    # reshape the USER'S devices into a near-square grid —
                    # silently regridding from jax.devices() could select
                    # different physical devices than the mesh they passed
                    devs = list(mesh_.devices.flatten())
                else:
                    devs = list(jax.devices())
                ndev = len(devs)
                pr = int(np.floor(np.sqrt(ndev)))
                while ndev % pr != 0:
                    pr -= 1
                mesh_ = exact2d.make_grid_mesh(pr, ndev // pr, devices=devs)
            self.mesh = mesh_
            self.axes = tuple(mesh_.axis_names)
            self._core = exact2d.make_dist_nlml_core2d(
                self.mesh, self.axes, update_dtype=self.update_dtype,
                gemm_precision=self.gemm_precision,
                inv_chunks=inv_chunks)
        else:
            self.mesh = mesh_ if mesh_ is not None else pmesh.make_mesh()
            self.axis = axis
            if lookahead == "auto":
                # compute-ahead schedule: the panel all_gather becomes
                # independent of the trailing GEMMs (overlappable on ICI)
                # — a pure win only when there ARE collectives; at p=1 it
                # costs ~6% extra dispatch/strip overhead for nothing
                lookahead = self.mesh.devices.size > 1
            self.lookahead = bool(lookahead)
            self._core = make_dist_nlml_core(
                self.mesh, axis, update_dtype=self.update_dtype,
                gemm_precision=self.gemm_precision,
                lookahead=self.lookahead)

    def _gram(self, kernel, x):
        if self.layout == "2d":
            from pygps_tpu.parallel.exact2d import gram_bc2d

            return gram_bc2d(kernel, x, self.mesh, self.block, self.axes)
        return gram_bc(kernel, x, self.mesh, self.block, self.axis)

    def nlml(self, mean, kernel, lik, x, y):
        sn2 = jnp.exp(2.0 * lik.log_sigma)
        K_sh = self._gram(kernel, x)
        mvec = mean(x)
        return self._core(K_sh, mvec, sn2, y)

    def posterior_parts(self, mean, kernel, lik, x, y):
        """(L_sharded, alpha, sn2): enough to predict (alpha replicated).
        Always full precision — posterior solves need the tight factor."""
        sn2 = jnp.exp(2.0 * lik.log_sigma)
        K_sh = self._gram(kernel, x)
        r = y - mean(x)
        if self.layout == "2d":
            from pygps_tpu.parallel.exact2d import _factor_solve2d

            L, alpha_tilde, _ = _factor_solve2d(K_sh, r, sn2, self.mesh,
                                                self.axes)
        else:
            L, alpha_tilde, _ = _factor_solve(K_sh, r, sn2, self.mesh,
                                              self.axis)
        return L, alpha_tilde, sn2

    def predict(self, mean, kernel, lik, x, y, xs, parts=None):
        """(ym, ys2, fm, fs2): full distributed predictive at xs.

        μ* = m(x*) + K*ᵀ K̃⁻¹ (y−m);  σ*² = k** − ‖L⁻¹K*‖² with L the
        distributed factor of K̃ = K + sn2·I (solved via psolve_tril /
        its 2-D-layout counterpart — no densification either way).
        """
        from pygps_tpu.parallel.pcholesky import psolve_tril
        from pygps_tpu.parallel.exact2d import psolve_tril2d

        if parts is None:
            parts = self.posterior_parts(mean, kernel, lik, x, y)
        L, alpha, sn2 = parts
        Ks = kernel.K(x, xs)
        kss = kernel.Kdiag(xs)
        ms = mean(xs)
        fmu = ms + Ks.T @ alpha
        if self.layout == "2d":
            V = psolve_tril2d(L, Ks, self.mesh, self.axes)
        else:
            V = psolve_tril(L, Ks, self.mesh, self.axis)
        fs2 = jnp.maximum(kss - jnp.sum(V * V, axis=0), 0.0)
        _, ymu, ys2 = lik.predict(fmu, fs2)
        return ymu, ys2, fmu, fs2
