"""Iterative (matrix-free) exact-GP inference — BBMM/SLQ style.

No reference counterpart (pyGPs' only big-n story is FITC); this is the
modern iterative path from the retrieved literature (GPyTorch "Blackbox
Matrix-Matrix" inference; "Exact GPs on a Million Data Points"):

* quadratic term and posterior solves: preconditioned CG (exact to tol)
* log det: stochastic Lanczos quadrature (unbiased-ish MC estimate)
* gradients: the reference's Q-form identities with the trace estimated
  by Hutchinson probes sharing the CG machinery:
      ∂nlZ/∂θ = ½ E_z[zᵀ K̃⁻¹ (∂K̃/∂θ) z] − ½ αᵀ (∂K̃/∂θ) α
  implemented as a custom VJP whose K-cotangent is the low-rank
  estimator ½(Ẑ K̃⁻¹Ẑᵀ/P − ααᵀ) — only matvecs and (n × P) solves.

Memory: O(n·P); compute: O(n² · cg_iters) per evaluation — runs at n
where the dense Cholesky no longer fits.  For multi-chip, pair with a
row-sharded matvec (the Gram rows from parallel/ring_gram).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from pygps_tpu.utils.cg import cg_solve, slq_logdet, slq_logdet_adaptive
from pygps_tpu.utils.pchol import pivoted_cholesky, woodbury_preconditioner

_DEFAULTS = dict(num_probes=16, lanczos_iters=25, cg_tol=1e-6,
                 cg_iters=256)


def _matvec_fn(K, sn2):
    def mv(X):
        return K @ X + sn2 * X
    return mv


def _pchol_factor(K, rank):
    """Rank-``rank`` pivoted-Cholesky factor of K (no noise); (rank, n).
    Rank is clamped to n (over-asking is legal but wasteful)."""
    rank = min(int(rank), K.shape[0])
    row_fn = lambda p: lax.dynamic_index_in_dim(K, p, 0, keepdims=False)
    L, _ = pivoted_cholesky(row_fn, jnp.diag(K), rank)
    return lax.stop_gradient(L)


def _make_solver(K, sn2, cg_cfg):
    """(solver, logdet_fn) for K̃ = K + sn2·I with the rank-``cg_cfg[2]``
    pivoted-Cholesky Woodbury preconditioner (Jacobi when rank=0).

    Preconditioned SLQ runs on Ĉ = P^{-1/2} K̃ P^{-1/2} (spectrum clustered
    at 1 ⇒ far fewer Lanczos steps) and adds back log det P exactly."""
    n = K.shape[0]
    mv = _matvec_fn(K, sn2)
    rank = cg_cfg[2] if len(cg_cfg) > 2 else 0
    if rank > 0:
        Lpc = _pchol_factor(K, rank)
        apply_inv, apply_inv_sqrt, logdetP = woodbury_preconditioner(
            Lpc, lax.stop_gradient(sn2))

        def solver(B):
            X, _, _ = cg_solve(mv, B, tol=cg_cfg[0], max_iters=cg_cfg[1],
                               precond=apply_inv)
            return X

        mv_hat = lambda X: apply_inv_sqrt(mv(apply_inv_sqrt(X)))

        def logdet_fn(key, num_probes, lanczos_iters, tol_abs=None,
                      max_probes=256):
            if tol_abs is not None:
                ld, _, _ = slq_logdet_adaptive(
                    mv_hat, n, key, tol_abs, lanczos_iters=lanczos_iters,
                    min_probes=num_probes, max_probes=max_probes,
                    dtype=K.dtype)
                return logdetP + ld
            return logdetP + slq_logdet(mv_hat, n, key,
                                        num_probes=num_probes,
                                        lanczos_iters=lanczos_iters,
                                        dtype=K.dtype)
    else:
        Minv = 1.0 / (jnp.diag(K) + sn2)

        def solver(B):
            X, _, _ = cg_solve(mv, B, tol=cg_cfg[0], max_iters=cg_cfg[1],
                               M_inv_diag=Minv)
            return X

        def logdet_fn(key, num_probes, lanczos_iters, tol_abs=None,
                      max_probes=256):
            if tol_abs is not None:
                ld, _, _ = slq_logdet_adaptive(
                    mv, n, key, tol_abs, lanczos_iters=lanczos_iters,
                    min_probes=num_probes, max_probes=max_probes,
                    dtype=K.dtype)
                return ld
            return slq_logdet(mv, n, key, num_probes=num_probes,
                              lanczos_iters=lanczos_iters, dtype=K.dtype)
    return solver, logdet_fn


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _nlml_core(K, m, sn2, y, seed, num_probes, lanczos_iters, cg_cfg):
    return _nlml_fwd(K, m, sn2, y, seed, num_probes, lanczos_iters,
                     cg_cfg)[0]


def _nlml_fwd(K, m, sn2, y, seed, num_probes, lanczos_iters, cg_cfg):
    n = y.shape[0]
    r = y - m
    key = jax.random.PRNGKey(seed)
    solver, logdet_fn = _make_solver(K, sn2, cg_cfg)
    alpha = solver(r[:, None])[:, 0]
    tol = cg_cfg[3] if len(cg_cfg) > 3 else None
    if tol is not None:
        # adaptive probe count against the user tolerance: stop when the
        # SLQ standard error is below 2·tol·|nlZ-proxy| (the ½·logdet
        # term contributes half the nlZ error; the proxy is the
        # deterministic part of nlZ, which dominates at these scales)
        proxy = jnp.abs(0.5 * jnp.dot(r, alpha)
                        + 0.5 * n * jnp.log(2.0 * jnp.pi))
        tol_abs = 2.0 * tol * jnp.maximum(proxy, 1.0)
        max_probes = cg_cfg[4] if len(cg_cfg) > 4 else 256
        logdet = logdet_fn(key, num_probes, lanczos_iters,
                           tol_abs=tol_abs, max_probes=max_probes)
    else:
        logdet = logdet_fn(key, num_probes, lanczos_iters)
    nlZ = (0.5 * jnp.dot(r, alpha) + 0.5 * logdet
           + 0.5 * n * jnp.log(2.0 * jnp.pi))
    return nlZ, (K, sn2, alpha)


def _nlml_bwd(seed, num_probes, lanczos_iters, cg_cfg, res, g):
    """Hutchinson K-cotangent with the preconditioner as a CONTROL
    VARIATE (the BBMM-literature variance trick):

        E[K̃⁻¹] = P⁻¹ + E_z[(K̃⁻¹ − P⁻¹) z zᵀ]

    P⁻¹ is explicit (generalized Woodbury over the diagonal-corrected
    pivoted-Cholesky factor), so the probes only carry the residual
    K̃⁻¹ − P⁻¹.  At rank 60 / 8 probes this cuts the ∂nlZ/∂θ relative
    error ~30-300× vs the raw Hutchinson estimator (60% → 0.2% on the
    smooth-spectrum case, 95% → 3% on the short-lengthscale case;
    pinned in test_gradient_control_variate_accuracy)."""
    K, sn2, alpha = res
    n = alpha.shape[0]
    key = jax.random.PRNGKey(seed + 1)
    Z = jax.random.rademacher(key, (n, num_probes), dtype=K.dtype)
    solver, _ = _make_solver(K, sn2, cg_cfg)
    W = solver(Z)
    # control variate P = LᵀL + diag(d_res) + sn2·I with d_res the
    # pivoted-Cholesky residual diagonal: diag(P) = diag(K̃) exactly
    # (so the variate stays sharp when rank misses spectrum mass —
    # short lengthscales) AND the low-rank part captures the top
    # eigenspace (long lengthscales).  Strictly dominates both the
    # Jacobi and the scalar-Woodbury variates, so it is used regardless
    # of the CG preconditioner config (unbiasedness needs no matching);
    # a floor of rank 64 keeps the variate sharp even when CG runs
    # unpreconditioned.  At rank ≥ n the pchol is exact and the
    # cotangent becomes deterministic.
    rank = cg_cfg[2] if len(cg_cfg) > 2 else 0
    cv_rank = max(rank, min(n, 64))
    Lpc = _pchol_factor(K, cv_rank)
    D = jnp.diag(K) - jnp.sum(Lpc * Lpc, axis=0) + sn2    # (n,)
    Dinv = 1.0 / D
    B = Lpc * Dinv[None, :]                               # L D⁻¹, (k,n)
    M = B @ Lpc.T + jnp.eye(Lpc.shape[0], dtype=K.dtype)  # I + LD⁻¹Lᵀ
    Lm = jnp.linalg.cholesky(0.5 * (M + M.T))
    MinvB = jax.scipy.linalg.cho_solve((Lm, True), B)     # (k, n)
    # P⁻¹ = D⁻¹ − D⁻¹Lᵀ M⁻¹ L D⁻¹  (generalized Woodbury)
    R = W - (Dinv[:, None] * Z - B.T @ (MinvB @ Z))       # W − P⁻¹Z
    Pinv = jnp.diag(Dinv) - B.T @ MinvB
    trPinv = jnp.sum(Dinv) - jnp.sum(MinvB * B)
    # residual estimator: ⟨RZᵀ, D⟩ = ⟨ZRᵀ, D⟩ for symmetric D (every
    # ∂K̃/∂θ is), so no explicit symmetrization — saves one n×n buffer
    # at the scales where this path exists (HBM peak gates n)
    Kbar = g * 0.5 * (Pinv + R @ Z.T / num_probes
                      - alpha[:, None] * alpha[None, :])
    trKinv = trPinv + jnp.sum(R * Z) / num_probes
    sn2_bar = g * 0.5 * (trKinv - jnp.dot(alpha, alpha))
    m_bar = -g * alpha
    y_bar = g * alpha
    return Kbar, m_bar, sn2_bar, y_bar


_nlml_core.defvjp(_nlml_fwd, _nlml_bwd)


def nlml(mean, kernel, lik, x, y, seed=0, num_probes=16, lanczos_iters=25,
         cg_tol=1e-6, cg_iters=256, precond_rank=0, tol_nlz=None,
         max_probes=256):
    """Matrix-free exact-GP NLML (stochastic logdet/trace, exact solves).

    ``precond_rank > 0`` enables the rank-k pivoted-Cholesky Woodbury
    preconditioner (utils/pchol.py): CG converges in far fewer iterations
    on smooth kernels, and SLQ runs on the preconditioned operator with
    the exact log det P added back.

    ``tol_nlz`` (e.g. 3e-3) switches SLQ to ADAPTIVE probe counting: new
    Rademacher probes are drawn in chunks until the Monte-Carlo standard
    error of ½·logdet is below ``tol_nlz`` × |nlZ| (capped at
    ``max_probes``), so accuracy is a user tolerance instead of a fixed
    probe budget.  ``num_probes`` then acts as the minimum."""
    # raw cross-Gram, not Ktrain: CG/SLQ tolerate the 1e-7-level asymmetry
    # and diagonal rounding, and skipping the symmetrize + diagonal-pin
    # avoids two extra n×n buffers in the VJP (HBM peak gates n here)
    K = kernel._cross(x, x)
    m = mean(x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    cfg = (cg_tol, cg_iters, precond_rank)
    if tol_nlz is not None:
        cfg = cfg + (float(tol_nlz), int(max_probes))
    return _nlml_core(K, m, sn2, y, seed, num_probes, lanczos_iters, cfg)


from jax import tree_util


@tree_util.register_pytree_node_class
class NegInvOperator:
    """Implicit −K̃⁻¹ living in the Posterior's explicit-L slot.

    The reference's non-triangular posterior branch computes
    fs2 = kss + Σ(Ks ∘ (L·Ks)) (gp.py:~290-320, SURVEY.md §2.4); with
    L = −K̃⁻¹ that is the exact-GP variance.  Here ``L @ Ks`` is a batched
    preconditioned CG solve instead of a stored matrix, so the iterative
    engine honors the (alpha, sW, L) contract without ever factorizing."""

    def __init__(self, K, sn2, Lpc, cg_tol=1e-8, cg_iters=512):
        self.K = K
        self.sn2 = sn2
        self.Lpc = Lpc          # (rank, n) pivoted-Cholesky factor or None
        self.cg_tol = cg_tol
        self.cg_iters = cg_iters

    def tree_flatten(self):
        return (self.K, self.sn2, self.Lpc), (self.cg_tol, self.cg_iters)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, cg_tol=aux[0], cg_iters=aux[1])

    @property
    def shape(self):
        return self.K.shape

    def __matmul__(self, B):
        mv = _matvec_fn(self.K, self.sn2)
        kw = {}
        if self.Lpc is not None:
            kw["precond"] = woodbury_preconditioner(self.Lpc, self.sn2)[0]
        else:
            kw["M_inv_diag"] = 1.0 / (jnp.diag(self.K) + self.sn2)
        X, _, _ = cg_solve(mv, B, tol=self.cg_tol,
                           max_iters=self.cg_iters, **kw)
        return -X


def evaluate(mean, kernel, lik, x, y, seed=0, num_probes=16,
             lanczos_iters=25, cg_tol=1e-8, cg_iters=512,
             precond_rank=100, tol_nlz=None, max_probes=256):
    """(Posterior, nlZ) via the matrix-free path — the engine entry point.

    Gauss likelihood only (exact conjugate model, like inf.Exact).  The
    posterior carries alpha from a CG solve and an implicit −K̃⁻¹ operator
    (non-triangular L branch), so ``predict`` runs CG at prediction time
    instead of a stored Cholesky factor."""
    from pygps_tpu.core.likelihoods import Gauss
    from pygps_tpu.core.posteriors import Posterior

    if not isinstance(lik, Gauss):
        raise TypeError("iterative exact inference requires lik.Gauss "
                        "(use Laplace/EP engines for other likelihoods)")
    K = kernel._cross(x, x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    r = y - mean(x)
    Lpc = _pchol_factor(K, precond_rank) if precond_rank > 0 else None
    op = NegInvOperator(K, sn2, Lpc, cg_tol=cg_tol, cg_iters=cg_iters)
    alpha = -(op @ r[:, None])[:, 0]
    sW = jnp.full_like(r, 1.0 / jnp.sqrt(sn2))
    nlZ = nlml(mean, kernel, lik, x, y, seed=seed, num_probes=num_probes,
               lanczos_iters=lanczos_iters, cg_tol=cg_tol,
               cg_iters=cg_iters, precond_rank=precond_rank,
               tol_nlz=tol_nlz, max_probes=max_probes)
    return Posterior(alpha, sW, op, is_tril=False), nlZ


def posterior_solve(mean, kernel, lik, x, y, cg_tol=1e-8, cg_iters=512,
                    precond_rank=0):
    """alpha = K̃⁻¹(y − m) by (preconditioned) CG — exact posterior mean."""
    K = kernel._cross(x, x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    r = y - mean(x)
    kw = {}
    if precond_rank > 0:
        Lpc = _pchol_factor(K, precond_rank)
        kw["precond"] = woodbury_preconditioner(Lpc, sn2)[0]
    else:
        kw["M_inv_diag"] = 1.0 / (jnp.diag(K) + sn2)
    alpha, it, res = cg_solve(_matvec_fn(K, sn2), r[:, None], tol=cg_tol,
                              max_iters=cg_iters, **kw)
    return alpha[:, 0], it, res
