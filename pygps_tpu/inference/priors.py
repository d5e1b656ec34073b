"""Prior-covariance operator abstraction for Laplace/EP engines.

The reference implements Laplace/EP twice — dense (inf.Laplace/inf.EP)
and FITC-structured (inf.FITC_Laplace/inf.FITC_EP, O(n·m²) via Woodbury,
inf.py:~900-1400).  Here both engines are written ONCE against this
operator interface; the two implementations of the interface carry the
structure:

* :class:`DenseOps` — explicit K (n×n).
* :class:`FITCOps` — K̂ = diag(D) + VᵀV with V = Luu⁻¹K_uf (m×n),
  D = diagKff − qff ≥ 0: every operation is O(n·m²) Woodbury algebra.

Interface (W = site/likelihood precision vector, sW = √W):
  matvec(v)        K̂ v
  diag()           diag K̂
  with_W(W) → aux  factorizations for B = I + sW K̂ sW
  apply_A(aux, v)  (sW B⁻¹ sW) v
  logdetB(aux)     log det B
  diag_Sigma(aux)  diag (K̂⁻¹ + W)⁻¹ = diag(K̂ − K̂·A·K̂)

All methods are pure/differentiable jnp programs — the operator data (K,
or (D, V)) are traced arrays, so hyperparameter gradients flow through
construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pygps_tpu.utils.tools import safe_cholesky, solve_chol, solve_tril


class DenseOps(NamedTuple):
    K: jax.Array

    def matvec(self, v):
        return self.K @ v

    def diag(self):
        return jnp.diag(self.K)

    def with_W(self, W):
        n = self.K.shape[0]
        sW = jnp.sqrt(jnp.maximum(W, 0.0))
        B = jnp.eye(n, dtype=self.K.dtype) + (sW[:, None] * self.K) * sW[None, :]
        L, _ = safe_cholesky(B)
        return (sW, L)

    def zero_W_aux(self):
        """with_W(0) in closed form (B = I): saves the cold-start EP
        sweep's factorization + TRSM — XLA cannot fold the runtime zeros."""
        n = self.K.shape[0]
        return (jnp.zeros(n, dtype=self.K.dtype),
                jnp.eye(n, dtype=self.K.dtype))

    def apply_A(self, aux, v):
        sW, L = aux
        return sW * solve_chol(L, sW * v)

    def logdetB(self, aux):
        _, L = aux
        return 2.0 * jnp.sum(jnp.log(jnp.diag(L)))

    def diag_Sigma(self, aux):
        sW, L = aux
        from pygps_tpu import config

        if config.EP_GEMM_DIAG_SIGMA:
            # explicit L⁻¹ + GEMM instead of the n×n TRSM.  Measured on
            # v5e at n=4096 (probe_ep_tuning): under HIGHEST precision
            # the 2n³ GEMM is NOT faster than the n³ TRSM (f32-HIGHEST
            # GEMM rate ~20 TF/s vs TRSM ~7), so this path runs the GEMM
            # at HIGH precision (bf16_3x, ~2⁻²¹ error — well inside
            # EP's 1e-4 convergence tolerance; DEFAULT on v5e is a
            # single bf16 pass, too lossy) where it wins.
            from pygps_tpu.ops.trtri import tril_inverse

            Winv = tril_inverse(L)
            V = jnp.matmul(Winv, sW[:, None] * self.K,
                           precision=jax.lax.Precision.HIGH)
        else:
            V = solve_tril(L, sW[:, None] * self.K)
        return jnp.diag(self.K) - jnp.sum(V * V, axis=0)

    # posterior factor for the (alpha, sW, L) contract
    def posterior_L(self, aux):
        return aux[1], True          # (L, is_tril)


class FITCOps(NamedTuple):
    D: jax.Array      # (n,) diagonal correction (≥ 0)
    V: jax.Array      # (m, n) with Qff = VᵀV

    def matvec(self, v):
        return self.D * v + self.V.T @ (self.V @ v)

    def diag(self):
        return self.D + jnp.sum(self.V * self.V, axis=0)

    def with_W(self, W):
        """B = I + sW K̂ sW = E + ŨᵀŨ, E = diag(1 + W·D), Ũ = V·sW.
        M = I_m + Ũ E⁻¹ Ũᵀ (chol Lm).  Stores everything needed for
        Woodbury applications."""
        W = jnp.maximum(W, 0.0)
        sW = jnp.sqrt(W)
        e = 1.0 + W * self.D
        U = self.V * sW[None, :]
        m = U.shape[0]
        Ue = U / e[None, :]
        M = jnp.eye(m, dtype=self.V.dtype) + Ue @ U.T
        Lm, _ = safe_cholesky(M)
        return (sW, e, U, Ue, Lm)

    def zero_W_aux(self):
        """with_W(0) in closed form (E = I, Ũ = 0, M = I)."""
        n = self.D.shape[0]
        m = self.V.shape[0]
        dt = self.V.dtype
        z = jnp.zeros((m, n), dt)
        return (jnp.zeros(n, dt), jnp.ones(n, dt), z, z,
                jnp.eye(m, dtype=dt))

    def _Binv(self, aux, v):
        sW, e, U, Ue, Lm = aux
        return v / e - Ue.T @ solve_chol(Lm, Ue @ v)

    def apply_A(self, aux, v):
        sW = aux[0]
        return sW * self._Binv(aux, sW * v)

    def logdetB(self, aux):
        _, e, _, _, Lm = aux
        return jnp.sum(jnp.log(e)) + 2.0 * jnp.sum(jnp.log(jnp.diag(Lm)))

    def diag_Sigma(self, aux):
        """diag(K̂ − K̂ A K̂) with A = F − Gᵀ M⁻¹ G,
        F = diag(W/e), G = Ũ E⁻¹ diag(sW) — all O(n·m²)."""
        sW, e, U, Ue, Lm = aux
        D, V = self.D, self.V
        f = (sW * sW) / e                       # (n,)
        G = Ue * sW[None, :]                    # (m, n)
        VVd = jnp.sum(V * V, axis=0)            # diag(VᵀV)
        diagK = D + VVd
        # term1: diag(K̂ F K̂) = f D² + 2 D f (VᵀV)_ii + v_iᵀ S_f v_i
        Sf = (V * f[None, :]) @ V.T             # (m, m)
        quad_f = jnp.sum(V * (Sf @ V), axis=0)
        term1 = f * D * D + 2.0 * D * f * VVd + quad_f
        # term2: diag(K̂ Gᵀ M⁻¹ G K̂) = colsums (Lm⁻¹ R)², R = G K̂
        R = G * D[None, :] + (G @ V.T) @ V      # (m, n)
        T = solve_tril(Lm, R)
        term2 = jnp.sum(T * T, axis=0)
        return diagK - (term1 - term2)

    def posterior_L(self, aux):
        """Dense lower factor of B for the posterior contract.  Only used
        at posterior-construction time (not in iteration loops); FITC
        models convert to the inducing-point representation anyway, so
        this returns the implicit pieces via a dense materialization of
        chol(B) — O(n²m) worst case, avoided in the FITC model path."""
        sW, e, U, Ue, Lm = aux
        n = self.D.shape[0]
        B = jnp.diag(e) + U.T @ U
        L, _ = safe_cholesky(B)
        return L, True
