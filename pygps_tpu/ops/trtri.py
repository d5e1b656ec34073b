"""Blocked triangular inverse and PSD inverse-from-Cholesky as GEMMs.

Why this exists (TPU performance, not parity): the analytic NLML gradient
(reference inf.Exact dnlZ assembly, inf.py:~180) needs the explicit
inverse K̃⁻¹ = L⁻ᵀL⁻¹.  XLA's ``triangular_solve`` with an n×n RHS runs at
~7 TF/s on v5e (MEASUREMENTS.md probe) — far below MXU GEMM rate — and
``solve_chol(L, I)`` costs 2·n³ FLOPs of it.  Here we instead

  1. invert L block-column-wise (``tril_inverse``): per block row one tiny
     b×b triangular solve + one trailing GEMM — ~2n³/3 FLOPs, nearly all
     of them MXU GEMM work;
  2. form B⁻¹ = WᵀW column-block-wise exploiting W's triangularity
     (``inv_from_chol``): Σⱼ 2·n·(n−j·b)·b ≈ n³ GEMM FLOPs (a dense
     matmul would pay 2n³).

Total ≈ 5n³/3 FLOPs at GEMM rate vs 2n³ at TRSM rate.  The block loops
are Python-level (static shapes, unrolled under jit): nb = n/b stays
small (≤ 32), so trace/compile cost is modest and every slice is static.

Numerics: explicit-inverse accuracy is governed by cond(B) exactly as in
the ``solve_chol(L, I)`` formulation it replaces (both compute the
explicit inverse; neither is iterative-refinement grade).  Used on
B = K/sn2 + I whose condition the jitter ladder already bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

#: Largest-first: on v5e every XLA cholesky/TRSM call costs ~1.5 ms
#: regardless of size ≤1024 (latency-bound, probe_chol_phases2), so
#: fewer, bigger base cases win as long as the GEMM fraction stays high.
_BLOCKS = (1024, 512, 256, 128, 64)


def _pick_block(n: int) -> int | None:
    for b in _BLOCKS:
        if n % b == 0 and n > b:
            return b
    return None


def tril_inverse(L: jax.Array, block: int | None = None,
                 precision=None) -> jax.Array:
    """W = L⁻¹ for lower-triangular L, blocked so the O(n³) work is GEMMs.

    Block row i of W:  W[i,i] = L[i,i]⁻¹;
                       W[i,:i] = −L[i,i]⁻¹ · (L[i,:i] @ W[:i,:i]).
    """
    n = L.shape[-1]
    b = block if block is not None else _pick_block(n)
    if b is None or n <= b:
        return lax.linalg.triangular_solve(
            L, jnp.eye(n, dtype=L.dtype), left_side=True, lower=True)
    nb = n // b
    eye_b = jnp.eye(b, dtype=L.dtype)
    W = jnp.zeros((n, n), dtype=L.dtype)
    for i in range(nb):
        Lii = L[i * b:(i + 1) * b, i * b:(i + 1) * b]
        Wii = lax.linalg.triangular_solve(
            Lii, eye_b, left_side=True, lower=True)
        if i > 0:
            Li_left = L[i * b:(i + 1) * b, :i * b]       # (b, i·b)
            S = jnp.matmul(Li_left, W[:i * b, :i * b],
                           precision=precision)          # GEMM
            W = W.at[i * b:(i + 1) * b, :i * b].set(
                -jnp.matmul(Wii, S, precision=precision))
        W = W.at[i * b:(i + 1) * b, i * b:(i + 1) * b].set(Wii)
    return W


def inv_from_chol(L: jax.Array, block: int | None = None,
                  precision=None) -> jax.Array:
    """B⁻¹ = L⁻ᵀ L⁻¹ from the lower Cholesky factor L, GEMM-dominated.

    B⁻¹ is symmetric, so only its lower-block-triangular part is
    computed and the strict upper part is mirrored: column block j needs
    rows ≥ j·b only, and W = L⁻¹ is lower triangular, so
      B⁻¹[j·b:, j·b:(j+1)·b] = W[j·b:, j·b:]ᵀ @ W[j·b:, j·b:(j+1)·b]
    — Σⱼ 2(n−j·b)²·b ≈ 2n³/3 FLOPs instead of the n³ of full columns
    (total with tril_inverse ≈ n³ at GEMM rate vs 2n³ at TRSM rate for
    ``solve_chol(L, I)``).
    """
    n = L.shape[-1]
    b = block if block is not None else _pick_block(n)
    if b is None or n <= b:
        W = lax.linalg.triangular_solve(
            L, jnp.eye(n, dtype=L.dtype), left_side=True, lower=True)
        return W.T @ W
    W = tril_inverse(L, b, precision=precision)
    nb = n // b
    cols = []
    for j in range(nb):
        Wtail = W[j * b:, j * b:]                        # (n−j·b, n−j·b)
        Wj = Wtail[:, :b]                                # (n−j·b, b)
        low = jnp.matmul(Wtail.T, Wj,
                         precision=precision)            # rows ≥ j·b only
        if j:
            low = jnp.concatenate(
                [jnp.zeros((j * b, b), L.dtype), low], axis=0)
        cols.append(low)
    Btri = jnp.concatenate(cols, axis=1)     # lower block triangle (+diag)
    # mirror; the block-diagonal b×b tiles are fully present in Btri and
    # would double under Btri + Btriᵀ — subtract them once
    rows = jnp.arange(n)
    same_block = (rows[:, None] // b) == (rows[None, :] // b)
    D = jnp.where(same_block, Btri, 0.0)
    return Btri + Btri.T - D


def rchol(A: jax.Array, base: int = 1024, update_dtype=None,
          precision=None) -> jax.Array:
    """Recursive blocked Cholesky with static shapes: lower L of SPD A.

    Why (v5e measurements, benchmarks/probe_chol_phases2.py): XLA's
    ``jnp.linalg.cholesky`` runs a b×b factor in ~1.5 ms regardless of b
    ∈ {512, 1024} — latency-bound, far off MXU rate — while large GEMMs
    run at 90+ TF/s (bf16).  The recursion moves all O(n³) work into two
    GEMM families (triangular-inverse panel solve + Schur update) and
    leaves only n/base sequential base-case factorizations:

        A = [A11 A12; A21 A22],  L11 = rchol(A11),
        L21 = A21 · L11⁻ᵀ        (tril_inverse: GEMM-rate, no TRSM),
        L22 = rchol(A22 − L21·L21ᵀ).

    ``update_dtype=jnp.bfloat16`` runs the Schur-update GEMM in bf16 with
    f32 accumulation (panel solve stays full precision) — the same
    mixed-precision contract as parallel/pcholesky.py.  Used for the
    distributed Cholesky's diagonal-block factorizations (where b is now
    free to grow to 2048–4096) and as a fast local factor.
    """
    n = A.shape[-1]
    if n <= base:
        return jnp.linalg.cholesky(A)
    # split at the largest multiple of `base` below n/2 (static)
    h = max(base, (n // 2) // base * base)
    A11 = A[:h, :h]
    A21 = A[h:, :h]
    A22 = A[h:, h:]
    L11 = rchol(A11, base, update_dtype, precision)
    iL11 = tril_inverse(L11)
    L21 = jnp.matmul(A21, iL11.T, precision=precision,
                     preferred_element_type=A.dtype)
    if update_dtype is not None:
        S = A22 - jnp.matmul(L21.astype(update_dtype),
                             L21.T.astype(update_dtype),
                             preferred_element_type=A.dtype)
    else:
        S = A22 - jnp.matmul(L21, L21.T, precision=precision,
                             preferred_element_type=A.dtype)
    L22 = rchol(S, base, update_dtype, precision)
    top = jnp.concatenate([L11, jnp.zeros((h, n - h), A.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)
