"""Numeric utilities: jittered Cholesky, triangular solves, misc.

TPU-native counterpart of pyGPs ``pyGPs/Core/tools.py`` (jitchol,
solve_chol, brentmin).  Differences by design:

* ``safe_cholesky`` runs the jitter-escalation ladder *inside* jit with a
  ``lax.while_loop`` (reference ``tools.jitchol`` re-raises in Python after
  5 tries; here the ladder is data-dependent and jit-compatible: detect NaN
  rows in the factor, bump the diagonal ×10, retry).
* ``solve_chol`` maps to two triangular solves exactly like the reference
  (``tools.solve_chol(L,B)``) but uses XLA's batched ``triangular_solve``
  which tiles onto the MXU.
* ``brentmin`` is not reproduced: the Laplace line search is restructured as
  fixed backtracking under ``lax.while_loop`` (see inference/laplace.py),
  which is the jit-friendly equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pygps_tpu import config


def find_jitter(A: jax.Array, jitter0: float | None = None) -> jax.Array:
    """Smallest diagonal jitter (absolute units) from the ×10 escalation
    ladder that makes ``A + jitter*I`` factorise, found by trial
    factorizations under a ``lax.while_loop``.  Not differentiable — call
    through :func:`safe_cholesky`, which stop-gradients this search and then
    performs one final differentiable factorization.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    scale = jnp.mean(jnp.diag(A))
    scale = jnp.where(scale <= 0, jnp.asarray(1.0, A.dtype), scale)
    jit0 = jnp.asarray(
        jitter0 if jitter0 is not None else config.JITTER_INIT_SCALE, A.dtype
    ) * scale

    def ok_at(jit_amt):
        L = jnp.linalg.cholesky(A + jit_amt * eye)
        return jnp.all(jnp.isfinite(L))

    ok0 = ok_at(jnp.asarray(0.0, A.dtype))

    def cond(state):
        i, jit_amt, ok = state
        return jnp.logical_and(~ok, i < config.JITTER_MAX_TRIES)

    def body(state):
        i, jit_amt, _ = state
        return i + 1, jit_amt * config.JITTER_GROWTH, ok_at(jit_amt)

    _, jit_final, _ = lax.while_loop(cond, body, (jnp.asarray(0), jit0, ok0))
    # jit_final is one growth step past the accepted value
    return jnp.where(ok0, jnp.asarray(0.0, A.dtype),
                     jit_final / config.JITTER_GROWTH)


def safe_cholesky(A: jax.Array, jitter0: float | None = None):
    """Cholesky of a symmetric PSD matrix with escalating diagonal jitter.

    Returns ``(L, jitter_used)`` with ``L @ L.T ≈ A + jitter*I``, lower
    triangular.  Mirrors pyGPs ``tools.jitchol`` (×10 escalation) but is
    jit-compatible and reverse-mode differentiable: the jitter search runs on
    ``stop_gradient(A)``; the returned factor comes from a single final
    differentiable factorization.  If no ladder step succeeds the factor
    contains NaNs, which optimizers treat as a rejected step (the reference
    swallows the raised exception in its restart loop instead).
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    jitter = find_jitter(lax.stop_gradient(A), jitter0)
    L = jnp.linalg.cholesky(A + jitter * eye)
    return L, jitter


def cholesky(A: jax.Array) -> jax.Array:
    """Jittered Cholesky, factor only."""
    L, _ = safe_cholesky(A)
    return L


def solve_tril(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L X = B with L lower triangular."""
    return lax.linalg.triangular_solve(L, B, left_side=True, lower=True)


def solve_tril_T(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L^T X = B with L lower triangular."""
    return lax.linalg.triangular_solve(
        L, B, left_side=True, lower=True, transpose_a=True
    )


def solve_chol(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve (L L^T) X = B given lower Cholesky factor L.

    Reference: pyGPs tools.solve_chol (two dtrsm calls).
    """
    return solve_tril_T(L, solve_tril(L, B))


def log_det_from_chol(L: jax.Array) -> jax.Array:
    """log det(A) = 2 Σ log diag(L) for A = L L^T."""
    return 2.0 * jnp.sum(jnp.log(jnp.diag(L)))


def sq_dist(x: jax.Array, z: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distances, (n,d)×(m,d) → (n,m).

    MXU-friendly: the cross term is a single matmul; norms broadcast.
    Clamped at zero against catastrophic cancellation (important in f32).
    """
    xn = jnp.sum(x * x, axis=-1)
    zn = jnp.sum(z * z, axis=-1)
    d2 = xn[:, None] + zn[None, :] - 2.0 * (x @ z.T)
    return jnp.maximum(d2, 0.0)


def symmetrize(A: jax.Array) -> jax.Array:
    return 0.5 * (A + A.T)
