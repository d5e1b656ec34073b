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
    if jitter0 is None:
        # dtype-aware ladder start: below ~eps·scale a jitter is invisible
        # to the arithmetic — in f32 the first rungs of the f64 ladder
        # (1e-10·scale) waste factorizations and can land on a finite but
        # inaccurate factor right at the margin
        jitter0 = config.JITTER_INIT_SCALE
        if A.dtype == jnp.float32:
            jitter0 = max(jitter0, 1e-7)
    jit0 = jnp.asarray(jitter0, A.dtype) * scale

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


@jax.custom_vjp
def _chol_guarded(A):
    """``jnp.linalg.cholesky`` whose reverse pass is safe to run even when
    the factorization FAILED (NaN factor): the VJP residual is sanitized
    to I on failure, so the zero cotangent arriving from the untaken
    ``lax.cond`` branch stays zero instead of 0·NaN → NaN.  This is what
    lets :func:`safe_cholesky` try the differentiable factorization FIRST
    and only pay the jitter ladder on failure — halving the happy-path
    cost (two factorizations → one; 29.8 → ~15 ms at n=8192 on v5e,
    MEASUREMENTS round-5)."""
    return jnp.linalg.cholesky(A)


def _chol_guarded_fwd(A):
    L = jnp.linalg.cholesky(A)
    ok = jnp.all(jnp.isfinite(L))
    Lsafe = jnp.where(ok, L, jnp.eye(A.shape[-1], dtype=A.dtype))
    return L, Lsafe


def _chol_guarded_bwd(Lsafe, Lbar):
    # Standard Cholesky reverse mode in jax.linalg's convention
    # (symmetrized output cotangent; upper-triangle cotangents ignored —
    # verified identical to jnp.linalg.cholesky autodiff in
    # tests/test_utils.py).
    L = Lsafe
    S = jnp.tril(jnp.matmul(L.T, jnp.tril(Lbar)))
    S = S - 0.5 * jnp.diag(jnp.diagonal(S))
    X = lax.linalg.triangular_solve(L, S, left_side=True, lower=True,
                                    transpose_a=True)          # L⁻ᵀ S
    Y = lax.linalg.triangular_solve(L, X, left_side=False, lower=True)
    return (0.5 * (Y + Y.T),)


_chol_guarded.defvjp(_chol_guarded_fwd, _chol_guarded_bwd)


def safe_cholesky(A: jax.Array, jitter0: float | None = None):
    """Cholesky of a symmetric PSD matrix with escalating diagonal jitter.

    Returns ``(L, jitter_used)`` with ``L @ L.T ≈ A + jitter*I``, lower
    triangular.  Mirrors pyGPs ``tools.jitchol`` (×10 escalation) but is
    jit-compatible and reverse-mode differentiable.  Unlike the classic
    probe-then-factor structure, the differentiable factorization runs
    FIRST and is reused when it succeeds (the overwhelmingly common
    case — one factorization instead of two, measured 2× on the v5e
    happy path); only on a non-finite factor does ``lax.cond`` enter the
    jitter ladder (search on ``stop_gradient(A)``, then one final
    differentiable factorization at the found jitter).  If no ladder
    step succeeds the factor contains NaNs, which optimizers treat as a
    rejected step (the reference swallows the raised exception in its
    restart loop instead).

    Hopeless-input guard: when ``A`` itself is non-finite (an optimizer
    that has already diverged keeps evaluating), no jitter can ever
    succeed, yet the ladder would pay all ``JITTER_MAX_TRIES`` trial
    factorizations per call — measured ~170 ms/eval at n=8192 vs the
    ~46 ms healthy path, the dominant cost of a diverged training loop
    (MEASUREMENTS.md round-5 bench-protocol note).  A non-finite ``A``
    therefore short-circuits to ``(NaN factor, NaN jitter)`` after a
    single O(n²) check, paid only on the already-failed branch.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    L0 = _chol_guarded(A)
    ok0 = jnp.all(jnp.isfinite(lax.stop_gradient(L0)))

    def happy(_):
        return L0, jnp.zeros((), A.dtype)

    def ladder(_):
        Asg = lax.stop_gradient(A)
        hopeless = ~jnp.all(jnp.isfinite(Asg))

        def give_up(_):
            return (jnp.full_like(L0, jnp.nan),
                    jnp.asarray(jnp.nan, A.dtype))

        def search(_):
            jitter = find_jitter(Asg, jitter0)
            return jnp.linalg.cholesky(A + jitter * eye), jitter

        return lax.cond(hopeless, give_up, search, None)

    return lax.cond(ok0, happy, ladder, None)


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
    The cross term is pinned to HIGHEST precision regardless of the global
    matmul default: a bf16-multiplied cross term makes the cancellation
    indefinite at the 1e-2 level (Cholesky NaNs); d is small, so true-f32
    passes cost nothing here.
    """
    if x.shape[-1] == 1:
        # d=1: the norm expansion's cancellation noise is ~eps·‖x‖²
        # ABSOLUTE, which swamps the true d² of close points (a uniform
        # grid over [0,1) at n=65536 has neighbor d² ≈ 2e-10 vs ~1e-7
        # noise — enough to push K's λ_min past sn² and make f32
        # factorizations/CG treat the Gram as indefinite, measured on
        # the circulant anchor).  The direct squared difference is
        # exact to RELATIVE eps and is O(n·m) like the expansion (the
        # rank-1 "matmul" has no MXU advantage to lose).
        d = x[:, 0][:, None] - z[:, 0][None, :]
        return d * d
    xn = jnp.sum(x * x, axis=-1)
    zn = jnp.sum(z * z, axis=-1)
    cross = jnp.matmul(x, z.T, precision=lax.Precision.HIGHEST)
    d2 = xn[:, None] + zn[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def symmetrize(A: jax.Array) -> jax.Array:
    return 0.5 * (A + A.T)


def brentmin(xlow, xupp, Nitmax, tol, f, *args):
    """Brent's 1-D minimization on [xlow, xupp] (host-side numpy).

    API-parity port surface for pyGPs ``tools.brentmin(xlow, xupp, Nitmax,
    tol, f, nout, *args)`` — kept for users of the reference utility; the
    jit-compiled Laplace engine uses backtracking instead (see
    inference/laplace.py).  Returns (fmin, xmin, num_funcs).

    Fresh implementation of the classic golden-section + parabolic
    interpolation scheme (Brent 1973; Numerical Recipes exposition).
    """
    import numpy as np

    golden = 0.3819660112501051
    a, b = float(xlow), float(xupp)
    x = w = v = a + golden * (b - a)
    fx = fw = fv = f(x, *args)
    if isinstance(fx, tuple):
        raise TypeError("brentmin expects a scalar-valued objective")
    nfuncs = 1
    d = e = 0.0
    for _ in range(int(Nitmax)):
        xm = 0.5 * (a + b)
        tol1 = tol * abs(x) + 1e-10
        if abs(x - xm) <= 2.0 * tol1 - 0.5 * (b - a):
            break
        use_golden = True
        if abs(e) > tol1:
            # parabolic fit through (v, fv), (w, fw), (x, fx)
            r = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * r
            q = 2.0 * (q - r)
            if q > 0:
                p = -p
            q = abs(q)
            e_old, e = e, d
            if (abs(p) < abs(0.5 * q * e_old) and p > q * (a - x)
                    and p < q * (b - x)):
                d = p / q
                u = x + d
                if (u - a) < 2 * tol1 or (b - u) < 2 * tol1:
                    d = tol1 if xm > x else -tol1
                use_golden = False
        if use_golden:
            e = (b - x) if x < xm else (a - x)
            d = golden * e
        u = x + d if abs(d) >= tol1 else x + (tol1 if d > 0 else -tol1)
        fu = f(u, *args)
        nfuncs += 1
        if fu <= fx:
            if u >= x:
                a = x
            else:
                b = x
            v, w, x = w, x, u
            fv, fw, fx = fw, fx, fu
        else:
            if u < x:
                a = u
            else:
                b = u
            if fu <= fw or w == x:
                v, w = w, u
                fv, fw = fw, fu
            elif fu <= fv or v == x or v == w:
                v, fv = u, fu
    return fx, x, nfuncs
