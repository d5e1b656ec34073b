"""Covariance functions (kernels) and their composition algebra.

TPU-native counterpart of pyGPs ``pyGPs/Core/cov.py``.  Full catalogue parity
(reference classes in parentheses): RBF, RBFunit, RBFard, Const, Linear,
LINard, Matern(d∈{1,3,5,7}), Periodic, RQ, RQard, Poly, PiecePoly, Noise,
SM (spectral mixture), Pre (precomputed Gram) and composites Sum/Product/
Scale (SumOfKernel/ProductOfKernel/ScaleOfKernel) plus the FITC wrapper
(FITCOfKernel).

Design deltas vs the reference (SURVEY.md §7.1):

* Kernels are pure-function pytrees — hyperparameter gradients come from
  ``jax.grad``; there is no ``getDerMatrix`` hand-derivative surface.  A
  compat shim ``getDerMatrix`` is provided (computed by autodiff) so the
  reference's unit-test structure (shape checks per hyp index) carries over.
* The three evaluation modes of the reference
  (``getCovMatrix(x, z, mode='train'|'cross'|'self_test')``,
  cov.py:~60-120) map to :meth:`Kernel.Ktrain`, :meth:`Kernel.K`,
  :meth:`Kernel.Kdiag`.
* All distance computations route through a single MXU-friendly
  ``sq_dist`` (one matmul + broadcast); the Pallas fused Gram kernel in
  ``ops/gram_pallas.py`` accelerates the train-mode path for large n.

Hyperparameters are stored in log space exactly where the reference stores
them in log space (lengthscales, signal/noise std-devs, periods, alpha).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from pygps_tpu import config
from pygps_tpu.core.functor import Functor, register, _p
from pygps_tpu.utils.tools import sq_dist


#: None = auto (default since round 3): fused Pallas Gram is used on TPU
#: whenever the tile count is large enough to pay for the kernel launch
#: (n·m ≥ _FUSED_AUTO_MIN_ELEMS).  True/False force it on/off globally.
_FUSED_GRAM = {"enabled": None}

#: Auto-mode size threshold (output elements).  Measured on v5e: the fused
#: kernel wins from ~512² up (1.8× at n=8192, MEASUREMENTS.md); below that
#: the XLA pipeline's fewer dispatches win.
_FUSED_AUTO_MIN_ELEMS = 512 * 512


def use_fused_gram(enabled: bool | None = True):
    """Route RBF(+unit/ard)/Matern{1,3,5,7}/RQ(+ard)/Periodic Gram
    evaluations through the Pallas fused kernel (ops/gram_pallas.py); ARD
    variants pre-scale inputs per-dimension and use the isotropic kernel
    at ℓ=1.  Composites (Sum/Product/Scale) inherit the fused path through
    their children.  ``None`` restores the default auto heuristic: fused
    on TPU when the output has ≥ 512² elements.  Safe under vmap since
    round 2: batching over the scalar hyperparameters (NUTS chains / hyp
    grids over shared inputs) uses a shared-distance batched Pallas kernel
    — each distance tile's MXU work is computed once and reused across the
    whole batch; batching over the inputs themselves falls back to a
    vmapped XLA pipeline.

    .. note:: Trace-time capture, like :func:`config.use_gemm_inverse`:
       already-compiled programs keep the path they were traced with."""
    _FUSED_GRAM["enabled"] = None if enabled is None else bool(enabled)


import contextlib


@contextlib.contextmanager
def fused_gram_override(enabled: bool | None):
    """Trace-time-scoped fused-Gram policy: force the Pallas fused path
    on/off (or back to auto with ``None``) only for ``_cross`` calls
    traced inside the block, restoring the previous policy on exit.

    Used by the streaming matvec (parallel/piterative.py), where the
    fused tile is a MEASURED loss: inside the checkpointed, barriered
    chunk loop the Pallas call cannot fuse with the trailing (tile @ X)
    GEMM, while the XLA route pipelines distance+map+matmul — n=65536
    RBF d=8 NLML+grad 34.5 s (fused) vs 27.1 s (XLA), MEASUREMENTS.md
    round-5 sweep.  Same trace-time-capture caveat as
    :func:`use_fused_gram`."""
    prev = _FUSED_GRAM["enabled"]
    _FUSED_GRAM["enabled"] = enabled if enabled is None else bool(enabled)
    try:
        yield
    finally:
        _FUSED_GRAM["enabled"] = prev


def _on_tpu():
    try:
        import jax as _jax

        return _jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fused_enabled(x=None, z=None):
    mode = _FUSED_GRAM["enabled"]
    if mode is False or not _on_tpu():
        return False
    if (x is not None and x.ndim == 2 and x.shape[-1] == 1):
        # correctness guard, even when forced on: the tile's
        # norm-expansion distance cancels catastrophically for 1-D
        # inputs with close points (see utils.tools.sq_dist's exact
        # d=1 path, which the XLA route uses instead)
        return False
    if mode is True:
        return True
    # auto: pay the Pallas launch only when the tile grid is big enough
    if x is None or z is None or x.ndim != 2 or z.ndim != 2:
        return False
    return x.shape[0] * z.shape[0] >= _FUSED_AUTO_MIN_ELEMS


class HashableArray:
    """Identity-hashed wrapper so a constant matrix can live in pytree aux
    data (used by Pre / FITC for non-trainable arrays)."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = jnp.asarray(value)

    def __hash__(self):
        return id(self.value)

    def __eq__(self, other):
        return self is other or (
            isinstance(other, HashableArray) and self.value is other.value
        )


class Kernel(Functor):
    """Base covariance functor.

    Subclasses implement ``_cross(x, z) -> (n, m)`` and optionally
    ``_diag(z) -> (m,)`` and ``_train(x) -> (n, n)``.
    """

    # -- core evaluation ---------------------------------------------------
    def _cross(self, x, z):
        raise NotImplementedError

    def _diag(self, z):
        return jnp.diagonal(self._cross(z, z))

    def _train(self, x):
        K = self._cross(x, x)
        K = 0.5 * (K + K.T)
        # pin the analytically exact diagonal: the f32 cancellation in
        # sq_dist leaves O(eps·‖x‖²) on what must be K(x,x) exactly, and
        # downstream jitter ladders are sensitive to it
        return jnp.fill_diagonal(K, self._diag(x), inplace=False)

    def K(self, x, z):
        """Cross-covariance K(x, z), shape (n, m). Reference mode='cross'."""
        return self._cross(x, z)

    def Kdiag(self, z):
        """diag K(z, z), shape (m,). Reference mode='self_test'."""
        return self._diag(z)

    def Ktrain(self, x):
        """Symmetric train Gram K(x, x). Reference mode='train'."""
        return self._train(x)

    def Ktrain_pinned(self, x):
        """Train Gram with the exact diagonal pinned but WITHOUT the
        symmetrize pass — the dense exact engine's fast path.

        ``_train``'s 0.5·(K+Kᵀ) costs two full n×n passes one of which
        is a strided transpose read, plus the same again in its VJP
        (~9 ms of the exact engine's 46 ms eval at n=8192, measured
        round 5).  Both Gram routes are already symmetric to ~8e-7 at
        n=8192 f32 (the cross-term GEMM computes (i,j) and (j,i) with
        the same reduction order), which is f32-eps-level noise against
        the engine's documented ~1e-4 envelope — and the factorization
        absorbs it like any other rounding.  The diagonal pin stays:
        sq_dist's cancellation leaves O(eps·‖x‖²) on what must be
        K(x,x) exactly, and the jitter ladder is sensitive to it.
        Iterative/CG engines already feed raw cross-Grams for the same
        reason (round-4); generic consumers keep :meth:`Ktrain`.

        Kernels that override ``_train`` with bespoke semantics (Pre's
        stored matrix, Noise's exact sn²·I) fall back to it; composites
        override this method to compose children's pinned Grams."""
        if type(self)._train is not Kernel._train:
            return self._train(x)
        K = self._cross(x, x)
        return jnp.fill_diagonal(K, self._diag(x), inplace=False)

    def __call__(self, x, z=None, diag=False):
        if diag:
            return self.Kdiag(x if z is None else z)
        if z is None:
            return self.Ktrain(x)
        return self.K(x, z)

    # -- composition algebra (reference cov.py:~30-100) --------------------
    def __add__(self, other):
        if isinstance(other, Kernel):
            return Sum(self, other)
        return NotImplemented

    def __radd__(self, other):
        return self.__add__(other)

    def __mul__(self, other):
        if isinstance(other, Kernel):
            return Product(self, other)
        if isinstance(other, (int, float)):
            return Scale(self, scale=float(other))
        return NotImplemented

    def __rmul__(self, other):
        return self.__mul__(other)

    # -- pyGPs compat shims ------------------------------------------------
    def getCovMatrix(self, x=None, z=None, mode=None):
        """Reference-compatible mode dispatch (cov.py getCovMatrix)."""
        if mode == "train":
            return self.Ktrain(config.asarray(x))
        if mode == "cross":
            return self.K(config.asarray(x), config.asarray(z))
        if mode == "self_test":
            return self.Kdiag(config.asarray(z))[:, None]
        raise ValueError(f"unknown mode {mode!r}")

    def getDerMatrix(self, x=None, z=None, mode=None, der=0):
        """∂K/∂hyp[der] via autodiff (replaces the reference's hand-written
        derivative matrices, cov.py getDerMatrix)."""
        from jax.flatten_util import ravel_pytree

        flat, unravel = ravel_pytree(self)

        def f(v):
            return unravel(v).getCovMatrix(x, z, mode)

        jac = jax.jacfwd(f)(flat)
        return jac[..., der]


# ---------------------------------------------------------------------------
# Stationary kernels
# ---------------------------------------------------------------------------


@register
class RBF(Kernel):
    """Squared-exponential: sf² exp(−r²/(2ℓ²)). Reference cov.RBF
    (hyp = [log_ell, log_sigma])."""

    _hyp_fields = ("log_ell", "log_sigma")

    def __init__(self, log_ell=0.0, log_sigma=0.0):
        self.log_ell = _p(log_ell)
        self.log_sigma = _p(log_sigma)

    def _cross(self, x, z):
        if _fused_enabled(x, z):
            from pygps_tpu.ops.gram_pallas import fused_gram

            return fused_gram("rbf", x, z, jnp.exp(-2.0 * self.log_ell),
                              jnp.exp(2.0 * self.log_sigma))
        ell = jnp.exp(self.log_ell)
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return sf2 * jnp.exp(-0.5 * sq_dist(x / ell, z / ell))

    def _diag(self, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * sf2


@register
class RBFunit(Kernel):
    """Unit-variance RBF: exp(−r²/(2ℓ²)). Reference cov.RBFunit
    (hyp = [log_ell])."""

    _hyp_fields = ("log_ell",)

    def __init__(self, log_ell=0.0):
        self.log_ell = _p(log_ell)

    def _cross(self, x, z):
        if _fused_enabled(x, z):
            from pygps_tpu.ops.gram_pallas import fused_gram

            return fused_gram("rbf", x, z, jnp.exp(-2.0 * self.log_ell),
                              jnp.asarray(1.0, x.dtype))
        ell = jnp.exp(self.log_ell)
        return jnp.exp(-0.5 * sq_dist(x / ell, z / ell))

    def _diag(self, z):
        return jnp.ones(z.shape[0], dtype=z.dtype)


@register
class RBFard(Kernel):
    """ARD squared-exponential with per-dimension lengthscales.
    Reference cov.RBFard (hyp = [log_ell_1..d, log_sigma])."""

    _hyp_fields = ("log_ell", "log_sigma")

    def __init__(self, log_ell=None, log_sigma=0.0, D=None):
        if log_ell is None:
            log_ell = jnp.zeros(D if D is not None else 1)
        self.log_ell = _p(log_ell)
        self.log_sigma = _p(log_sigma)

    def _cross(self, x, z):
        if _fused_enabled(x, z):
            from pygps_tpu.ops.gram_pallas import fused_gram

            # ARD = per-dimension input scaling + isotropic kernel at ℓ=1
            s = jnp.exp(-self.log_ell)[None, :]
            return fused_gram("rbf", x * s, z * s,
                              jnp.asarray(1.0, x.dtype),
                              jnp.exp(2.0 * self.log_sigma))
        ell = jnp.exp(self.log_ell)
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return sf2 * jnp.exp(-0.5 * sq_dist(x / ell, z / ell))

    def _diag(self, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * sf2


_MATERN_POLY = {
    1: lambda t: 1.0 + 0.0 * t,
    3: lambda t: 1.0 + t,
    5: lambda t: 1.0 + t + t * t / 3.0,
    7: lambda t: 1.0 + t + 2.0 * t * t / 5.0 + t * t * t / 15.0,
}


@register
class Matern(Kernel):
    """Matern family, half-integer order ν = d/2: sf² f_d(t) exp(−t) with
    t = √d · r/ℓ. Reference cov.Matern (d ∈ {1,3,5,7};
    hyp = [log_ell, log_sigma])."""

    _hyp_fields = ("log_ell", "log_sigma")
    _static_fields = ("d",)

    def __init__(self, log_ell=0.0, log_sigma=0.0, d=3):
        if d not in (1, 3, 5, 7):
            raise ValueError("Matern degree d must be in {1,3,5,7}")
        self.log_ell = _p(log_ell)
        self.log_sigma = _p(log_sigma)
        self.d = int(d)

    def _cross(self, x, z):
        if _fused_enabled(x, z):
            from pygps_tpu.ops.gram_pallas import fused_gram

            return fused_gram(f"matern{self.d}", x, z,
                              jnp.exp(-2.0 * self.log_ell),
                              jnp.exp(2.0 * self.log_sigma))
        ell = jnp.exp(self.log_ell)
        sf2 = jnp.exp(2.0 * self.log_sigma)
        r2 = sq_dist(x / ell, z / ell)
        t = jnp.sqrt(jnp.asarray(float(self.d), x.dtype) * r2 + 1e-36)
        return sf2 * _MATERN_POLY[self.d](t) * jnp.exp(-t)

    def _diag(self, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * sf2


@register
class Periodic(Kernel):
    """Periodic kernel: sf² exp(−2 sin²(π r / p) / ℓ²).
    Reference cov.Periodic (hyp = [log_ell, log_p, log_sigma])."""

    _hyp_fields = ("log_ell", "log_p", "log_sigma")

    def __init__(self, log_ell=0.0, log_p=0.0, log_sigma=0.0):
        self.log_ell = _p(log_ell)
        self.log_p = _p(log_p)
        self.log_sigma = _p(log_sigma)

    def _cross(self, x, z):
        if _fused_enabled(x, z):
            from pygps_tpu.ops.gram_pallas import fused_gram

            pre = (jnp.pi * jnp.exp(-self.log_p)) ** 2    # (π/p)²
            return fused_gram("periodic", x, z, pre,
                              jnp.exp(2.0 * self.log_sigma),
                              2.0 * jnp.exp(-2.0 * self.log_ell))
        ell2 = jnp.exp(2.0 * self.log_ell)
        p = jnp.exp(self.log_p)
        sf2 = jnp.exp(2.0 * self.log_sigma)
        r = jnp.sqrt(sq_dist(x, z) + 1e-36)
        s = jnp.sin(jnp.pi * r / p)
        return sf2 * jnp.exp(-2.0 * s * s / ell2)

    def _diag(self, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * sf2


@register
class RQ(Kernel):
    """Rational quadratic: sf² (1 + r²/(2αℓ²))^(−α).
    Reference cov.RQ (hyp = [log_ell, log_sigma, log_alpha])."""

    _hyp_fields = ("log_ell", "log_sigma", "log_alpha")

    def __init__(self, log_ell=0.0, log_sigma=0.0, log_alpha=0.0):
        self.log_ell = _p(log_ell)
        self.log_sigma = _p(log_sigma)
        self.log_alpha = _p(log_alpha)

    def _cross(self, x, z):
        if _fused_enabled(x, z):
            from pygps_tpu.ops.gram_pallas import fused_gram

            return fused_gram("rq", x, z, jnp.exp(-2.0 * self.log_ell),
                              jnp.exp(2.0 * self.log_sigma),
                              jnp.exp(self.log_alpha))
        ell = jnp.exp(self.log_ell)
        sf2 = jnp.exp(2.0 * self.log_sigma)
        alpha = jnp.exp(self.log_alpha)
        r2 = sq_dist(x / ell, z / ell)
        return sf2 * jnp.power(1.0 + 0.5 * r2 / alpha, -alpha)

    def _diag(self, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * sf2


@register
class RQard(Kernel):
    """ARD rational quadratic. Reference cov.RQard."""

    _hyp_fields = ("log_ell", "log_sigma", "log_alpha")

    def __init__(self, log_ell=None, log_sigma=0.0, log_alpha=0.0, D=None):
        if log_ell is None:
            log_ell = jnp.zeros(D if D is not None else 1)
        self.log_ell = _p(log_ell)
        self.log_sigma = _p(log_sigma)
        self.log_alpha = _p(log_alpha)

    def _cross(self, x, z):
        if _fused_enabled(x, z):
            from pygps_tpu.ops.gram_pallas import fused_gram

            s = jnp.exp(-self.log_ell)[None, :]
            return fused_gram("rq", x * s, z * s,
                              jnp.asarray(1.0, x.dtype),
                              jnp.exp(2.0 * self.log_sigma),
                              jnp.exp(self.log_alpha))
        ell = jnp.exp(self.log_ell)
        sf2 = jnp.exp(2.0 * self.log_sigma)
        alpha = jnp.exp(self.log_alpha)
        r2 = sq_dist(x / ell, z / ell)
        return sf2 * jnp.power(1.0 + 0.5 * r2 / alpha, -alpha)

    def _diag(self, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * sf2


@register
class PiecePoly(Kernel):
    """Compactly-supported piecewise-polynomial kernel (Wendland functions),
    v ∈ {0,1,2,3}. Reference cov.PiecePoly (hyp = [log_ell, log_sigma])."""

    _hyp_fields = ("log_ell", "log_sigma")
    _static_fields = ("v",)

    def __init__(self, log_ell=0.0, log_sigma=0.0, v=2):
        if v not in (0, 1, 2, 3):
            raise ValueError("PiecePoly v must be in {0,1,2,3}")
        self.log_ell = _p(log_ell)
        self.log_sigma = _p(log_sigma)
        self.v = int(v)

    @staticmethod
    def _poly(v, j, r):
        if v == 0:
            return jnp.ones_like(r)
        if v == 1:
            return (j + 1.0) * r + 1.0
        if v == 2:
            return ((j * j + 4.0 * j + 3.0) * r * r
                    + (3.0 * j + 6.0) * r + 3.0) / 3.0
        return ((j ** 3 + 9.0 * j * j + 23.0 * j + 15.0) * r ** 3
                + (6.0 * j * j + 36.0 * j + 45.0) * r * r
                + (15.0 * j + 45.0) * r + 15.0) / 15.0

    def _cross(self, x, z):
        if _fused_enabled(x, z):
            from pygps_tpu.ops.gram_pallas import fused_gram

            j = math.floor(x.shape[-1] / 2.0) + self.v + 1
            return fused_gram(f"pp{self.v}_{j}", x, z,
                              jnp.exp(-2.0 * self.log_ell),
                              jnp.exp(2.0 * self.log_sigma))
        ell = jnp.exp(self.log_ell)
        sf2 = jnp.exp(2.0 * self.log_sigma)
        D = x.shape[-1]
        j = math.floor(D / 2.0) + self.v + 1
        r = jnp.sqrt(sq_dist(x / ell, z / ell) + 1e-36)
        base = jnp.maximum(1.0 - r, 0.0)
        return sf2 * jnp.power(base, j + self.v) * self._poly(self.v, float(j), r)

    def _diag(self, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        D = z.shape[-1]
        j = math.floor(D / 2.0) + self.v + 1
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * sf2 * self._poly(
            self.v, float(j), jnp.asarray(0.0, z.dtype)
        )


@register
class SM(Kernel):
    """Spectral-mixture kernel (Wilson & Adams 2013):
    k(τ) = Σ_q w_q Π_d exp(−2π² τ_d² v_qd) cos(2π τ_d μ_qd).
    Reference cov.SM (hyp = [log_w (Q,), log_mean (Q·D,), log_var (Q·D,)])."""

    _hyp_fields = ("log_w", "log_mean", "log_var")

    def __init__(self, log_w=None, log_mean=None, log_var=None, Q=2, D=1):
        self.log_w = _p(jnp.zeros(Q) if log_w is None else log_w)
        self.log_mean = _p(jnp.zeros((Q, D)) if log_mean is None else log_mean)
        self.log_var = _p(jnp.zeros((Q, D)) if log_var is None else log_var)

    def _cross(self, x, z):
        w = jnp.exp(self.log_w)          # (Q,)
        mu = jnp.exp(self.log_mean)      # (Q, D)
        v = jnp.exp(self.log_var)        # (Q, D)
        # large outputs: the einsum path's (n, m, Q, D) cos intermediate
        # is the biggest transient in the zoo (8.6 GB at n=8192 Q=4 D=8)
        # — route through the fused Pallas tile on TPU / the O(n·m)
        # checkpointed scan elsewhere (ops/sm_pallas.py)
        if (x.ndim == 2 and z.ndim == 2
                and (_fused_enabled(x, z)
                     or x.shape[0] * z.shape[0] >= _FUSED_AUTO_MIN_ELEMS)):
            from pygps_tpu.ops.sm_pallas import sm_gram

            return sm_gram(x, z, w, mu, v)
        tau = x[:, None, :] - z[None, :, :]           # (n, m, D)
        # decay: exp of a sum over dims — a single einsum, (n, m, Q)
        decay = jnp.exp(-2.0 * jnp.pi ** 2 *
                        jnp.einsum("nmd,qd->nmq", tau * tau, v))
        # phase: product over dims of cos(2π τ_d μ_qd), (n, m, Q)
        phase = jnp.prod(
            jnp.cos(2.0 * jnp.pi * tau[:, :, None, :] * mu[None, None, :, :]),
            axis=-1,
        )
        return jnp.einsum("q,nmq->nm", w, decay * phase)

    def _diag(self, z):
        w = jnp.exp(self.log_w)
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * jnp.sum(w)

    @staticmethod
    def init_from_data(Q, x, y, seed=0):
        """Empirical-spectrum initialization (Wilson & Adams 2013 style,
        the reference ships an equivalent helper for cov.SM in its demos):
        weights ~ Var(y)/Q, frequency means uniform up to the empirical
        Nyquist rate, variances from a truncated-normal over the inverse
        data range."""
        rng = np.random.default_rng(seed)
        x = np.asarray(x)
        y = np.asarray(y).reshape(-1)
        D = x.shape[1]
        rng_span = x.max(axis=0) - x.min(axis=0)
        rng_span = np.maximum(rng_span, 1e-8)
        # smallest spacing per dim → Nyquist frequency
        nyq = np.empty(D)
        for d in range(D):
            s = np.sort(x[:, d])
            dmin = np.diff(s)
            dmin = dmin[dmin > 1e-12]
            nyq[d] = 0.5 / (dmin.min() if dmin.size else 1.0)
        w0 = np.full(Q, max(float(np.var(y)), 1e-8) / Q)
        mu0 = rng.uniform(1e-8, nyq[None, :], size=(Q, D))
        var0 = np.abs(rng.normal(size=(Q, D))) / rng_span[None, :] ** 2 + 1e-8
        return SM(log_w=np.log(w0), log_mean=np.log(mu0),
                  log_var=np.log(var0))


# ---------------------------------------------------------------------------
# Dot-product / constant / noise kernels
# ---------------------------------------------------------------------------


@register
class Const(Kernel):
    """Constant covariance sf². Reference cov.Const (hyp = [log_sigma])."""

    _hyp_fields = ("log_sigma",)

    def __init__(self, log_sigma=0.0):
        self.log_sigma = _p(log_sigma)

    def _cross(self, x, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full((x.shape[0], z.shape[0]), 1.0, dtype=x.dtype) * sf2

    def _diag(self, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * sf2


@register
class Linear(Kernel):
    """Linear kernel sf² x·zᵀ. Reference cov.Linear (hyp = [log_sigma])."""

    _hyp_fields = ("log_sigma",)

    def __init__(self, log_sigma=0.0):
        self.log_sigma = _p(log_sigma)

    def _cross(self, x, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return sf2 * (x @ z.T)

    def _diag(self, z):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return sf2 * jnp.sum(z * z, axis=-1)


@register
class LINard(Kernel):
    """ARD linear kernel (x/ℓ)·(z/ℓ)ᵀ. Reference cov.LINard
    (hyp = [log_ell_1..d])."""

    _hyp_fields = ("log_ell",)

    def __init__(self, log_ell=None, D=None):
        if log_ell is None:
            log_ell = jnp.zeros(D if D is not None else 1)
        self.log_ell = _p(log_ell)

    def _cross(self, x, z):
        ell = jnp.exp(self.log_ell)
        return (x / ell) @ (z / ell).T

    def _diag(self, z):
        ell = jnp.exp(self.log_ell)
        zs = z / ell
        return jnp.sum(zs * zs, axis=-1)


@register
class Poly(Kernel):
    """Polynomial kernel sf² (c + x·zᵀ)^d. Reference cov.Poly
    (hyp = [log_c, log_sigma]; degree d static)."""

    _hyp_fields = ("log_c", "log_sigma")
    _static_fields = ("d",)

    def __init__(self, log_c=0.0, log_sigma=0.0, d=2):
        self.log_c = _p(log_c)
        self.log_sigma = _p(log_sigma)
        self.d = int(d)

    def _cross(self, x, z):
        c = jnp.exp(self.log_c)
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return sf2 * jnp.power(c + x @ z.T, self.d)

    def _diag(self, z):
        c = jnp.exp(self.log_c)
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return sf2 * jnp.power(c + jnp.sum(z * z, axis=-1), self.d)


@register
class Noise(Kernel):
    """White noise sn² δ(x, z). Reference cov.Noise (hyp = [log_sigma]):
    train mode → sn²·I, cross mode → 0, self_test → sn²."""

    _hyp_fields = ("log_sigma",)

    def __init__(self, log_sigma=0.0):
        self.log_sigma = _p(log_sigma)

    def _cross(self, x, z):
        return jnp.zeros((x.shape[0], z.shape[0]), dtype=x.dtype) * jnp.exp(self.log_sigma)

    def _diag(self, z):
        sn2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full(z.shape[0], 1.0, dtype=z.dtype) * sn2

    def _train(self, x):
        sn2 = jnp.exp(2.0 * self.log_sigma)
        return sn2 * jnp.eye(x.shape[0], dtype=x.dtype)


@register
class Pre(Kernel):
    """Precomputed-kernel hand-off (graph kernels). Reference cov.Pre:
    constructed from ``M1`` ((n_train+1) × n_test: cross-covariances with the
    test self-variances in the last row) and ``M2`` (n_train × n_train Gram).
    The matrices are constants (no trainable hyperparameters); train/cross/
    self_test modes slice them.  Inputs ``x``/``z`` are used only for their
    leading dimension (index semantics), matching the reference.
    """

    _hyp_fields = ()
    _static_fields = ("M1", "M2")

    def __init__(self, M1, M2):
        self.M1 = M1 if isinstance(M1, HashableArray) else HashableArray(M1)
        self.M2 = M2 if isinstance(M2, HashableArray) else HashableArray(M2)

    def _train(self, x):
        n = x.shape[0]
        return self.M2.value[:n, :n].astype(x.dtype)

    def _cross(self, x, z):
        n, m = x.shape[0], z.shape[0]
        return self.M1.value[:n, :m].astype(x.dtype)

    def _diag(self, z):
        m = z.shape[0]
        return self.M1.value[-1, :m].astype(z.dtype)


# ---------------------------------------------------------------------------
# Composites
# ---------------------------------------------------------------------------


@register
class Sum(Kernel):
    """k1 + k2. Reference cov.SumOfKernel."""

    _hyp_fields = ("left", "right")

    def __init__(self, left, right):
        self.left = left
        self.right = right

    def _cross(self, x, z):
        return self.left._cross(x, z) + self.right._cross(x, z)

    def _diag(self, z):
        return self.left._diag(z) + self.right._diag(z)

    def _train(self, x):
        return self.left._train(x) + self.right._train(x)

    def Ktrain_pinned(self, x):
        return self.left.Ktrain_pinned(x) + self.right.Ktrain_pinned(x)


@register
class Product(Kernel):
    """k1 · k2. Reference cov.ProductOfKernel."""

    _hyp_fields = ("left", "right")

    def __init__(self, left, right):
        self.left = left
        self.right = right

    def _cross(self, x, z):
        return self.left._cross(x, z) * self.right._cross(x, z)

    def _diag(self, z):
        return self.left._diag(z) * self.right._diag(z)

    def _train(self, x):
        return self.left._train(x) * self.right._train(x)

    def Ktrain_pinned(self, x):
        # diag(K1 ∘ K2) = diag(K1) ∘ diag(K2): children's pins compose
        return self.left.Ktrain_pinned(x) * self.right.Ktrain_pinned(x)


@register
class Scale(Kernel):
    """a · k with the scale itself a (log-)hyperparameter.
    Reference cov.ScaleOfKernel (created by ``number * kernel``)."""

    _hyp_fields = ("log_scale", "inner")

    def __init__(self, inner, scale=1.0, log_scale=None):
        self.log_scale = _p(
            log_scale if log_scale is not None else math.log(scale)
        )
        self.inner = inner

    def _cross(self, x, z):
        return jnp.exp(self.log_scale) * self.inner._cross(x, z)

    def _diag(self, z):
        return jnp.exp(self.log_scale) * self.inner._diag(z)

    def _train(self, x):
        return jnp.exp(self.log_scale) * self.inner._train(x)

    def Ktrain_pinned(self, x):
        return jnp.exp(self.log_scale) * self.inner.Ktrain_pinned(x)


@register
class FITC(Kernel):
    """FITC wrapper around any kernel with fixed inducing inputs ``xu``.
    Reference cov.FITCOfKernel: train mode returns the triple
    (diag Kff, Kuu, Kuf); cross mode returns K(u, xs) so that FITC
    posteriors (over inducing values) predict with the same formulas.

    ``xu`` is non-trainable (as in the reference); SVGP (inference/svgp.py)
    owns trainable inducing points separately.
    """

    _hyp_fields = ("inner",)
    _static_fields = ("xu",)

    def __init__(self, inner, xu):
        self.inner = inner
        self.xu = xu if isinstance(xu, HashableArray) else HashableArray(
            config.asarray(xu)
        )

    @property
    def inducing(self):
        return self.xu.value

    def fitc_train(self, x):
        """(diag Kff, Kuu, Kuf) — the reference's train-mode triple."""
        u = self.xu.value.astype(x.dtype)
        diagKff = self.inner._diag(x)
        Kuu = self.inner._train(u)
        Kuf = self.inner._cross(u, x)
        return diagKff, Kuu, Kuf

    def _train(self, x):
        raise TypeError(
            "FITC kernels expose fitc_train(x) -> (diagKff, Kuu, Kuf); "
            "dense Ktrain is deliberately unavailable."
        )

    def _cross(self, x, z):
        # Cross-covariance between inducing points and test inputs: the FITC
        # posterior lives on the inducing values (reference gp.py predict +
        # inf.FITC_* contract).
        u = self.xu.value.astype(z.dtype)
        return self.inner._cross(u, z)

    def _diag(self, z):
        return self.inner._diag(z)

    def getCovMatrix(self, x=None, z=None, mode=None):
        if mode == "train":
            return self.fitc_train(config.asarray(x))
        return super().getCovMatrix(x, z, mode)


__all__ = [
    "Kernel", "RBF", "RBFunit", "RBFard", "Const", "Linear", "LINard",
    "Matern", "Periodic", "RQ", "RQard", "Poly", "PiecePoly", "Noise",
    "SM", "Pre", "Sum", "Product", "Scale", "FITC", "HashableArray",
]
