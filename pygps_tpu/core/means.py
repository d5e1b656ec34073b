"""Mean functions and their composition algebra.

TPU-native counterpart of pyGPs ``pyGPs/Core/mean.py``: Zero, One, Const,
Linear plus composites Sum/Product/Scale/Power (SumOfMean/ProductOfMean/
ScaleOfMean/PowerOfMean, incl. the ``mean ** d`` operator).  As with
kernels, hand-written ``getDerMatrix`` is replaced by autodiff over the
pytree leaves; a compat shim is provided.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygps_tpu import config
from pygps_tpu.core.functor import Functor, register, _p


class Mean(Functor):
    """Base mean functor. Subclasses implement ``_mean(x) -> (n,)``."""

    def _mean(self, x):
        raise NotImplementedError

    def mean(self, x):
        return self._mean(x)

    def __call__(self, x):
        return self._mean(x)

    # -- composition (reference mean.py operator overloads) ----------------
    def __add__(self, other):
        if isinstance(other, Mean):
            return SumM(self, other)
        return NotImplemented

    def __mul__(self, other):
        if isinstance(other, Mean):
            return ProductM(self, other)
        if isinstance(other, (int, float)):
            return ScaleM(self, scale=float(other))
        return NotImplemented

    def __rmul__(self, other):
        return self.__mul__(other)

    def __pow__(self, d):
        if isinstance(d, int) and d >= 1:
            return PowerM(self, d)
        return NotImplemented

    # -- pyGPs compat ------------------------------------------------------
    def getMean(self, x):
        return self.mean(config.asarray(x))[:, None]

    def getDerMatrix(self, x=None, der=0):
        from jax.flatten_util import ravel_pytree

        flat, unravel = ravel_pytree(self)

        def f(v):
            return unravel(v).mean(config.asarray(x))

        jac = jax.jacfwd(f)(flat)
        return jac[..., der][:, None]


@register
class Zero(Mean):
    """m(x) = 0. Reference mean.Zero (no hyp)."""

    def _mean(self, x):
        return jnp.zeros(x.shape[0], dtype=x.dtype)


@register
class One(Mean):
    """m(x) = 1. Reference mean.One (no hyp)."""

    def _mean(self, x):
        return jnp.ones(x.shape[0], dtype=x.dtype)


@register
class Const(Mean):
    """m(x) = c. Reference mean.Const (hyp = [c], NOT log-space)."""

    _hyp_fields = ("c",)

    def __init__(self, c=0.0):
        self.c = _p(c)

    def _mean(self, x):
        return jnp.full(x.shape[0], 1.0, dtype=x.dtype) * self.c


@register
class Linear(Mean):
    """m(x) = x · a. Reference mean.Linear (hyp = [a_1..d], NOT log-space)."""

    _hyp_fields = ("alpha",)

    def __init__(self, alpha=None, D=None):
        if alpha is None:
            alpha = jnp.ones(D if D is not None else 1)
        self.alpha = _p(alpha)

    def _mean(self, x):
        return x @ self.alpha.astype(x.dtype)


@register
class SumM(Mean):
    """m1 + m2. Reference mean.SumOfMean."""

    _hyp_fields = ("left", "right")

    def __init__(self, left, right):
        self.left = left
        self.right = right

    def _mean(self, x):
        return self.left._mean(x) + self.right._mean(x)


@register
class ProductM(Mean):
    """m1 · m2. Reference mean.ProductOfMean."""

    _hyp_fields = ("left", "right")

    def __init__(self, left, right):
        self.left = left
        self.right = right

    def _mean(self, x):
        return self.left._mean(x) * self.right._mean(x)


@register
class ScaleM(Mean):
    """a · m with the scale a hyperparameter. Reference mean.ScaleOfMean."""

    _hyp_fields = ("scale", "inner")

    def __init__(self, inner, scale=1.0):
        self.scale = _p(scale)
        self.inner = inner

    def _mean(self, x):
        return self.scale * self.inner._mean(x)


@register
class PowerM(Mean):
    """m ** d (elementwise, d a static positive int).
    Reference mean.PowerOfMean (created by ``mean ** d``)."""

    _hyp_fields = ("inner",)
    _static_fields = ("d",)

    def __init__(self, inner, d=2):
        self.inner = inner
        self.d = int(d)

    def _mean(self, x):
        return jnp.power(self.inner._mean(x), self.d)


__all__ = [
    "Mean", "Zero", "One", "Const", "Linear",
    "SumM", "ProductM", "ScaleM", "PowerM",
]
