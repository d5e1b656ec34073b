"""Fused Gram-matrix Pallas kernel (pairwise distance + kernel map).

TPU-native replacement for the BLAS-dgemm-based kernel evaluation of the
reference (cov.py sq_dist + elementwise, SURVEY.md §2.1): one kernel
computes a K tile end-to-end — x-tiles enter VMEM once, the cross term
runs on the MXU, norms/exponential on the VPU, and only the finished tile
is written back to HBM (a dense XLA pipeline writes the distance matrix
and the kernel matrix separately; the fusion halves HBM traffic on the
n² path).

Supported stationary families (static ``kind``): 'rbf', 'matern1/3/5',
'rq'.  Forward runs in Pallas; hyperparameter/input gradients come from a
``jax.custom_vjp`` whose backward re-derives the analytic tile math in
plain XLA (one extra fused pass, no O(n²) residuals).

Falls back to interpret mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 256
_BN = 256


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _apply_kind(kind, d2, sf2, alpha):
    """k(d2) for squared distance d2 (already lengthscale-scaled)."""
    if kind == "rbf":
        return sf2 * jnp.exp(-0.5 * d2)
    t = jnp.sqrt({"matern1": 1.0, "matern3": 3.0, "matern5": 5.0,
                  "matern7": 7.0}.get(kind, 1.0) * d2 + 1e-36)
    if kind == "matern1":
        return sf2 * jnp.exp(-t)
    if kind == "matern3":
        return sf2 * (1.0 + t) * jnp.exp(-t)
    if kind == "matern5":
        return sf2 * (1.0 + t + t * t / 3.0) * jnp.exp(-t)
    if kind == "matern7":
        t2 = t * t
        return sf2 * (1.0 + t + 0.4 * t2 + t2 * t / 15.0) * jnp.exp(-t)
    if kind == "rq":
        return sf2 * jnp.exp(-alpha * jnp.log1p(0.5 * d2 / alpha))
    if kind == "periodic":
        # encoding: d2 arrives pre-scaled by (π/p)² (via inv_ell2 slot),
        # alpha = 2/ℓ² → k = sf² exp(−(2/ℓ²) sin²(π r / p))
        s = jnp.sin(jnp.sqrt(d2 + 1e-36))
        return sf2 * jnp.exp(-alpha * s * s)
    if kind.startswith("pp"):
        # piecewise polynomial (Wendland), kind "pp{v}_{j}" with v, j
        # STATIC (j = floor(D/2)+v+1 is shape-derived) — exponent and
        # polynomial coefficients compile to constants
        v_, j_ = kind[2:].split("_")
        v_, j_ = int(v_), float(int(j_))
        r = jnp.sqrt(d2 + 1e-36)
        base = jnp.maximum(1.0 - r, 0.0)
        if v_ == 0:
            poly = jnp.ones_like(r)
        elif v_ == 1:
            poly = (j_ + 1.0) * r + 1.0
        elif v_ == 2:
            poly = ((j_ * j_ + 4.0 * j_ + 3.0) * r * r
                    + (3.0 * j_ + 6.0) * r + 3.0) / 3.0
        else:
            poly = ((j_ ** 3 + 9.0 * j_ * j_ + 23.0 * j_ + 15.0) * r ** 3
                    + (6.0 * j_ * j_ + 36.0 * j_ + 45.0) * r * r
                    + (15.0 * j_ + 45.0) * r + 15.0) / 15.0
        return sf2 * base ** (int(j_) + v_) * poly
    raise ValueError(kind)


def _tile_kernel(kind, x_ref, z_ref, scal_ref, out_ref):
    xi = x_ref[...]
    zj = z_ref[...]
    inv_ell2 = scal_ref[0, 0]
    sf2 = scal_ref[0, 1]
    alpha = scal_ref[0, 2]
    xn = jnp.sum(xi * xi, axis=1)[:, None]
    zn = jnp.sum(zj * zj, axis=1)[None, :]
    cross = jax.lax.dot_general(
        xi, zj, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xn + zn - 2.0 * cross, 0.0) * inv_ell2
    out_ref[...] = _apply_kind(kind, d2, sf2, alpha).astype(out_ref.dtype)


def _pallas_gram(kind, x, z, inv_ell2, sf2, alpha, interpret):
    n, d = x.shape
    m = z.shape[0]
    bm, bn = min(_BM, n), min(_BN, m)
    grid = (pl.cdiv(n, bm), pl.cdiv(m, bn))
    scal = jnp.stack([inv_ell2, sf2, alpha]).astype(jnp.float32)[None, :]
    return pl.pallas_call(
        functools.partial(_tile_kernel, kind),
        out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, z, scal)


def _tile_kernel_batched(kind, x_ref, z_ref, scal_ref, out_ref, d2_ref):
    """Hyperparameter-batched tile: the raw squared-distance tile (the
    MXU work) is computed ONCE per (i, j) grid cell into VMEM scratch and
    reused across the batch axis c (innermost grid dim) — a vmap over
    hyperparameters costs only the VPU map per chain, not C matmuls."""
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        xi = x_ref[...]
        zj = z_ref[...]
        xn = jnp.sum(xi * xi, axis=1)[:, None]
        zn = jnp.sum(zj * zj, axis=1)[None, :]
        cross = jax.lax.dot_general(
            xi, zj, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        d2_ref[...] = jnp.maximum(xn + zn - 2.0 * cross, 0.0)

    inv_ell2 = scal_ref[c, 0]
    sf2 = scal_ref[c, 1]
    alpha = scal_ref[c, 2]
    d2 = d2_ref[...] * inv_ell2
    out_ref[0] = _apply_kind(kind, d2, sf2, alpha).astype(out_ref.dtype)


def _pallas_gram_batched(kind, x, z, inv_ell2, sf2, alpha, interpret):
    """(C, n, m) Grams for C hyperparameter settings over shared inputs."""
    n, d = x.shape
    m = z.shape[0]
    C = inv_ell2.shape[0]
    bm, bn = min(_BM, n), min(_BN, m)
    grid = (pl.cdiv(n, bm), pl.cdiv(m, bn), C)
    scal = jnp.stack([inv_ell2, sf2, alpha], axis=1).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_tile_kernel_batched, kind),
        out_shape=jax.ShapeDtypeStruct((C, n, m), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j, c: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3), lambda i, j, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda i, j, c: (c, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x, z, scal)


def _xla_gram(kind, x, z, inv_ell2, sf2, alpha):
    xn = jnp.sum(x * x, axis=1)[:, None]
    zn = jnp.sum(z * z, axis=1)[None, :]
    d2 = jnp.maximum(xn + zn - 2.0 * (x @ z.T), 0.0) * inv_ell2
    return _apply_kind(kind, d2, sf2, alpha)


@functools.cache
def _impl_for(kind):
    """Primal Gram implementation with a custom vmap rule: batching over
    the SCALAR hyperparameters (the NUTS-chain case — x/z shared) routes
    to the shared-distance batched Pallas kernel; anything else falls
    back to a vmapped XLA pipeline.  custom_vjp composes on top: vmap of
    the custom_vjp fwd re-enters this rule, the analytic XLA bwd vmaps
    natively."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def impl(x, z, inv_ell2, sf2, alpha):
        if _on_tpu():
            return _pallas_gram(kind, x, z, inv_ell2, sf2, alpha,
                                interpret=False)
        return _xla_gram(kind, x, z, inv_ell2, sf2, alpha)

    @impl.def_vmap
    def _rule(axis_size, in_batched, x, z, inv_ell2, sf2, alpha):
        xb, zb, ib, sb, ab = in_batched
        if not xb and not zb and _on_tpu():
            C = axis_size
            iv = inv_ell2 if ib else jnp.broadcast_to(inv_ell2, (C,))
            sv = sf2 if sb else jnp.broadcast_to(sf2, (C,))
            av = alpha if ab else jnp.broadcast_to(alpha, (C,))
            return _pallas_gram_batched(kind, x, z, iv, sv, av,
                                        interpret=False), True
        in_axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(lambda *a: _xla_gram(kind, *a), in_axes=in_axes)(
            x, z, inv_ell2, sf2, alpha)
        return out, True

    return impl


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_gram(kind, x, z, inv_ell2, sf2, alpha=1.0):
    """K(x, z) for an isotropic stationary kernel.

    inv_ell2 = 1/ℓ², sf2 = signal variance (both positive scalars);
    alpha is the RQ shape parameter (ignored by other kinds).
    Pallas on TPU, interpret/XLA elsewhere; gradients analytic via XLA.
    ARD kernels reduce to this by pre-scaling inputs per-dimension.
    SAFE UNDER VMAP over the scalar hyperparameters (NUTS chains): the
    batched Pallas kernel shares each distance tile across the batch.
    """
    alpha = jnp.asarray(alpha, x.dtype)
    return _impl_for(kind)(x, z, inv_ell2, sf2, alpha)


def _fwd(kind, x, z, inv_ell2, sf2, alpha=1.0):
    alpha = jnp.asarray(alpha, x.dtype)
    return _impl_for(kind)(x, z, inv_ell2, sf2, alpha), (
        x, z, inv_ell2, sf2, alpha)


def _bwd(kind, res, gbar):
    x, z, inv_ell2, sf2, alpha = res

    def f(x_, z_, i_, s_, a_):
        return _xla_gram(kind, x_, z_, i_, s_, a_)

    _, vjp = jax.vjp(f, x, z, inv_ell2, sf2, alpha)
    return vjp(gbar)


fused_gram.defvjp(_fwd, _bwd)


def cross_fused(kernel, x, z):
    """Fused `_cross` for RBF(+unit/ard)/Matern/RQ(+ard) kernels; falls
    back to the kernel's own implementation for unsupported classes."""
    from pygps_tpu.core import kernels as cov

    one = jnp.asarray(1.0, x.dtype)
    if isinstance(kernel, cov.RBF):
        inv_ell2 = jnp.exp(-2.0 * kernel.log_ell)
        sf2 = jnp.exp(2.0 * kernel.log_sigma)
        return fused_gram("rbf", x, z, inv_ell2, sf2)
    if isinstance(kernel, cov.RBFunit):
        inv_ell2 = jnp.exp(-2.0 * kernel.log_ell)
        return fused_gram("rbf", x, z, inv_ell2, one)
    if isinstance(kernel, cov.RBFard):
        # ARD = per-dimension input scaling + isotropic kernel at ℓ=1
        s = jnp.exp(-kernel.log_ell)[None, :]
        sf2 = jnp.exp(2.0 * kernel.log_sigma)
        return fused_gram("rbf", x * s, z * s, one, sf2)
    if isinstance(kernel, cov.Matern):
        inv_ell2 = jnp.exp(-2.0 * kernel.log_ell)
        sf2 = jnp.exp(2.0 * kernel.log_sigma)
        kind = {1: "matern1", 3: "matern3", 5: "matern5",
                7: "matern7"}.get(kernel.d)
        if kind is not None:
            return fused_gram(kind, x, z, inv_ell2, sf2)
    if isinstance(kernel, cov.RQard):
        s = jnp.exp(-kernel.log_ell)[None, :]
        sf2 = jnp.exp(2.0 * kernel.log_sigma)
        alpha = jnp.exp(kernel.log_alpha)
        return fused_gram("rq", x * s, z * s, one, sf2, alpha)
    if isinstance(kernel, cov.RQ):
        inv_ell2 = jnp.exp(-2.0 * kernel.log_ell)
        sf2 = jnp.exp(2.0 * kernel.log_sigma)
        alpha = jnp.exp(kernel.log_alpha)
        return fused_gram("rq", x, z, inv_ell2, sf2, alpha)
    if isinstance(kernel, cov.Periodic):
        pre = (jnp.pi * jnp.exp(-kernel.log_p)) ** 2     # (π/p)²
        sf2 = jnp.exp(2.0 * kernel.log_sigma)
        alpha = 2.0 * jnp.exp(-2.0 * kernel.log_ell)      # 2/ℓ²
        return fused_gram("periodic", x, z, pre, sf2, alpha)
    if isinstance(kernel, cov.PiecePoly):
        import math as _math

        inv_ell2 = jnp.exp(-2.0 * kernel.log_ell)
        sf2 = jnp.exp(2.0 * kernel.log_sigma)
        j = _math.floor(x.shape[-1] / 2.0) + kernel.v + 1
        return fused_gram(f"pp{kernel.v}_{j}", x, z, inv_ell2, sf2)
    return kernel._cross(x, z)
