"""Pallas fused-Gram kernel: correctness vs the XLA/kernel-object path.

On CPU the Pallas path runs the analytically identical XLA fallback; the
tile kernel itself is additionally executed in interpreter mode to check
the Pallas program logic (memory layout, grid, SMEM scalars) off-TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.ops import gram_pallas as gp

N, M, D = 256, 256, 8
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((N, D)), dtype=jnp.float32)
Z = jnp.asarray(rng.standard_normal((M, D)), dtype=jnp.float32)


@pytest.mark.parametrize("kern,kind", [
    (pg.cov.RBF(0.3, 0.2), "rbf"),
    (pg.cov.Matern(0.3, 0.2, d=1), "matern1"),
    (pg.cov.Matern(0.3, 0.2, d=3), "matern3"),
    (pg.cov.Matern(0.3, 0.2, d=5), "matern5"),
    (pg.cov.Matern(0.3, 0.2, d=7), "matern7"),
])
def test_fused_matches_kernel_object(kern, kind):
    inv_ell2 = jnp.exp(-2.0 * kern.log_ell).astype(jnp.float32)
    sf2 = jnp.exp(2.0 * kern.log_sigma).astype(jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    ref = np.asarray(kern._cross(X, Z))
    out = np.asarray(gp.fused_gram(kind, X, Z, inv_ell2, sf2))
    assert np.allclose(out, ref, atol=1e-4)
    # interpret-mode Pallas program (exercises the real tile kernel)
    out_i = np.asarray(gp._pallas_gram(kind, X, Z, inv_ell2, sf2, one,
                                       interpret=True))
    assert np.allclose(out_i, ref, atol=1e-4)


def test_fused_rq_general_alpha():
    kern = pg.cov.RQ(0.3, 0.2, 0.5)
    inv_ell2 = jnp.exp(-2.0 * kern.log_ell).astype(jnp.float32)
    sf2 = jnp.exp(2.0 * kern.log_sigma).astype(jnp.float32)
    alpha = jnp.exp(kern.log_alpha).astype(jnp.float32)
    ref = np.asarray(kern._cross(X, Z))
    out = np.asarray(gp.fused_gram("rq", X, Z, inv_ell2, sf2, alpha))
    assert np.allclose(out, ref, atol=1e-4)
    out_i = np.asarray(gp._pallas_gram("rq", X, Z, inv_ell2, sf2, alpha,
                                       interpret=True))
    assert np.allclose(out_i, ref, atol=1e-4)


@pytest.mark.parametrize("kern", [
    pg.cov.RBFard(np.linspace(-0.3, 0.4, D), 0.2),
    pg.cov.RQard(np.linspace(-0.3, 0.4, D), 0.2, 0.5),
])
def test_cross_fused_ard_prescaling(kern):
    # ARD routes through the isotropic fused kernel via input pre-scaling
    ref = np.asarray(kern._cross(X, Z))
    out = np.asarray(gp.cross_fused(kern, X, Z))
    assert np.allclose(out, ref, atol=1e-4)


def test_fused_gram_gradients():
    inv_ell2 = jnp.asarray(0.7, jnp.float32)
    sf2 = jnp.asarray(1.3, jnp.float32)

    def loss(i_, s_):
        return jnp.sum(gp.fused_gram("rbf", X, Z, i_, s_) ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(inv_ell2, sf2)
    eps = 1e-3
    fd1 = (loss(inv_ell2 + eps, sf2) - loss(inv_ell2 - eps, sf2)) / (2 * eps)
    fd2 = (loss(inv_ell2, sf2 + eps) - loss(inv_ell2, sf2 - eps)) / (2 * eps)
    assert np.isclose(float(g1), float(fd1), rtol=2e-2)
    assert np.isclose(float(g2), float(fd2), rtol=2e-2)


def test_fused_periodic():
    kern = pg.cov.Periodic(0.2, 0.4, 0.1)
    ref = np.asarray(kern._cross(X, Z))
    out = np.asarray(gp.cross_fused(kern, X, Z))
    assert np.allclose(out, ref, atol=1e-4)
    pre = jnp.asarray((np.pi * np.exp(-0.4)) ** 2, jnp.float32)
    sf2 = jnp.asarray(np.exp(0.2), jnp.float32)
    al = jnp.asarray(2.0 * np.exp(-0.4), jnp.float32)
    out_i = np.asarray(gp._pallas_gram("periodic", X, Z, pre, sf2, al,
                                       interpret=True))
    assert np.allclose(out_i, ref, atol=1e-4)


def test_fused_piecepoly_all_orders():
    """PiecePoly kinds pp{v}_{j}: interpret-mode Pallas tile + XLA fused
    path vs the kernel's own formula, values and gradients."""
    import math as _math

    for v in (0, 1, 2, 3):
        kern = pg.cov.PiecePoly(0.4, 0.2, v=v)
        ref = np.asarray(kern._cross(X, Z))
        out = np.asarray(gp.cross_fused(kern, X, Z))
        assert np.allclose(out, ref, atol=1e-4), v
        j = _math.floor(X.shape[-1] / 2.0) + v + 1
        inv_ell2 = jnp.asarray(np.exp(-0.8), jnp.float32)
        sf2 = jnp.asarray(np.exp(0.4), jnp.float32)
        out_i = np.asarray(gp._pallas_gram(
            f"pp{v}_{j}", X, Z, inv_ell2, sf2,
            jnp.asarray(1.0, jnp.float32), interpret=True))
        assert np.allclose(out_i, ref, atol=1e-4), v

        def loss(i_, s_, v=v, j=j):
            return jnp.sum(gp.fused_gram(f"pp{v}_{j}", X, Z, i_, s_) ** 2)

        g1, g2 = jax.grad(loss, argnums=(0, 1))(inv_ell2, sf2)
        eps = 1e-3
        fd1 = (loss(inv_ell2 + eps, sf2)
               - loss(inv_ell2 - eps, sf2)) / (2 * eps)
        assert np.isclose(float(g1), float(fd1), rtol=3e-2), v


def test_sm_lean_and_pallas_match_einsum():
    """sm_gram (lean scan / interpret-mode Pallas tile) vs the einsum SM
    path, values and hyperparameter gradients."""
    from jax.flatten_util import ravel_pytree

    from pygps_tpu.ops import sm_pallas as sp

    rng = np.random.default_rng(3)
    Q, D = 3, 4
    x = jnp.asarray(rng.standard_normal((48, D)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((32, D)), jnp.float32)
    kern = pg.cov.SM(log_w=0.1 * rng.standard_normal(Q),
                     log_mean=0.2 * rng.standard_normal((Q, D)),
                     log_var=0.3 * rng.standard_normal((Q, D)),
                     Q=Q, D=D)
    w = jnp.exp(kern.log_w)
    mu = jnp.exp(kern.log_mean)
    v = jnp.exp(kern.log_var)
    # einsum reference (below the size threshold, so _cross is einsum)
    ref = np.asarray(kern._cross(x, z))
    lean = np.asarray(sp._xla_sm_lean(x, z, w, mu, v))
    assert np.allclose(lean, ref, atol=1e-5)
    tile = np.asarray(sp._pallas_sm(x, z, w, mu, v, interpret=True))
    assert np.allclose(tile, ref, atol=1e-4)

    # gradients: sm_gram custom_vjp vs autodiff of the einsum path
    theta, unravel = ravel_pytree(kern)

    def loss_fused(t):
        k = unravel(t)
        return jnp.sum(sp.sm_gram(x, z, jnp.exp(k.log_w),
                                  jnp.exp(k.log_mean),
                                  jnp.exp(k.log_var)) ** 2)

    def loss_ref(t):
        return jnp.sum(unravel(t)._cross(x, z) ** 2)

    gf = jax.grad(loss_fused)(theta)
    gr = jax.grad(loss_ref)(theta)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_fused_composites_route_through_children():
    """Sum/Product dispatch to child kernels, whose _cross uses the fused
    path when enabled — composites of supported families are covered."""
    pg.cov.use_fused_gram(True)
    try:
        k = pg.cov.RBF(0.2, 0.1) + pg.cov.Matern(0.1, 0.0, d=3) \
            * pg.cov.Periodic(0.2, 0.3, 0.1)
        K1 = np.asarray(k.Ktrain(X))
    finally:
        pg.cov.use_fused_gram(False)
    K0 = np.asarray(k.Ktrain(X))
    assert np.allclose(K1, K0, atol=1e-4)


def test_fused_gram_vmap_over_hyps():
    """vmap over scalar hyperparameters (the NUTS-chain case) works and
    matches per-hyp evaluations; gradients survive the composition."""
    ivs = jnp.asarray([0.5, 0.9, 1.4], jnp.float32)
    sfs = jnp.asarray([0.8, 1.0, 1.6], jnp.float32)

    out = jax.vmap(lambda i_, s_: gp.fused_gram("rbf", X, Z, i_, s_))(
        ivs, sfs)
    assert out.shape == (3, N, M)
    for c in range(3):
        ref = gp.fused_gram("rbf", X, Z, ivs[c], sfs[c])
        assert np.allclose(np.asarray(out[c]), np.asarray(ref), atol=1e-5)

    # grad-of-vmap (what a chain-batched NLML does)
    def loss(i_):
        ks = jax.vmap(lambda ii: gp.fused_gram("rbf", X, Z, ii, 1.0))(i_)
        return jnp.sum(ks ** 2)

    g = jax.grad(loss)(ivs)
    eps = 1e-3
    for c in range(3):
        pert = ivs.at[c].add(eps)
        pert2 = ivs.at[c].add(-eps)
        fd = (loss(pert) - loss(pert2)) / (2 * eps)
        assert np.isclose(float(g[c]), float(fd), rtol=2e-2)


def test_batched_pallas_kernel_interpret():
    """The shared-distance batched tile program (interpret mode) matches
    the per-hyp XLA pipeline."""
    ivs = jnp.asarray([0.5, 1.2], jnp.float32)
    sfs = jnp.asarray([1.0, 0.7], jnp.float32)
    avs = jnp.asarray([1.0, 1.0], jnp.float32)
    out = np.asarray(gp._pallas_gram_batched("rbf", X, Z, ivs, sfs, avs,
                                             interpret=True))
    for c in range(2):
        ref = np.asarray(gp._xla_gram("rbf", X, Z, ivs[c], sfs[c], avs[c]))
        assert np.allclose(out[c], ref, atol=1e-4)


def test_cross_fused_dispatch_and_fallback():
    k = pg.cov.RBF(0.1, 0.1)
    out = np.asarray(gp.cross_fused(k, X, Z))
    assert np.allclose(out, np.asarray(k._cross(X, Z)), atol=1e-4)
    # unsupported kernel class falls back to its own implementation
    k2 = pg.cov.Periodic(0.1, 0.2, 0.3)
    out2 = np.asarray(gp.cross_fused(k2, X[:, :1], Z[:, :1]))
    assert np.allclose(out2, np.asarray(k2._cross(X[:, :1], Z[:, :1])),
                       atol=1e-5)


# ---------------------------------------------------------------------------
# Round 3: masked trailing-update kernel (ops/trailing_pallas.py)
# ---------------------------------------------------------------------------


def test_trailing_update_matches_reference():
    """Fused mask+GEMM+subtract kernel vs the explicit update, over every
    (panel, device) combination of a small block-cyclic layout."""
    from pygps_tpu.ops.trailing_pallas import trailing_update

    rng = np.random.default_rng(0)
    p, m, b, n = 2, 4, 8, 64
    A = jnp.asarray(rng.standard_normal((m, b, n)), jnp.float32)
    L = jnp.asarray(rng.standard_normal((m, b, b)), jnp.float32)
    P = jnp.asarray(rng.standard_normal((n, b)), jnp.float32)
    for k in (0, 3, 6):
        for d in (0, 1):
            gidx = d + p * np.arange(m)
            Lm = jnp.where(jnp.asarray(gidx > k)[:, None, None], L, 0.0)
            Pm = jnp.where(jnp.asarray(np.arange(n) // b > k)[:, None],
                           P, 0.0)
            out = trailing_update(A, Lm, Pm, jnp.asarray(k),
                                  jnp.asarray(d), p, tn=8, interpret=True)
            ref = np.asarray(A).copy()
            for i in range(m):
                if gidx[i] > k:
                    ref[i] -= np.asarray(Lm)[i] @ np.asarray(Pm).T
            assert np.abs(np.asarray(out) - ref).max() < 1e-5


def test_pcholesky_pallas_trailing_matches_xla(tmp_path):
    """pcholesky(trailing="pallas") (interpret mode off-TPU) equals the
    default XLA trailing path."""
    from pygps_tpu.parallel import mesh as pmesh
    from pygps_tpu.parallel.pcholesky import pcholesky

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs multi-device mesh")
    rng = np.random.default_rng(1)
    n, b, p = 64, 8, 2
    W = rng.standard_normal((n, 24))
    A = jnp.asarray((W @ W.T + n * np.eye(n)), jnp.float32)
    mesh = pmesh.make_mesh(p)
    Abc = pmesh.shard_bc(pmesh.to_block_cyclic(A, b, p), mesh)
    L1 = pcholesky(Abc, mesh)
    L2 = pcholesky(Abc, mesh, trailing="pallas")
    assert np.allclose(np.asarray(L1), np.asarray(L2), atol=1e-5)


def test_rchol_matches_dense():
    from pygps_tpu.ops.trtri import rchol

    rng = np.random.default_rng(2)
    for n, base in ((96, 32), (256, 64)):
        W = rng.standard_normal((n, n))
        A = jnp.asarray(W @ W.T + n * np.eye(n))
        L = rchol(A, base=base)
        assert np.allclose(np.asarray(L), np.linalg.cholesky(np.asarray(A)),
                           atol=1e-10 * n)
