"""Kernel shape/structure/gradient tests.

Mirrors the reference's unit_test_cov.py checkCovOutput pattern (train →
n×n symmetric PSD, cross → n×ns, self_test → ns, derivative per hyp index)
and adds value/PSD/autodiff checks the reference lacks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.core import kernels as cov

N, NS, D = 11, 7, 3
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((N, D)))
Z = jnp.asarray(rng.standard_normal((NS, D)))


def all_kernels():
    return [
        cov.RBF(0.1, 0.2),
        cov.RBFunit(0.1),
        cov.RBFard(log_ell=jnp.zeros(D) + 0.1, log_sigma=0.2),
        cov.Const(0.3),
        cov.Linear(0.2),
        cov.LINard(log_ell=jnp.zeros(D)),
        cov.Matern(0.1, 0.2, d=1),
        cov.Matern(0.1, 0.2, d=3),
        cov.Matern(0.1, 0.2, d=5),
        cov.Matern(0.1, 0.2, d=7),
        cov.Periodic(0.1, 0.2, 0.3),
        cov.RQ(0.1, 0.2, 0.3),
        cov.RQard(log_ell=jnp.zeros(D), log_sigma=0.2, log_alpha=0.1),
        cov.Poly(0.1, 0.2, d=3),
        cov.PiecePoly(0.4, 0.2, v=0),
        cov.PiecePoly(0.4, 0.2, v=1),
        cov.PiecePoly(0.4, 0.2, v=2),
        cov.PiecePoly(0.4, 0.2, v=3),
        cov.Noise(0.1),
        cov.SM(Q=2, D=D),
        # composites
        cov.RBF(0.1, 0.2) + cov.Linear(0.0),
        cov.RBF(0.1, 0.2) * cov.Periodic(0.0, 0.0, 0.0),
        2.5 * cov.Matern(0.0, 0.0, d=5),
        (cov.RBF() + cov.Noise(-1.0)) * cov.Const(0.1),
    ]


@pytest.mark.parametrize("k", all_kernels(), ids=lambda k: repr(k)[:40])
def test_shapes_and_symmetry(k):
    Kt = k.Ktrain(X)
    assert Kt.shape == (N, N)
    assert np.allclose(np.asarray(Kt), np.asarray(Kt).T, atol=1e-12)
    Kc = k.K(X, Z)
    assert Kc.shape == (N, NS)
    kd = k.Kdiag(Z)
    assert kd.shape == (NS,)
    assert np.all(np.isfinite(np.asarray(Kt)))
    # train diagonal must agree with Kdiag on the same points
    assert np.allclose(np.diag(np.asarray(k.Ktrain(Z))), np.asarray(kd),
                       atol=1e-9)


def _contains_periodic(k):
    if isinstance(k, cov.Periodic):
        return True
    return any(_contains_periodic(getattr(k, f))
               for f in k._hyp_fields if isinstance(getattr(k, f), cov.Kernel))


@pytest.mark.parametrize("k", all_kernels(), ids=lambda k: repr(k)[:40])
def test_train_psd(k):
    # Periodic (like the reference's) is a 1-D kernel: with Euclidean r it is
    # not guaranteed PSD in D>1 — checked separately on 1-D inputs below.
    x = X[:, :1] if _contains_periodic(k) else X
    Kt = np.asarray(k.Ktrain(x))
    w = np.linalg.eigvalsh(Kt + 1e-10 * np.eye(N))
    assert w.min() > -1e-8


@pytest.mark.parametrize("k", all_kernels(), ids=lambda k: repr(k)[:40])
def test_hyp_roundtrip_and_grads(k):
    h = k.hyp
    assert len(h) == k.n_hyp
    k.hyp = [v + 0.0 for v in h]    # setter roundtrip
    assert np.allclose(k.hyp, h)

    # autodiff gradient of a scalar functional of Ktrain wrt every hyp leaf
    def loss(kk):
        return jnp.sum(kk.Ktrain(X) ** 2)

    g = jax.grad(loss)(k)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_dermatrix_compat_shim():
    k = pg.cov.RBF(0.1, 0.2)
    d0 = k.getDerMatrix(x=X, mode="train", der=0)
    assert d0.shape == (N, N)
    # FD check on der=0 (log_ell)
    eps = 1e-6
    kp, km = pg.cov.RBF(0.1 + eps, 0.2), pg.cov.RBF(0.1 - eps, 0.2)
    fd = (kp.Ktrain(X) - km.Ktrain(X)) / (2 * eps)
    assert np.allclose(np.asarray(d0), np.asarray(fd), atol=1e-6)


def test_composition_hyp_ordering():
    # composite hyp = left hyps then right hyps (reference concatenation)
    k = pg.cov.RBF(0.1, 0.2) + pg.cov.Linear(0.9)
    assert np.allclose(k.hyp, [0.1, 0.2, 0.9])
    k2 = 2.0 * pg.cov.RBF(0.5, 0.6)
    assert np.isclose(k2.hyp[0], np.log(2.0))   # scale first
    assert np.allclose(k2.hyp[1:], [0.5, 0.6])


def test_sum_product_values():
    k1, k2 = pg.cov.RBF(0.1, 0.2), pg.cov.Linear(0.3)
    Ks = (k1 + k2).Ktrain(X)
    assert np.allclose(np.asarray(Ks),
                       np.asarray(k1.Ktrain(X) + k2.Ktrain(X)))
    Kp = (k1 * k2).Ktrain(X)
    assert np.allclose(np.asarray(Kp),
                       np.asarray(k1.Ktrain(X) * k2.Ktrain(X)))


def test_noise_kernel_modes():
    k = pg.cov.Noise(0.5)
    sn2 = np.exp(1.0)
    assert np.allclose(np.asarray(k.Ktrain(X)), sn2 * np.eye(N))
    assert np.allclose(np.asarray(k.K(X, Z)), 0.0)
    assert np.allclose(np.asarray(k.Kdiag(Z)), sn2)


def test_pre_kernel_slicing():
    Kt = rng.standard_normal((N, N))
    Kt = Kt @ Kt.T
    Kc = rng.standard_normal((N, NS))
    diag = np.abs(rng.standard_normal(NS))
    M1 = np.vstack([Kc, diag[None, :]])
    k = cov.Pre(M1, Kt)
    assert np.allclose(np.asarray(k.Ktrain(X)), Kt)
    assert np.allclose(np.asarray(k.K(X, Z)), Kc)
    assert np.allclose(np.asarray(k.Kdiag(Z)), diag)


def test_fitc_wrapper_triple():
    base = pg.cov.RBF(0.1, 0.2)
    u = jnp.asarray(rng.standard_normal((5, D)))
    k = cov.FITC(base, u)
    diagKff, Kuu, Kuf = k.fitc_train(X)
    assert diagKff.shape == (N,)
    assert Kuu.shape == (5, 5)
    assert Kuf.shape == (5, N)
    assert np.allclose(np.asarray(Kuu), np.asarray(base.Ktrain(u)))
    # cross mode returns K(u, xs) for inducing-point posteriors
    assert k.K(X, Z).shape == (5, NS)


def test_getcovmatrix_compat_modes():
    k = pg.cov.RBF()
    assert k.getCovMatrix(x=X, mode="train").shape == (N, N)
    assert k.getCovMatrix(x=X, z=Z, mode="cross").shape == (N, NS)
    assert k.getCovMatrix(z=Z, mode="self_test").shape == (NS, 1)


def test_sm_init_from_data_recovers_periodicity():
    rng = np.random.default_rng(7)
    x1 = np.linspace(0, 10, 60)[:, None]
    y1 = np.sin(2 * np.pi * 1.5 * x1[:, 0]) + 0.1 * rng.standard_normal(60)
    k = cov.SM.init_from_data(3, x1, y1)
    assert k.log_w.shape == (3,)
    assert k.log_mean.shape == (3, 1)
    K = k.Ktrain(jnp.asarray(x1))
    assert np.all(np.isfinite(np.asarray(K)))
    w = np.linalg.eigvalsh(np.asarray(K) + 1e-8 * np.eye(60))
    assert w.min() > -1e-6
