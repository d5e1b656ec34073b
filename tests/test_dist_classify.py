"""Distributed classification (Laplace/EP over DistributedOps) vs dense."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.inference import ep as dense_ep
from pygps_tpu.inference import laplace as dense_laplace
from pygps_tpu.parallel import classify, mesh as pmesh
from pygps_tpu.parallel.ops import DistributedOps
from pygps_tpu.parallel.ring_gram import gram_bc

N, B, PDEV = 64, 4, 8


@pytest.fixture(scope="module")
def msh():
    return pmesh.make_mesh(PDEV)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, 2)))
    y = jnp.sign(jnp.asarray(x)[:, 0] +
                 0.3 * jnp.asarray(rng.standard_normal(N)))
    return x, y


def test_distributed_ops_primitives(msh, data):
    x, y = data
    kern = pg.cov.RBF(0.2, 0.3)
    K = np.asarray(kern.Ktrain(x))
    ops = DistributedOps(gram_bc(kern, x, msh, B), msh)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(N))
    assert np.allclose(np.asarray(ops.matvec(v)), K @ v, atol=1e-10)
    assert np.allclose(np.asarray(ops.diag()), np.diag(K), atol=1e-12)
    W = jnp.asarray(np.abs(np.random.default_rng(2).standard_normal(N)))
    aux = ops.with_W(W)
    sW = np.sqrt(np.asarray(W))
    Bm = np.eye(N) + sW[:, None] * K * sW[None, :]
    assert np.isclose(float(ops.logdetB(aux)),
                      np.linalg.slogdet(Bm)[1], atol=1e-9)
    u = np.asarray(ops.apply_A(aux, v))
    ref = sW * np.linalg.solve(Bm, sW * np.asarray(v))
    assert np.allclose(u, ref, atol=1e-9)
    sig = np.asarray(ops.diag_Sigma(aux))
    Sig_ref = K - (sW[:, None] * K).T @ np.linalg.solve(Bm, sW[:, None] * K)
    assert np.allclose(sig, np.diag(Sig_ref), atol=1e-9)


def test_distributed_laplace_matches_dense(msh, data):
    x, y = data
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.3, 0.3), pg.lik.Erf()
    nl_d = float(classify.laplace_nlml(mean, kern, lik, x, y, msh, block=B))
    nl_ref = float(dense_laplace.nlml(mean, kern, lik, x, y))
    assert np.isclose(nl_d, nl_ref, rtol=1e-9)


@pytest.mark.slow
def test_distributed_laplace_grads_match_dense(msh, data):
    from jax.flatten_util import ravel_pytree

    x, y = data
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.3, 0.3), pg.lik.Erf()
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f_d(t):
        m, k, l = unravel(t)
        return classify.laplace_nlml(m, k, l, x, y, msh, block=B)

    def f_r(t):
        m, k, l = unravel(t)
        return dense_laplace.nlml(m, k, l, x, y)

    gd = np.asarray(jax.grad(f_d)(theta))
    gr = np.asarray(jax.grad(f_r)(theta))
    assert np.allclose(gd, gr, rtol=1e-6, atol=1e-9)


def test_p1_laplace_grads_match_dense(data):
    """p=1 routes the factor through pcholesky_ad's analytic Cholesky
    VJP (the O(n²)-memory backward the real chip uses — plain autodiff
    through the blocked factorization OOM'd at n=16384); exact same
    gradients required."""
    from jax.flatten_util import ravel_pytree

    x, y = data
    m1 = pmesh.make_mesh(1)
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.3, 0.3), pg.lik.Erf()
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f_d(t):
        m, k, l = unravel(t)
        return classify.laplace_nlml(m, k, l, x, y, m1, block=B)

    def f_r(t):
        m, k, l = unravel(t)
        return dense_laplace.nlml(m, k, l, x, y)

    gd = np.asarray(jax.grad(f_d)(theta))
    gr = np.asarray(jax.grad(f_r)(theta))
    assert np.allclose(gd, gr, rtol=1e-6, atol=1e-9)


def test_p1_ep_grads_match_dense(data):
    """EP's energy differentiates apply_A/diag_Sigma/logdetB through the
    factor — exercises pcholesky_ad's VJP with a full (not diag-only)
    L̄ cotangent at p=1."""
    from jax.flatten_util import ravel_pytree

    x, y = data
    m1 = pmesh.make_mesh(1)
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.3, 0.3), pg.lik.Erf()
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f_d(t):
        m, k, l = unravel(t)
        return classify.ep_nlml(m, k, l, x, y, m1, block=B)

    def f_r(t):
        m, k, l = unravel(t)
        return dense_ep.nlml(m, k, l, x, y)

    gd = np.asarray(jax.grad(f_d)(theta))
    gr = np.asarray(jax.grad(f_r)(theta))
    # The two sides use different gradient estimators: DenseOps takes the
    # analytic fixed-point gradient (EP_ANALYTIC_GRAD), DistributedOps the
    # autodiff energy with stop-gradient sites — they agree only up to
    # O(site residual) at the sweep tolerance (see ep.py's knob docs),
    # ~1e-4 relative here.
    assert np.allclose(gd, gr, rtol=3e-3, atol=1e-7)


def test_p1_diag_sigma_vjp_matches_dense(data):
    """p=1 diag_Sigma routes through the analytic custom VJP
    (_diag_sigma_p1 — plain autodiff through the substitution loop
    stacks an O(n²·n/b) residual, a measured 8 GB compile OOM at
    n=16384); gradients must match the dense formula exactly."""
    x, _ = data
    rng = np.random.default_rng(5)
    n = x.shape[0]
    W = jnp.asarray(rng.uniform(0.1, 2.0, n))
    cot = jnp.asarray(rng.standard_normal(n))
    m1 = pmesh.make_mesh(1)

    def f_dist(theta):
        kern = pg.cov.RBF(theta[0], theta[1])
        ops = DistributedOps(gram_bc(kern, x, m1, B), m1)
        aux = ops.with_W(W * jnp.exp(theta[2]))
        return jnp.dot(cot, ops.diag_Sigma(aux))

    def f_ref(theta):
        kern = pg.cov.RBF(theta[0], theta[1])
        K = kern.Ktrain(x)
        sW = jnp.sqrt(W * jnp.exp(theta[2]))
        Bm = jnp.eye(n) + (sW[:, None] * K) * sW[None, :]
        L = jnp.linalg.cholesky(Bm)
        V = jax.scipy.linalg.solve_triangular(L, sW[:, None] * K,
                                              lower=True)
        return jnp.dot(cot, jnp.diag(K) - jnp.sum(V * V, axis=0))

    theta = jnp.asarray([0.2, 0.1, 0.3])
    v1, g1 = jax.value_and_grad(f_dist)(theta)
    v2, g2 = jax.value_and_grad(f_ref)(theta)
    assert np.isclose(float(v1), float(v2), atol=1e-9)
    assert np.allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8,
                       atol=1e-10)


def test_distributed_ep_grads_finite_and_match(msh, data):
    """p=8 EP gradients through the mesh: regression for the
    psolve_chol off-owner 0/0 (non-owner lanes solved against an
    above-diagonal all-zero L_kk; the masked value was fine but the
    solve VJP divided by the zero diagonal → NaN hyperparameter
    gradients)."""
    from jax.flatten_util import ravel_pytree

    x, y = data
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.3, 0.3), pg.lik.Erf()
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f_d(t):
        m, k, l = unravel(t)
        return classify.ep_nlml(m, k, l, x, y, msh, block=B)

    def f_r(t):
        m, k, l = unravel(t)
        return dense_ep.nlml(m, k, l, x, y)

    gd = np.asarray(jax.grad(f_d)(theta))
    assert np.all(np.isfinite(gd))
    gr = np.asarray(jax.grad(f_r)(theta))
    assert np.allclose(gd, gr, rtol=3e-3, atol=1e-7)


@pytest.mark.slow
def test_distributed_ep_matches_dense(msh, data):
    x, y = data
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.3, 0.3), pg.lik.Erf()
    nl_d = float(classify.ep_nlml(mean, kern, lik, x, y, msh, block=B))
    nl_ref = float(dense_ep.nlml(mean, kern, lik, x, y))
    assert np.isclose(nl_d, nl_ref, rtol=1e-7)


def test_distributed_laplace_predict(msh, data):
    x, y = data
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.3, 0.3), pg.lik.Erf()
    alpha, W, ops = classify.laplace_predict_parts(
        mean, kern, lik, x, y, msh, block=B)
    xs = x[:7]
    lp, ymu, ys2, fmu, fs2 = classify.predict(mean, kern, lik, x, xs,
                                              alpha, W, ops)
    # dense reference
    post, _ = dense_laplace.evaluate(mean, kern, lik, x, y)
    from pygps_tpu.core.posteriors import predict_latent
    fmu_r, fs2_r = predict_latent(post, kern.K(x, xs), kern.Kdiag(xs),
                                  mean(xs))
    assert np.allclose(np.asarray(fmu), np.asarray(fmu_r), atol=1e-8)
    assert np.allclose(np.asarray(fs2), np.asarray(fs2_r), atol=1e-8)
