"""Distributed matrix-free iterative exact GP vs the dense engine.

Runs on the 8-device virtual CPU mesh (conftest); the Gram matrix is
never materialized — every matvec builds its row-block tiles on the fly
inside shard_map."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.inference import exact
from pygps_tpu.parallel.piterative import (DistributedIterative,
                                           make_sharded_matvec)
from pygps_tpu.parallel import mesh as pmesh


def _problem(n=256, seed=0, log_sn=-3.0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0])
                    + 0.03 * rng.standard_normal(n))
    return (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Gauss(log_sn),
            x, y)


def test_sharded_matvec_matches_dense():
    mean, kern, lik, x, y = _problem()
    mv = make_sharded_matvec(pmesh.make_mesh(), col_chunks=8)
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((x.shape[0], 3)))
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    got = mv(kern, x, X, sn2)
    want = kern.Ktrain(x) @ X + sn2 * X
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_dist_iterative_nlml_close_to_cholesky():
    mean, kern, lik, x, y = _problem()
    eng = DistributedIterative(col_chunks=8, precond_rank=40,
                               num_probes=16, lanczos_iters=15)
    ref = float(exact.nlml(mean, kern, lik, x, y))
    est = float(eng.nlml(mean, kern, lik, x, y))
    assert abs(est - ref) / abs(ref) < 0.02


@pytest.mark.slow
def test_dist_iterative_gradients_close():
    from jax.flatten_util import ravel_pytree

    mean, kern, lik, x, y = _problem()
    eng = DistributedIterative(col_chunks=8, precond_rank=40,
                               num_probes=64, lanczos_iters=15)
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f_it(t):
        m, k, l = unravel(t)
        return eng.nlml(m, k, l, x, y)

    def f_ref(t):
        m, k, l = unravel(t)
        return exact.nlml(m, k, l, x, y)

    g_it = np.asarray(jax.grad(f_it)(theta))
    g_ref = np.asarray(jax.grad(f_ref)(theta))
    assert np.allclose(g_it, g_ref, rtol=0.15, atol=0.3)


@pytest.mark.slow
def test_model_iterative_engine_end_to_end():
    """GPR.useInference('Iterative'): posterior/predict/optimize parity."""
    rng = np.random.default_rng(0)
    n = 200
    x = np.linspace(-4, 4, n)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)
    xs = np.linspace(-4.5, 4.5, 97)[:, None]

    m1 = pg.GPR()
    m1.setData(x, y)
    nl1, _, _ = m1.getPosterior()
    ym1, ys1, _, _, _ = m1.predict(xs)

    m2 = pg.GPR()
    m2.setData(x, y)
    m2.useInference("Iterative")
    nl2, _, _ = m2.getPosterior()
    ym2, ys2, _, _, _ = m2.predict(xs)

    # CG solves are exact to tol; SLQ on the preconditioned operator is
    # near-exact because rank-100 >= numerical rank here
    assert abs(float(nl1) - float(nl2)) / abs(float(nl1)) < 1e-3
    assert np.allclose(np.asarray(ym1), np.asarray(ym2), atol=1e-8)
    assert np.allclose(np.asarray(ys1), np.asarray(ys2), atol=1e-8)

    m2.optimize(numIterations=10)
    nl3, _, _ = m2.getPosterior()
    assert float(nl3) < float(nl2)

    import pytest
    mc = pg.GPC().useInference("Iterative")
    mc.setData(np.asarray(x), np.sign(y))
    with pytest.raises(TypeError):
        mc.getPosterior()


def test_dist_posterior_mean_matches_dense():
    mean, kern, lik, x, y = _problem()
    eng = DistributedIterative(col_chunks=8, precond_rank=40,
                               cg_tol=1e-10)
    alpha, it, res = eng.posterior_mean_alpha(mean, kern, lik, x, y)
    post = exact.posterior(mean, kern, lik, x, y)
    assert np.allclose(np.asarray(alpha), np.asarray(post.alpha),
                       atol=1e-6)
    assert int(it) < 40        # preconditioned: ~19 on this problem


def test_staged_nlml_grad_matches_one_shot():
    """nlml_and_grad_staged must reproduce jit(value_and_grad(nlml))
    with the same seed — identical estimator, identical PRNG keys,
    only the dispatch boundaries differ."""
    from jax.flatten_util import ravel_pytree

    mean, kern, lik, x, y = _problem()
    eng = DistributedIterative(col_chunks=8, precond_rank=40,
                               num_probes=16, lanczos_iters=15)
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f(t):
        m, k, l = unravel(t)
        return eng.nlml(m, k, l, x, y, seed=3)

    v1, g1 = jax.jit(jax.value_and_grad(f))(theta)
    v2, (gm, gk, gl) = eng.nlml_and_grad_staged(mean, kern, lik, x, y,
                                                seed=3)
    g2, _ = ravel_pytree((gm, gk, gl))
    assert np.isclose(float(v1), float(v2), rtol=1e-8), (v1, v2)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-10)


def test_staged_nlml_grad_no_preconditioner():
    from jax.flatten_util import ravel_pytree

    mean, kern, lik, x, y = _problem(log_sn=-1.0)
    eng = DistributedIterative(col_chunks=8, precond_rank=0,
                               num_probes=16, lanczos_iters=20)
    v, (gm, gk, gl) = eng.nlml_and_grad_staged(mean, kern, lik, x, y)
    flat, _ = ravel_pytree((gm, gk, gl))
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(flat)))
