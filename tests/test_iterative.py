"""Iterative (CG/SLQ) exact-GP path vs the Cholesky engine."""

import numpy as np

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.inference import exact, iterative
from pygps_tpu.utils.cg import cg_solve, slq_logdet


def _spd(n=60, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((n, n))
    return jnp.asarray(W @ W.T + n * np.eye(n))


def test_cg_solves_exactly():
    A = _spd()
    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.standard_normal((60, 3)))
    X, it, res = cg_solve(lambda V: A @ V, B, tol=1e-12, max_iters=300)
    assert np.allclose(np.asarray(A @ X), np.asarray(B), atol=1e-7)


def test_slq_logdet_close():
    A = _spd(n=80, seed=2)
    est = slq_logdet(lambda V: A @ V, 80, jax.random.PRNGKey(0),
                     num_probes=40, lanczos_iters=30)
    ref = float(np.linalg.slogdet(np.asarray(A))[1])
    assert abs(float(est) - ref) / abs(ref) < 0.05


def test_iterative_nlml_close_to_cholesky():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((70, 2)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) +
                    0.1 * rng.standard_normal(70))
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.2, 0.1), pg.lik.Gauss(-1.0)
    ref = float(exact.nlml(mean, kern, lik, x, y))
    est = float(iterative.nlml(mean, kern, lik, x, y, num_probes=48,
                               lanczos_iters=40))
    # quad term exact, logdet stochastic → a few percent of |nlZ|
    assert abs(est - ref) / max(abs(ref), 1.0) < 0.05


def test_iterative_gradients_close():
    from jax.flatten_util import ravel_pytree

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((50, 2)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) +
                    0.1 * rng.standard_normal(50))
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.2, 0.1), pg.lik.Gauss(-1.0)
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f_it(t):
        m, k, l = unravel(t)
        return iterative.nlml(m, k, l, x, y, num_probes=128,
                              lanczos_iters=30)

    def f_ref(t):
        m, k, l = unravel(t)
        return exact.nlml(m, k, l, x, y)

    g_it = np.asarray(jax.grad(f_it)(theta))
    g_ref = np.asarray(jax.grad(f_ref)(theta))
    # stochastic trace estimator: generous relative tolerance
    assert np.allclose(g_it, g_ref, rtol=0.25, atol=0.5)


def test_posterior_solve_matches_dense():
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.linspace(-3, 3, 40)[:, None])
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]))
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Gauss(-1.0)
    alpha, it, res = iterative.posterior_solve(mean, kern, lik, x, y)
    post = exact.posterior(mean, kern, lik, x, y)
    assert np.allclose(np.asarray(alpha), np.asarray(post.alpha), atol=1e-6)
