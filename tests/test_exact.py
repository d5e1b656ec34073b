"""Exact inference: closed-form parity, gradients, end-to-end GPR.

Mirrors the reference's unit_test_inf.py + unit_test_model.py structure
(SURVEY.md §4) but adds numerical goldens computed from first principles
(the reference ships shape tests only).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.inference import exact


def _toy(n=25, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d))
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)
    return jnp.asarray(x), jnp.asarray(y)


def _dense_nlml_reference(x, y, log_ell, log_sf, log_sn):
    """First-principles NLML: N(y | 0, K + sn2 I) via numpy float64."""
    x = np.asarray(x)
    y = np.asarray(y)
    ell, sf2, sn2 = np.exp(log_ell), np.exp(2 * log_sf), np.exp(2 * log_sn)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    K = sf2 * np.exp(-0.5 * d2 / ell**2) + sn2 * np.eye(len(y))
    L = np.linalg.cholesky(K)
    a = np.linalg.solve(K, y)
    return float(0.5 * y @ a + np.log(np.diag(L)).sum()
                 + 0.5 * len(y) * np.log(2 * np.pi))


def test_nlml_matches_dense_gaussian():
    x, y = _toy()
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.3, 0.2), pg.lik.Gauss(-1.1)
    nlZ = exact.nlml(mean, kern, lik, x, y)
    ref = _dense_nlml_reference(x, y, 0.3, 0.2, -1.1)
    assert np.isclose(float(nlZ), ref, rtol=1e-9)


def test_grad_matches_finite_differences():
    x, y = _toy(n=15)
    mean, kern, lik = pg.mean.Const(0.2), pg.cov.RBF(0.1, -0.2), pg.lik.Gauss(-1.0)
    from jax.flatten_util import ravel_pytree

    theta, unravel = ravel_pytree((mean, kern, lik))

    def f(t):
        m, k, l = unravel(t)
        return exact.nlml(m, k, l, x, y)

    g = jax.grad(f)(theta)
    eps = 1e-6
    for i in range(len(theta)):
        e = jnp.zeros_like(theta).at[i].set(eps)
        fd = (f(theta + e) - f(theta - e)) / (2 * eps)
        assert np.isclose(float(g[i]), float(fd), rtol=1e-4, atol=1e-7), i


def test_posterior_predict_interpolates():
    # noiseless-limit GP regression must interpolate the training data
    # (well-separated inputs keep K's conditioning benign)
    x = np.linspace(-3, 3, 20)[:, None]
    y = np.sin(x[:, 0])
    m = pg.GPR()
    m.setData(x, y)
    m.setNoise(np.log(1e-4))
    ym, ys2, fm, fs2, lp = m.predict(x)
    assert np.allclose(ym[:, 0], np.asarray(y), atol=1e-3)
    assert np.all(fs2 >= 0)


def test_predict_prior_reversion_far_away():
    x, y = _toy(n=20, d=1)
    m = pg.GPR()
    m.setData(x, y)
    far = np.array([[100.0]])
    ym, ys2, fm, fs2, _ = m.predict(far)
    assert abs(fm[0, 0]) < 1e-6            # reverts to zero prior mean
    assert np.isclose(fs2[0, 0], 1.0, atol=1e-6)  # prior variance sf2=1


def test_optimize_reduces_nlml():
    x, y = _toy(n=30, d=1, seed=1)
    m = pg.GPR()
    m.setData(x, y)
    nlZ0, _, _ = m.getPosterior()
    nlZ1, _ = m.optimize(numIterations=30)
    assert nlZ1 <= nlZ0 + 1e-9


@pytest.mark.parametrize("method", ["Minimize", "SCG", "CG", "BFGS"])
def test_all_optimizers_descend(method):
    x, y = _toy(n=20, d=1, seed=2)
    m = pg.GPR()
    m.setData(x, y)
    nlZ0, _, _ = m.getPosterior()
    m.setOptimizer(method)
    nlZ1, _ = m.optimize(numIterations=15)
    assert nlZ1 <= nlZ0 + 1e-9


def test_getposterior_compat_returns_dnlz_lists():
    x, y = _toy(n=12)
    m = pg.GPR()
    m.setData(x, y)
    nlZ, dnlZ, post = m.getPosterior()
    assert len(dnlZ.cov) == 2       # RBF: log_ell, log_sigma
    assert len(dnlZ.lik) == 1       # Gauss: log_sigma
    assert len(dnlZ.mean) == 0      # Zero mean: no hyp
    assert post.alpha.shape == (12,)
    assert post.L.shape == (12, 12)


def test_ep_equals_exact_for_gaussian_likelihood():
    """EP with a Gaussian likelihood is exact: nlZ must match inf.Exact."""
    from pygps_tpu.inference import ep

    x, y = _toy(n=15)
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.2, 0.1), pg.lik.Gauss(-1.0)
    nl_exact = float(exact.nlml(mean, kern, lik, x, y))
    _, nl_ep, _ = ep.evaluate(mean, kern, lik, x, y)
    assert np.isclose(float(nl_ep), nl_exact, atol=2e-3)


def test_laplace_equals_exact_for_gaussian_likelihood():
    """Laplace with a Gaussian likelihood is exact (quadratic ψ)."""
    from pygps_tpu.inference import laplace

    x, y = _toy(n=15)
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.2, 0.1), pg.lik.Gauss(-1.0)
    nl_exact = float(exact.nlml(mean, kern, lik, x, y))
    nl_lap = float(laplace.nlml(mean, kern, lik, x, y))
    assert np.isclose(nl_lap, nl_exact, rtol=1e-6)


def test_laplace_grad_matches_fd():
    from pygps_tpu.inference import laplace
    from jax.flatten_util import ravel_pytree

    x, y = _toy(n=12, d=1, seed=3)
    yc = jnp.sign(y)  # ±1 targets
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.2, 0.3), pg.lik.Erf()
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f(t):
        m, k, l = unravel(t)
        return laplace.nlml(m, k, l, x, yc)

    g = jax.grad(f)(theta)
    eps = 1e-6
    for i in range(len(theta)):
        e = jnp.zeros_like(theta).at[i].set(eps)
        fd = (f(theta + e) - f(theta - e)) / (2 * eps)
        assert np.isclose(float(g[i]), float(fd), rtol=2e-4, atol=1e-7), i


def test_predict_full_and_posterior_samples():
    x = np.linspace(-3, 3, 25)[:, None]
    y = np.sin(x[:, 0])
    m = pg.GPR()
    m.setData(x, y)
    xs = np.linspace(-3, 3, 9)[:, None]
    fmu, Sig = m.predict_full(xs)
    # diagonal of the full covariance == marginal variances from predict
    _, _, fm, fs2, _ = m.predict(xs)
    assert np.allclose(fmu, fm[:, 0], atol=1e-10)
    assert np.allclose(np.diag(Sig), fs2[:, 0], atol=1e-8)
    w = np.linalg.eigvalsh(Sig)
    assert w.min() > -1e-8
    draws = m.posterior_samples(xs, n_samples=500, seed=1)
    assert draws.shape == (500, 9)
    assert np.allclose(draws.mean(0), fmu, atol=0.2)


def test_optimizer_random_restarts():
    """setOptimizer(num_restarts=...) explores hyp ranges and keeps the
    best (reference opt.py restart loop)."""
    x, y = _toy(n=20, d=1, seed=4)
    m = pg.GPR()
    m.setData(x, y)
    m.setOptimizer("Minimize", num_restarts=3,
                   covRange=[(-2.0, 2.0), (-2.0, 2.0)],
                   likRange=[(-3.0, 0.0)])
    nlZ0, _, _ = m.getPosterior()
    nlZ1, _ = m.optimize(numIterations=10)
    assert nlZ1 <= nlZ0 + 1e-9


def test_optimizer_min_threshold_early_stop():
    x, y = _toy(n=15, d=1, seed=5)
    m = pg.GPR()
    m.setData(x, y)
    m.setOptimizer("SCG", num_restarts=5, min_threshold=1e9,
                   covRange=[(-1.0, 1.0), (-1.0, 1.0)],
                   likRange=[(-2.0, 0.0)])
    nlZ1, _ = m.optimize(numIterations=8)   # threshold hit immediately
    assert np.isfinite(nlZ1)
