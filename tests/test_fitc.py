"""FITC sparse-GP tests.

Parity target: BASELINE.json configs[3] (FITC GPR, m inducing, synthetic).
Key invariant: FITC with inducing points == training points reproduces
exact inference (Quiñonero-Candela & Rasmussen 2005).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.core import kernels as cov
from pygps_tpu.inference import exact, fitc


def _toy(n=30, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-3, 3, n))[:, None]
    y = np.sin(x[:, 0]) + 0.2 * rng.standard_normal(n)
    return jnp.asarray(x), jnp.asarray(y)


def test_fitc_with_all_inducing_equals_exact():
    x, y = _toy()
    base = pg.cov.RBF(0.2, 0.1)
    lik = pg.lik.Gauss(-1.0)
    mean = pg.mean.Zero()
    k_fitc = cov.FITC(base, x)
    post_f, nlZ_f = fitc.exact_evaluate(mean, k_fitc, lik, x, y)
    nlZ_e = float(exact.nlml(mean, base, lik, x, y))
    # snu2 jitter perturbs slightly: tolerance accordingly
    assert np.isclose(float(nlZ_f), nlZ_e, rtol=1e-4)


def test_fitc_predictions_match_exact_with_all_inducing():
    x, y = _toy()
    xs = jnp.linspace(-3, 3, 13)[:, None]
    m_exact = pg.GPR()
    m_exact.setPrior(kernel=pg.cov.RBF(0.2, 0.1))
    m_exact.setNoise(-1.0)
    m_exact.setData(x, y)
    ym_e, ys2_e, fm_e, fs2_e, _ = m_exact.predict(xs)

    m_fitc = pg.GPR_FITC()
    m_fitc.setPrior(kernel=pg.cov.RBF(0.2, 0.1), inducing_points=x)
    m_fitc.setNoise(-1.0)
    m_fitc.setData(x, y)
    ym_f, ys2_f, fm_f, fs2_f, _ = m_fitc.predict(xs)
    assert np.allclose(fm_f, fm_e, atol=1e-4)
    assert np.allclose(fs2_f, fs2_e, atol=1e-3)


def test_gpr_fitc_end_to_end():
    x, y = _toy(n=60, seed=1)
    m = pg.GPR_FITC()
    m.setData(x, y)       # default inducing subsample
    assert m.u.shape[0] == min(60, m.DEFAULT_M)
    nlZ0, dnlZ, post = m.getPosterior()
    assert np.isfinite(nlZ0)
    assert not post.is_tril          # FITC posterior uses formula #2
    nlZ1, _ = m.optimize(numIterations=15)
    assert nlZ1 <= nlZ0 + 1e-9
    ym, ys2, fm, fs2, _ = m.predict(x)
    assert np.all(fs2 >= 0)
    # reasonable fit
    rmse = float(np.sqrt(np.mean((ym[:, 0] - np.asarray(y)) ** 2)))
    assert rmse < 0.5


def test_fitc_grad_matches_fd():
    import jax
    from jax.flatten_util import ravel_pytree

    x, y = _toy(n=20, seed=2)
    u = x[::3]
    mean = pg.mean.Zero()
    kern = cov.FITC(pg.cov.RBF(0.1, 0.2), u)
    lik = pg.lik.Gauss(-0.9)
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f(t):
        m, k, l = unravel(t)
        return fitc.exact_nlml(m, k, l, x, y)

    g = jax.grad(f)(theta)
    eps = 1e-6
    for i in range(len(theta)):
        e = jnp.zeros_like(theta).at[i].set(eps)
        fd = (f(theta + e) - f(theta - e)) / (2 * eps)
        assert np.isclose(float(g[i]), float(fd), rtol=1e-4, atol=1e-7), i


def test_gpc_fitc_end_to_end():
    rng = np.random.default_rng(3)
    x1 = rng.standard_normal((15, 2)) * 0.5 + 1.2
    x2 = rng.standard_normal((15, 2)) * 0.5 - 1.2
    x = np.vstack([x1, x2])
    y = np.concatenate([np.ones(15), -np.ones(15)])
    for inf_name in ["EP", "Laplace"]:
        m = pg.GPC_FITC()
        m.useInference(inf_name)
        m.setData(x, y)
        nlZ, _, post = m.getPosterior()
        assert np.isfinite(nlZ), inf_name
        ym, *_ = m.predict(x)
        assert np.mean(np.sign(ym[:, 0]) == y) > 0.85, inf_name


class _ExplicitKhat:
    """Dense kernel presenting the same K̂ = diag(D) + VᵀV matrix the
    structured FITC ops represent implicitly."""

    def __init__(self, kern, x):
        from pygps_tpu.inference.laplace import _fitc_ops

        ops, _ = _fitc_ops(kern, x)
        self._K = jnp.diag(ops.D) + ops.V.T @ ops.V

    def Ktrain(self, x):
        return self._K


def test_fitc_laplace_structured_equals_dense_on_khat():
    """Structured O(n·m²) FITC-Laplace == dense Laplace on explicit K̂."""
    from pygps_tpu.inference import laplace

    x, y = _toy(n=20, seed=4)
    yc = jnp.sign(y)
    u = x[::4]
    kern = cov.FITC(pg.cov.RBF(0.2, 0.2), u)
    mean, lik = pg.mean.Zero(), pg.lik.Erf()
    nl_struct = float(fitc.laplace_nlml(mean, kern, lik, x, yc))
    nl_dense = float(laplace.nlml(mean, _ExplicitKhat(kern, x), lik, x, yc))
    assert np.isclose(nl_struct, nl_dense, rtol=1e-8)


def test_fitc_ep_structured_equals_dense_on_khat():
    """Structured O(n·m²) FITC-EP == dense EP on explicit K̂."""
    from pygps_tpu.inference import ep

    x, y = _toy(n=20, seed=5)
    yc = jnp.sign(y)
    u = x[::4]
    kern = cov.FITC(pg.cov.RBF(0.2, 0.2), u)
    mean, lik = pg.mean.Zero(), pg.lik.Erf()
    nl_struct = float(fitc.ep_nlml(mean, kern, lik, x, yc))
    nl_dense = float(ep.nlml(mean, _ExplicitKhat(kern, x), lik, x, yc))
    assert np.isclose(nl_struct, nl_dense, rtol=1e-6)


def test_fitc_laplace_grad_matches_fd():
    import jax
    from jax.flatten_util import ravel_pytree

    x, y = _toy(n=16, seed=6)
    yc = jnp.sign(y)
    u = x[::4]
    mean = pg.mean.Zero()
    kern = cov.FITC(pg.cov.RBF(0.2, 0.2), u)
    lik = pg.lik.Erf()
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f(t):
        m, k, l = unravel(t)
        return fitc.laplace_nlml(m, k, l, x, yc)

    g = jax.grad(f)(theta)
    eps = 1e-6
    for i in range(len(theta)):
        e = jnp.zeros_like(theta).at[i].set(eps)
        fd = (f(theta + e) - f(theta - e)) / (2 * eps)
        assert np.isclose(float(g[i]), float(fd), rtol=5e-4, atol=1e-7), i
