"""GPC (EP & Laplace) and GPMC end-to-end tests.

Parity targets: BASELINE.json configs[1] (EP-GPC, cum-Gauss likelihood) and
configs[2] (Laplace-GPC, composite RBF+Linear kernel) on demo-style
two-cluster data (reference demo_GPC.py layout).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg


def two_clusters(n_per=20, seed=0):
    rng = np.random.default_rng(seed)
    x1 = rng.standard_normal((n_per, 2)) * 0.6 + np.array([1.5, 1.5])
    x2 = rng.standard_normal((n_per, 2)) * 0.6 + np.array([-1.5, -1.5])
    x = np.vstack([x1, x2])
    y = np.concatenate([np.ones(n_per), -np.ones(n_per)])
    return x, y


@pytest.mark.parametrize("inf_name", ["EP", "Laplace"])
def test_gpc_separates_clusters(inf_name):
    x, y = two_clusters()
    m = pg.GPC()
    m.useInference(inf_name)
    m.setData(x, y)
    nlZ, dnlZ, post = m.getPosterior()
    assert np.isfinite(nlZ)
    assert all(np.isfinite(v) for v in dnlZ.cov)
    # predict at the cluster centers: confident correct classification
    ym, ys2, fm, fs2, lp = m.predict(
        np.array([[1.5, 1.5], [-1.5, -1.5]]),
        ys=np.array([1.0, -1.0]))
    p_plus = (ym[:, 0] + 1) / 2
    assert p_plus[0] > 0.8
    assert p_plus[1] < 0.2
    assert np.all(lp[:, 0] > np.log(0.5))   # correct label more likely


@pytest.mark.parametrize("inf_name", ["EP", "Laplace"])
def test_gpc_optimize_descends(inf_name):
    x, y = two_clusters(n_per=15, seed=1)
    m = pg.GPC()
    m.useInference(inf_name)
    m.setData(x, y)
    nlZ0, _, _ = m.getPosterior()
    nlZ1, _ = m.optimize(numIterations=10)
    assert nlZ1 <= nlZ0 + 1e-6


def test_gpc_composite_kernel_laplace():
    """configs[2]: Laplace-GPC with sum RBF+Linear kernel."""
    x, y = two_clusters(n_per=15, seed=2)
    m = pg.GPC()
    m.useInference("Laplace")
    m.setPrior(kernel=pg.cov.RBF(0.0, 0.0) + pg.cov.Linear(0.0))
    m.setData(x, y)
    nlZ, dnlZ, post = m.getPosterior()
    assert np.isfinite(nlZ)
    assert len(dnlZ.cov) == 3   # RBF(2) + Linear(1)
    ym, *_ = m.predict(x)
    acc = np.mean(np.sign(ym[:, 0]) == y)
    assert acc > 0.9


def test_ep_laplace_nlml_close():
    """EP and Laplace approximate the same evidence — they should agree to
    a few percent on easy data (sanity anchor used in GPML docs)."""
    x, y = two_clusters(n_per=15, seed=3)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.5, 0.5), pg.lik.Erf()
    from pygps_tpu.inference import ep, laplace

    nl_ep = float(ep.nlml(mean, kern, lik, xj, yj))
    nl_lap = float(laplace.nlml(mean, kern, lik, xj, yj))
    assert abs(nl_ep - nl_lap) / abs(nl_lap) < 0.15


def test_ep_grad_matches_fd():
    from jax.flatten_util import ravel_pytree
    from pygps_tpu.inference import ep

    x, y = two_clusters(n_per=8, seed=4)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.3, 0.2), pg.lik.Erf()
    theta, unravel = ravel_pytree((mean, kern, lik))

    def f(t):
        m, k, l = unravel(t)
        return ep.nlml(m, k, l, xj, yj)

    g = jax.grad(f)(theta)
    eps = 1e-5
    for i in range(len(theta)):
        e = jnp.zeros_like(theta).at[i].set(eps)
        fd = (f(theta + e) - f(theta - e)) / (2 * eps)
        # EP fixed point is only converged to _TOL: modest tolerance
        assert np.isclose(float(g[i]), float(fd), rtol=2e-2, atol=1e-5), i


def test_ep_analytic_grad_matches_autodiff():
    """The analytic fixed-point gradient (energy_fixed_sites_dense,
    GPML F-form) vs full autodiff through the differentiable energy —
    both valid at the EP fixed point, agreeing to O(site residual).
    Uses a Gauss likelihood too, exercising the lik-parameter term."""
    from jax.flatten_util import ravel_pytree
    from pygps_tpu import config
    from pygps_tpu.inference import ep

    x, y = two_clusters(n_per=8, seed=11)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    for lik in (pg.lik.Erf(), pg.lik.Gauss(-0.8)):
        mean, kern = pg.mean.Const(0.1), pg.cov.RBF(0.25, 0.15)
        theta, unravel = ravel_pytree((mean, kern, lik))

        def f(t):
            m, k, l = unravel(t)
            return ep.nlml(m, k, l, xj, yj)

        try:
            config.EP_ANALYTIC_GRAD = True
            v_fast, g_fast = jax.value_and_grad(f)(theta)
            config.EP_ANALYTIC_GRAD = False
            v_ref, g_ref = jax.value_and_grad(f)(theta)
        finally:
            config.EP_ANALYTIC_GRAD = True
        assert np.isclose(float(v_fast), float(v_ref), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   rtol=2e-3, atol=1e-6)


def test_gpmc_three_classes():
    rng = np.random.default_rng(5)
    centers = np.array([[2.0, 0.0], [-1.0, 2.0], [-1.0, -2.0]])
    x = np.vstack([rng.standard_normal((12, 2)) * 0.5 + c for c in centers])
    y = np.repeat(np.arange(3), 12)
    m = pg.GPMC(n_class=3)
    m.setData(x, y)
    vote, pred = m.fitAndPredict(centers)
    assert vote.shape == (3, 3)
    assert np.allclose(vote.sum(axis=1), 1.0)
    assert list(pred) == [0, 1, 2]


def test_gpc_logistic_likelihood():
    x, y = two_clusters(n_per=10, seed=6)
    m = pg.GPC()
    m.useInference("Laplace")
    m.useLikelihood("Logistic")
    m.setData(x, y)
    nlZ, _, _ = m.getPosterior()
    assert np.isfinite(nlZ)
    ym, *_ = m.predict(x)
    assert np.mean(np.sign(ym[:, 0]) == y) > 0.9


def test_ep_lowrank_presolve_same_fixed_point():
    """The low-rank pre-EP cold-start accelerator lands on the same dense
    fixed point (nlZ and sites) as plain cold-started dense EP."""
    import jax.numpy as jnp
    from pygps_tpu.inference import ep as iep

    rng = np.random.default_rng(11)
    n = 300
    x = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sign(np.asarray(x)[:, 0] +
                            0.3 * rng.standard_normal(n)))
    mean, kern, lk = pg.mean.Zero(), pg.cov.RBF(0.2, 0.3), pg.lik.Erf()
    _, nlZ0, (tt0, tn0) = iep.evaluate(mean, kern, lk, x, y, pre_rank=0)
    _, nlZ1, (tt1, tn1) = iep.evaluate(mean, kern, lk, x, y, pre_rank=64)
    assert abs(float(nlZ0) - float(nlZ1)) < 5e-3
    assert np.allclose(np.asarray(tt0), np.asarray(tt1), atol=5e-3)
