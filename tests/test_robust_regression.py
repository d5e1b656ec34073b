"""Robust regression: Laplace likelihood with EP/Laplace inference
(reference lik.Laplace use case) + predict batching equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

import pygps_tpu as pg


def _outlier_data(n=40, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(-3, 3, n)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)
    y[5] += 4.0          # gross outliers
    y[25] -= 5.0
    return x, y


@pytest.mark.slow
def test_laplace_likelihood_is_robust_to_outliers():
    x, y = _outlier_data()
    xs = x
    truth = np.sin(x[:, 0])

    m_g = pg.GPR()
    m_g.setData(x, y)
    m_g.optimize(numIterations=20)
    rmse_gauss = float(np.sqrt(np.mean(
        (m_g.predict(xs)[2][:, 0] - truth) ** 2)))

    m_r = pg.GP()
    m_r.useLikelihood(pg.lik.Laplace(np.log(0.2)))
    m_r.useInference("EP")
    m_r.setPrior(kernel=pg.cov.RBF(0.0, 0.0))
    m_r.setData(x, y)
    m_r.optimize(numIterations=20)
    nlZ = m_r.nlZ
    assert np.isfinite(nlZ)
    fr = m_r.predict(xs)[2][:, 0]
    rmse_rob = float(np.sqrt(np.mean((fr - truth) ** 2)))
    assert rmse_rob < 0.8                      # sane fit overall
    # the robust posterior must NOT chase the gross outliers
    assert abs(fr[5] - y[5]) > 2.0
    assert abs(fr[25] - y[25]) > 3.0
    assert abs(fr[5] - truth[5]) < 1.0
    assert abs(fr[25] - truth[25]) < 1.0
    del rmse_gauss                              # baseline computed above


def test_laplace_inference_with_laplace_likelihood():
    x, y = _outlier_data(seed=1)
    m = pg.GP()
    m.useLikelihood(pg.lik.Laplace(np.log(0.2)))
    m.useInference("Laplace")
    m.setPrior(kernel=pg.cov.RBF(0.0, 0.0))
    m.setData(x, y)
    nlZ, _, post = m.getPosterior()
    assert np.isfinite(nlZ)
    ym, *_ = m.predict(x)
    assert np.all(np.isfinite(ym))


def test_predict_batched_equals_unbatched():
    rng = np.random.default_rng(2)
    x = np.linspace(-3, 3, 30)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(30)
    m = pg.GPR()
    m.setData(x, y)
    xs = np.linspace(-4, 4, 57)[:, None]   # not divisible by batch
    full = m.predict(xs, ys=np.cos(xs[:, 0]))
    batched = m.predict(xs, ys=np.cos(xs[:, 0]), batch_size=16)
    for a, b in zip(full, batched):
        assert np.allclose(a, b, atol=1e-12)
