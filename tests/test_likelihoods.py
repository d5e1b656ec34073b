"""Likelihood tests: closed forms vs quadrature/autodiff fallbacks.

Mirrors unit_test_lik.py shape/finiteness checks and adds cross-validation
of every closed form against the generic Gauss–Hermite + autodiff base
implementations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.core.likelihoods import Erf, Gauss, Laplace, Likelihood, Logistic

N = 9
rng = np.random.default_rng(2)
MU = jnp.asarray(rng.standard_normal(N) * 0.8)
S2 = jnp.asarray(np.abs(rng.standard_normal(N)) * 0.5 + 0.1)
Y_PM1 = jnp.asarray(np.sign(rng.standard_normal(N)))
Y_REAL = jnp.asarray(rng.standard_normal(N))


def _base_ep(lik, y, mu, s2):
    return Likelihood.ep_moments(lik, y, mu, s2)


def _base_laplace(lik, y, f):
    return Likelihood.laplace_derivs(lik, y, f)


@pytest.mark.parametrize("lik,y", [
    (Gauss(-0.7), Y_REAL),
    (Erf(), Y_PM1),
    (Logistic(), Y_PM1),
])
def test_closed_form_laplace_derivs_match_autodiff(lik, y):
    lp, d1, d2, d3 = lik.laplace_derivs(y, MU)
    lp2, e1, e2, e3 = _base_laplace(lik, y, MU)
    for a, b in zip((lp, d1, d2, d3), (lp2, e1, e2, e3)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-8)


@pytest.mark.parametrize("lik,y", [
    (Gauss(-0.7), Y_REAL),
    (Erf(), Y_PM1),
])
def test_closed_form_ep_moments_match_quadrature(lik, y):
    lZ, dlZ, d2lZ = lik.ep_moments(y, MU, S2)
    qZ, q1, q2 = _base_ep(lik, y, MU, S2)
    assert np.allclose(np.asarray(lZ), np.asarray(qZ), atol=1e-6)
    assert np.allclose(np.asarray(dlZ), np.asarray(q1), atol=1e-5)
    assert np.allclose(np.asarray(d2lZ), np.asarray(q2), atol=1e-4)


@pytest.mark.parametrize("lik,y", [
    (Gauss(-0.7), Y_REAL),
    (Erf(), Y_PM1),
    (Laplace(-0.7), Y_REAL),
    (Logistic(), Y_PM1),
])
def test_predict_shapes_and_finiteness(lik, y):
    lp, ymu, ys2 = lik.predict(MU, S2, y=y)
    assert lp.shape == ymu.shape == ys2.shape == (N,)
    assert np.all(np.isfinite(np.asarray(lp)))
    assert np.all(np.asarray(ys2) >= 0)
    lp2, ymu2, ys22 = lik.predict(MU, S2)
    assert lp2 is None
    assert np.allclose(np.asarray(ymu), np.asarray(ymu2))


def test_gauss_predict_values():
    lik = Gauss(jnp.log(0.3))
    lp, ymu, ys2 = lik.predict(MU, S2, y=Y_REAL)
    assert np.allclose(np.asarray(ymu), np.asarray(MU))
    assert np.allclose(np.asarray(ys2), np.asarray(S2) + 0.09)


def test_erf_predict_probability_bounds():
    lik = Erf()
    _, ymu, ys2 = lik.predict(MU, S2)
    p = (np.asarray(ymu) + 1) / 2
    assert np.all((p > 0) & (p < 1))
    assert np.allclose(np.asarray(ys2), 1 - np.asarray(ymu) ** 2, atol=1e-12)


def test_erf_extreme_inputs_stable():
    lik = Erf()
    f = jnp.asarray([-40.0, -10.0, 0.0, 10.0, 40.0])
    y = jnp.ones(5)
    lp, d1, d2, d3 = lik.laplace_derivs(y, f)
    assert np.all(np.isfinite(np.asarray(lp)))
    assert np.all(np.isfinite(np.asarray(d1)))
    assert np.all(np.isfinite(np.asarray(d2)))
    lZ, dlZ, d2lZ = lik.ep_moments(y, f, jnp.full(5, 0.5))
    assert np.all(np.isfinite(np.asarray(lZ)))
    assert np.all(np.isfinite(np.asarray(dlZ)))


def test_compat_evaluate_prediction_mode():
    lik = Gauss(-0.7)
    out = lik.evaluate(np.asarray(Y_REAL), np.asarray(MU), np.asarray(S2),
                       None, None, nargout=3)
    lp, ymu, ys2 = out
    assert lp.shape == (N, 1) and ymu.shape == (N, 1) and ys2.shape == (N, 1)


def test_compat_evaluate_inference_modes():
    from pygps_tpu.inference import engines

    lik = Erf()
    lZ, dlZ, d2lZ = lik.evaluate(np.asarray(Y_PM1), np.asarray(MU),
                                 np.asarray(S2), engines.EP(), None, nargout=3)
    assert lZ.shape == (N, 1)
    lp, d1, d2, d3 = lik.evaluate(np.asarray(Y_PM1), np.asarray(MU), None,
                                  engines.Laplace(), None, nargout=4)
    assert d3.shape == (N, 1)
