"""Mean function tests (reference unit_test_mean.py pattern + values)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.core import means

N, D = 9, 3
rng = np.random.default_rng(1)
X = jnp.asarray(rng.standard_normal((N, D)))


def all_means():
    return [
        means.Zero(),
        means.One(),
        means.Const(1.7),
        means.Linear(alpha=jnp.arange(1.0, D + 1)),
        means.Const(2.0) + means.One(),
        means.Const(2.0) * means.Linear(alpha=jnp.ones(D)),
        3.0 * means.Const(1.0),
        means.Const(2.0) ** 3,
    ]


@pytest.mark.parametrize("m", all_means(), ids=lambda m: repr(m)[:40])
def test_shapes_finite_grads(m):
    v = m(X)
    assert v.shape == (N,)
    assert np.all(np.isfinite(np.asarray(v)))

    def loss(mm):
        return jnp.sum(mm(X) ** 2)

    g = jax.grad(loss)(m)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_values():
    assert np.allclose(np.asarray(means.Zero()(X)), 0.0)
    assert np.allclose(np.asarray(means.One()(X)), 1.0)
    assert np.allclose(np.asarray(means.Const(2.5)(X)), 2.5)
    a = jnp.arange(1.0, D + 1)
    assert np.allclose(np.asarray(means.Linear(alpha=a)(X)),
                       np.asarray(X @ a))
    assert np.allclose(np.asarray((means.Const(2.0) ** 3)(X)), 8.0)
    assert np.allclose(np.asarray((means.Const(2.0) + means.One())(X)), 3.0)
    assert np.allclose(np.asarray((means.Const(2.0) * means.Const(3.0))(X)), 6.0)
    assert np.allclose(np.asarray((4.0 * means.Const(2.0))(X)), 8.0)


def test_compat_getmean_and_der():
    m = means.Linear(alpha=jnp.ones(D))
    gm = m.getMean(np.asarray(X))
    assert gm.shape == (N, 1)
    d0 = m.getDerMatrix(x=np.asarray(X), der=0)
    assert d0.shape == (N, 1)
    assert np.allclose(np.asarray(d0)[:, 0], np.asarray(X)[:, 0])
