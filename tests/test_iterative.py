"""Iterative (CG/SLQ) exact-GP path vs the Cholesky engine."""

import numpy as np
import pytest

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


def _rbf_problem(n=240, sn2=1e-3, seed=7):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, 2)))
    kern = pg.cov.RBF(0.0, 0.0)
    K = kern.Ktrain(x)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0])
                    + 0.03 * rng.standard_normal(n))
    return x, y, kern, K, sn2


def test_pivoted_cholesky_low_rank_captures_rbf():
    from jax import lax
    from pygps_tpu.utils.pchol import pivoted_cholesky

    _, _, _, K, _ = _rbf_problem()
    row_fn = lambda p: lax.dynamic_index_in_dim(K, p, 0, keepdims=False)
    L, piv = pivoted_cholesky(row_fn, jnp.diag(K), 40)
    rel = float(jnp.linalg.norm(K - L.T @ L) / jnp.linalg.norm(K))
    assert rel < 1e-2                      # RBF spectrum decays fast
    # pivots are distinct
    assert len(np.unique(np.asarray(piv))) == 40
    # over-asking rank beyond numerical rank is safe (zero rows, finite)
    L2, _ = pivoted_cholesky(row_fn, jnp.diag(K), 239)
    assert np.all(np.isfinite(np.asarray(L2)))


def test_woodbury_precond_cuts_cg_iterations():
    from jax import lax
    from pygps_tpu.utils.pchol import (pivoted_cholesky,
                                       woodbury_preconditioner)

    _, _, _, K, sn2 = _rbf_problem()
    n = K.shape[0]
    rng = np.random.default_rng(8)
    B = jnp.asarray(rng.standard_normal((n, 2)))
    mv = lambda X: K @ X + sn2 * X
    row_fn = lambda p: lax.dynamic_index_in_dim(K, p, 0, keepdims=False)
    L, _ = pivoted_cholesky(row_fn, jnp.diag(K), 40)
    apply_inv, _, _ = woodbury_preconditioner(L, sn2)
    Xj, itj, _ = cg_solve(mv, B, tol=1e-10, max_iters=2000,
                          M_inv_diag=1.0 / (jnp.diag(K) + sn2))
    Xp, itp, _ = cg_solve(mv, B, tol=1e-10, max_iters=2000,
                          precond=apply_inv)
    assert np.allclose(np.asarray(Xj), np.asarray(Xp), atol=1e-6)
    assert int(itp) < int(itj) / 3         # observed ~10× on this problem


def test_precond_slq_logdet_accurate_where_plain_fails():
    from jax import lax
    from pygps_tpu.utils.pchol import (pivoted_cholesky,
                                       woodbury_preconditioner)

    _, _, _, K, sn2 = _rbf_problem()
    n = K.shape[0]
    ref = float(np.linalg.slogdet(np.asarray(K) + sn2 * np.eye(n))[1])
    mv = lambda X: K @ X + sn2 * X
    row_fn = lambda p: lax.dynamic_index_in_dim(K, p, 0, keepdims=False)
    L, _ = pivoted_cholesky(row_fn, jnp.diag(K), 40)
    _, apply_inv_sqrt, logdetP = woodbury_preconditioner(L, sn2)
    mv_hat = lambda X: apply_inv_sqrt(mv(apply_inv_sqrt(X)))
    est = float(logdetP + slq_logdet(mv_hat, n, jax.random.PRNGKey(0),
                                     num_probes=16, lanczos_iters=15,
                                     dtype=K.dtype))
    est_plain = float(slq_logdet(mv, n, jax.random.PRNGKey(0),
                                 num_probes=16, lanczos_iters=15,
                                 dtype=K.dtype))
    # ill-conditioned K̃: 15 Lanczos steps are nowhere near enough without
    # preconditioning, but the preconditioned spectrum clusters at 1
    assert abs(est - ref) / abs(ref) < 0.01
    assert abs(est_plain - ref) / abs(ref) > 0.05


def test_preconditioned_nlml_and_grad_match_cholesky():
    x, y, kern, _, sn2 = _rbf_problem()
    mean, lik = pg.mean.Zero(), pg.lik.Gauss(0.5 * float(np.log(sn2)))
    ref = float(exact.nlml(mean, kern, lik, x, y))
    est = float(iterative.nlml(mean, kern, lik, x, y, num_probes=16,
                               lanczos_iters=15, precond_rank=40))
    assert abs(est - ref) / abs(ref) < 0.02

    def f_it(ls):
        return iterative.nlml(mean, kern, pg.lik.Gauss(ls), x, y,
                              num_probes=64, lanczos_iters=15,
                              precond_rank=40)

    def f_ref(ls):
        return exact.nlml(mean, kern, pg.lik.Gauss(ls), x, y)

    ls = jnp.asarray(0.5 * float(np.log(sn2)))
    g_it = float(jax.grad(f_it)(ls))
    g_ref = float(jax.grad(f_ref)(ls))
    assert abs(g_it - g_ref) / max(abs(g_ref), 1.0) < 0.15


def test_posterior_solve_matches_dense():
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.linspace(-3, 3, 40)[:, None])
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]))
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Gauss(-1.0)
    alpha, it, res = iterative.posterior_solve(mean, kern, lik, x, y)
    post = exact.posterior(mean, kern, lik, x, y)
    assert np.allclose(np.asarray(alpha), np.asarray(post.alpha), atol=1e-6)


def test_adaptive_slq_meets_tolerance():
    """tol_nlz drives probe count: the adaptive estimate lands within the
    requested relative nlZ tolerance (round-1 verdict: accuracy as a user
    tolerance, not a fixed probe budget)."""
    x, y, kern, _, sn2 = _rbf_problem()
    mean, lik = pg.mean.Zero(), pg.lik.Gauss(0.5 * float(np.log(sn2)))
    ref = float(exact.nlml(mean, kern, lik, x, y))
    est = float(iterative.nlml(mean, kern, lik, x, y, num_probes=8,
                               lanczos_iters=15, precond_rank=40,
                               tol_nlz=3e-3, max_probes=512))
    assert abs(est - ref) / abs(ref) < 3e-3 * 4   # stderr target, 4σ slack


def test_adaptive_slq_uses_more_probes_when_tight():
    """Tighter tolerance ⇒ more probes drawn (the while_loop actually
    adapts)."""
    from pygps_tpu.utils.cg import slq_logdet_adaptive

    A = _spd(n=80, seed=2)
    mv = lambda V: A @ V
    _, p_loose, _ = slq_logdet_adaptive(mv, 80, jax.random.PRNGKey(0),
                                        tol_abs=50.0, lanczos_iters=30,
                                        min_probes=8, max_probes=512,
                                        dtype=A.dtype)
    _, p_tight, se = slq_logdet_adaptive(mv, 80, jax.random.PRNGKey(0),
                                         tol_abs=0.5, lanczos_iters=30,
                                         min_probes=8, max_probes=512,
                                         dtype=A.dtype)
    assert float(p_tight) > float(p_loose)
    ref = float(np.linalg.slogdet(np.asarray(A))[1])
    est, _, _ = slq_logdet_adaptive(mv, 80, jax.random.PRNGKey(0),
                                    tol_abs=0.5, lanczos_iters=30,
                                    min_probes=8, max_probes=512,
                                    dtype=A.dtype)
    assert abs(float(est) - ref) < 2.0            # 4× the stderr target


@pytest.mark.slow
def test_gradient_control_variate_accuracy():
    """The preconditioner control variate in the Hutchinson backward
    keeps dnlZ/dtheta within a few percent of dense autodiff at only 8
    probes, in BOTH spectrum regimes (long lengthscale: low-rank part
    carries the variate; short: the exact-diagonal correction does)."""
    from pygps_tpu.inference import exact

    rng = np.random.default_rng(3)
    n = 400
    x = rng.uniform(-3, 3, (n, 2))
    mean, lik = pg.mean.Zero(), pg.lik.Gauss(float(np.log(0.15)))
    y = np.sin(x[:, 0]) + 0.3 * x[:, 1] + 0.15 * rng.standard_normal(n)

    for log_ell, tol in ((0.3, 0.02), (-1.2, 0.08)):
        g_ref = float(jax.grad(lambda l: exact.nlml(
            mean, pg.cov.RBF(log_ell=l, log_sigma=0.1), lik, x, y))(log_ell))
        g_it = float(jax.grad(lambda l: iterative.nlml(
            mean, pg.cov.RBF(log_ell=l, log_sigma=0.1), lik, x, y,
            seed=0, num_probes=8, lanczos_iters=25, cg_tol=1e-10,
            cg_iters=1024, precond_rank=60))(log_ell))
        assert abs(g_it - g_ref) / abs(g_ref) < tol, (log_ell, g_it, g_ref)
