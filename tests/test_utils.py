"""Checkpoint/metrics/tools tests (SURVEY.md §5 aux subsystems)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.utils import checkpoint as ckpt
from pygps_tpu.utils import metrics
from pygps_tpu.utils.tools import safe_cholesky, solve_chol, sq_dist


def test_safe_cholesky_clean_matrix():
    rng = np.random.default_rng(0)
    W = rng.standard_normal((10, 10))
    A = jnp.asarray(W @ W.T + 10 * np.eye(10))
    L, jit = safe_cholesky(A)
    assert float(jit) == 0.0
    assert np.allclose(np.asarray(L @ L.T), np.asarray(A), atol=1e-10)


def test_safe_cholesky_escalates_jitter():
    # singular matrix: needs jitter, still returns a usable factor
    v = jnp.ones((5, 1))
    A = v @ v.T                      # rank 1
    L, jit = safe_cholesky(A)
    assert float(jit) > 0.0
    assert np.all(np.isfinite(np.asarray(L)))


def test_safe_cholesky_grad_flows():
    A0 = jnp.eye(3) * 2.0

    def f(a):
        L, _ = safe_cholesky(a)
        return jnp.sum(jnp.log(jnp.diag(L)))

    g = jax.grad(f)(A0)
    assert np.allclose(np.diag(np.asarray(g)), 0.25)  # d(½logdet)/dA = ½A⁻¹


def test_safe_cholesky_grad_matches_plain_cholesky():
    """The guarded single-factorization fast path (round 5: the old
    probe-then-factor structure paid TWO factorizations on the happy
    path) must carry exactly jnp.linalg.cholesky's gradient — including
    ignoring cotangents on the structural-zero upper triangle."""
    rng = np.random.default_rng(7)
    W = rng.standard_normal((24, 24))
    A = jnp.asarray(W @ W.T + 24 * np.eye(24))

    def f_ref(a):
        L = jnp.linalg.cholesky(a)
        return jnp.sum(jnp.log(jnp.diag(L))) + jnp.sum(jnp.sin(L))

    def f_ours(a):
        L, _ = safe_cholesky(a)
        return jnp.sum(jnp.log(jnp.diag(L))) + jnp.sum(jnp.sin(L))

    g1 = np.asarray(jax.grad(f_ref)(A))
    g2 = np.asarray(jax.grad(f_ours)(A))
    assert np.allclose(g1, g2, atol=1e-12)


def test_safe_cholesky_ladder_path_grads_finite():
    """When the first factorization fails (rank-deficient input), the
    guarded VJP's sanitized residual must keep the zero cotangent from
    the untaken branch at zero (no 0·NaN leak), and the ladder factor's
    gradient must be finite."""
    rng = np.random.default_rng(8)
    U = jnp.asarray(rng.standard_normal((16, 5)))
    B = U @ U.T                       # rank 5 < 16

    def f(b):
        L, _ = safe_cholesky(b)
        return jnp.sum(jnp.log(jnp.diag(L)))

    L, jit = safe_cholesky(B)
    assert float(jit) > 0.0 and np.all(np.isfinite(np.asarray(L)))
    g = np.asarray(jax.grad(f)(B))
    assert np.all(np.isfinite(g))


def test_safe_cholesky_hopeless_input_short_circuits():
    """A non-finite input (diverged optimizer still evaluating) must NOT
    enter the jitter ladder — no rung can ever succeed, and the ladder
    would pay JITTER_MAX_TRIES futile factorizations per call (measured
    ~170 ms vs ~46 ms healthy at n=8192, MEASUREMENTS round-5).  The
    guard returns a NaN factor and NaN jitter (0.0 marks the happy path,
    >0 a successful rescue, NaN 'input was garbage')."""
    A = jnp.full((6, 6), jnp.nan)
    L, jit = safe_cholesky(A)
    assert np.all(np.isnan(np.asarray(L)))
    assert np.isnan(float(jit))

    # mixed: one NaN entry poisons the factor the same way
    B = jnp.eye(6).at[2, 3].set(jnp.nan).at[3, 2].set(jnp.nan)
    L2, jit2 = safe_cholesky(B)
    assert np.isnan(float(jit2))
    # gradients through the hopeless branch stay well-defined (NaN,
    # not an error), matching optimizer reject-step semantics
    g = jax.grad(lambda a: jnp.sum(safe_cholesky(a)[0]))(A)
    assert g.shape == A.shape


def test_solve_chol_roundtrip():
    rng = np.random.default_rng(1)
    W = rng.standard_normal((8, 8))
    A = jnp.asarray(W @ W.T + 8 * np.eye(8))
    L, _ = safe_cholesky(A)
    b = jnp.asarray(rng.standard_normal(8))
    x = solve_chol(L, b)
    assert np.allclose(np.asarray(A @ x), np.asarray(b), atol=1e-10)


def test_sq_dist_nonnegative_and_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((20, 3)))
    d2 = sq_dist(x, x)
    assert float(jnp.min(d2)) >= 0.0
    ref = ((np.asarray(x)[:, None] - np.asarray(x)[None, :]) ** 2).sum(-1)
    assert np.allclose(np.asarray(d2), ref, atol=1e-10)


def test_sq_dist_d1_fine_grid_f32():
    """Regression pin for the round-4 d=1 exact path: on a fine uniform
    1-D grid in f32, the norm-expansion form's ABSOLUTE cancellation
    noise (~eps·‖x‖²) swamps the true neighbor distances and can push
    Gram eigenvalues past −sn²; the direct-difference path is exact to
    relative eps (the n=65536 circulant-anchor failure mode)."""
    n = 4096
    x32 = jnp.asarray((np.arange(n) / n).astype(np.float32)[:, None])
    d2 = np.asarray(sq_dist(x32, x32))
    ref = (np.arange(n, dtype=np.float64)[:, None]
           - np.arange(n, dtype=np.float64)[None, :]) ** 2 / n**2
    # neighbor distances (the cancellation victims) must be exact-ish
    band = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) <= 4
    rel = np.abs(d2 - ref)[band & (ref > 0)] / ref[band & (ref > 0)]
    assert rel.max() < 1e-5, rel.max()
    # expansion form for comparison: its neighbor error is catastrophic
    xe = np.asarray(x32, np.float32)
    naive = (xe**2).sum(1)[:, None] + (xe**2).sum(1)[None, :] \
        - 2.0 * (xe @ xe.T)
    worst = np.abs(np.maximum(naive, 0) - ref)[band & (ref > 0)]
    assert worst.max() > 1e-8   # the failure mode the new path removes


def test_checkpoint_roundtrip_functors(tmp_path):
    path = str(tmp_path / "ck.npz")
    kern = pg.cov.RBF(0.3, 0.7) + pg.cov.Linear(-0.2)
    lik = pg.lik.Gauss(-1.5)
    ckpt.save(path, (kern, lik), meta={"note": "test"})
    like = (pg.cov.RBF() + pg.cov.Linear(), pg.lik.Gauss())
    (k2, l2), meta = ckpt.load(path, like)
    assert meta["note"] == "test"
    assert np.allclose(k2.hyp, kern.hyp)
    assert np.allclose(l2.hyp, lik.hyp)


def test_checkpoint_model_roundtrip(tmp_path):
    path = str(tmp_path / "model.npz")
    rng = np.random.default_rng(3)
    x = np.linspace(-2, 2, 20)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(20)
    m = pg.GPR()
    m.setData(x, y)
    m.optimize(numIterations=10)
    hyp_opt = m.covfunc.hyp
    ckpt.save_model(path, m)

    m2 = pg.GPR()
    ckpt.load_model(path, m2)
    assert np.allclose(m2.covfunc.hyp, hyp_opt)


def test_checkpoint_structure_mismatch_raises(tmp_path):
    path = str(tmp_path / "bad.npz")
    ckpt.save(path, pg.cov.RBF())
    with pytest.raises(ValueError):
        ckpt.load(path, (pg.cov.RBF(), pg.lik.Gauss()))


def test_metrics_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = metrics.MetricsLogger(path)
    log.log("nlml", value=1.5, grad_norm=0.1)
    log.log("chol", wall_s=0.02)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "nlml"
    assert lines[1]["wall_s"] == 0.02


def test_trace_span_runs():
    with metrics.trace_span("gram"):
        _ = jnp.ones((4, 4)) @ jnp.ones((4, 4))
    assert metrics.last_span("gram") is not None
