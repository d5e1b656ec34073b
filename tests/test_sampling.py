"""NUTS/HMC sampler tests: exactness on Gaussian targets, GP integration,
chain sharding over the virtual mesh, diagnostics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.inference import hmc as _hmc
from pygps_tpu.inference import nuts as _nuts
from pygps_tpu.inference.diagnostics import ess, split_rhat
from pygps_tpu.parallel import mesh as pmesh

DIM = 3
COV_DIAG = np.array([0.5, 1.0, 2.0])


def _gauss_logp(q):
    return -0.5 * jnp.sum(q * q / jnp.asarray(COV_DIAG))


@pytest.mark.parametrize("sampler,fn", [
    ("nuts", _nuts.sample_nuts), ("hmc", _hmc.sample_hmc)])
def test_gaussian_target_moments(sampler, fn):
    key = jax.random.PRNGKey(0)
    C = 8
    q0 = jax.random.normal(jax.random.PRNGKey(1), (C, DIM))
    samples, stats = jax.jit(lambda q, k: fn(
        _gauss_logp, q, k, num_warmup=400, num_samples=500))(q0, key)
    s = np.asarray(samples).reshape(-1, DIM)
    assert np.all(np.isfinite(s))
    assert np.allclose(s.mean(0), 0.0, atol=0.15)
    assert np.allclose(s.var(0), COV_DIAG, rtol=0.25)
    # healthy adaptation
    assert 0.5 < float(np.asarray(stats["accept_prob"]).mean()) <= 1.0


@pytest.mark.slow
def test_nuts_diagnostics_on_gaussian():
    key = jax.random.PRNGKey(2)
    q0 = jax.random.normal(jax.random.PRNGKey(3), (4, DIM))
    samples, _ = jax.jit(lambda q, k: _nuts.sample_nuts(
        _gauss_logp, q, k, num_warmup=300, num_samples=400))(q0, key)
    rhat = np.asarray(split_rhat(samples))
    assert np.all(rhat < 1.1)
    e = np.asarray(ess(samples))
    T, C, _ = samples.shape
    assert np.all(e > 0.05 * T * C)      # NUTS on a Gaussian mixes well
    assert np.all(e <= 1.5 * T * C)


def test_nuts_over_gp_hyperparameters():
    rng = np.random.default_rng(0)
    x = np.linspace(-3, 3, 25)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(25)
    m = pg.GPR()
    m.setData(x, y)
    samples, stats = m.sample(num_samples=100, num_warmup=150, num_chains=4,
                              seed=0)
    s = np.asarray(samples)
    assert s.shape == (100, 4, 3)
    assert np.all(np.isfinite(s))
    # posterior over log-noise should concentrate below 0 (true noise 0.1)
    assert np.median(s[:, :, 2]) < 0.0


def test_sharded_chains_match_structure():
    msh = pmesh.make_mesh(8)
    from pygps_tpu.parallel.sampling import sample_nuts_sharded

    key = jax.random.PRNGKey(4)
    C = 16
    q0 = jax.random.normal(jax.random.PRNGKey(5), (C, DIM))
    samples, stats = sample_nuts_sharded(
        _gauss_logp, q0, key, msh, num_warmup=200, num_samples=200)
    s = np.asarray(samples)
    assert s.shape == (200, C, DIM)
    assert np.all(np.isfinite(s))
    assert np.allclose(s.reshape(-1, DIM).var(0), COV_DIAG, rtol=0.35)
    rhat = np.asarray(split_rhat(jnp.asarray(s)))
    assert np.all(rhat < 1.15)


def test_sample_checkpoint_resume(tmp_path):
    """Checkpoint after a sampling run, resume without warmup, keep
    sampling from the saved chain state (SURVEY.md §5.3/§5.4)."""
    rng = np.random.default_rng(9)
    x = np.linspace(-3, 3, 20)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(20)
    m = pg.GPR()
    m.setData(x, y)
    ck = str(tmp_path / "chains.npz")
    s1, st1 = m.sample(num_samples=30, num_warmup=60, num_chains=4,
                       seed=0, checkpoint_to=ck)
    s2, st2 = m.sample(num_samples=30, num_warmup=0, num_chains=4,
                       seed=0, resume_from=ck)
    assert np.asarray(s2).shape == (30, 4, 3)
    assert np.all(np.isfinite(np.asarray(s2)))
    # resumed run reuses adapted step size
    assert np.isclose(float(st2["step_size"]), float(st1["step_size"]))
    # chains continue from the checkpointed state, not from scratch
    assert np.allclose(np.asarray(s2)[0].mean(0),
                       np.asarray(s1)[-5:].mean((0, 1)), atol=1.0)


def test_chunked_nuts_matches_one_shot():
    # chunk boundaries that divide warmup/draw counts reproduce the
    # monolithic scan bitwise (same pre-split keys, same step bodies)
    def logp(t):
        return -0.5 * jnp.sum(t * t)

    q0 = jax.random.normal(jax.random.PRNGKey(3), (4, 3))
    key = jax.random.PRNGKey(7)
    s1, st1 = jax.jit(lambda q, k: _nuts.sample_nuts(
        logp, q, k, num_warmup=8, num_samples=8, max_depth=4))(q0, key)
    s2, st2 = _nuts.sample_nuts_chunked(
        logp, q0, key, num_warmup=8, num_samples=8, max_depth=4,
        chunk_size=4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st1["step_size"]),
                               np.asarray(st2["step_size"]), rtol=1e-6)


def test_chunked_nuts_via_model_ragged_chunks():
    # non-dividing chunk size: extra draws trimmed, still a valid run
    rng = np.random.default_rng(0)
    x = np.linspace(-2, 2, 24)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(24)
    m = pg.GPR()
    m.setData(x, y)
    s, stats = m.sample(num_samples=10, num_warmup=6, num_chains=2,
                        seed=0, max_depth=4, chunk_size=4)
    assert s.shape[0] == 10 and s.shape[1] == 2
    assert np.isfinite(np.asarray(s)).all()
    assert 0.0 < float(np.asarray(stats["accept_prob"]).mean()) <= 1.0


def test_chain_chunked_nuts_matches_per_group_runs():
    # each group of chain_chunk chains must reproduce an independent
    # chunked run on its slice with the group's fold_in key (exact:
    # same compiled step bodies, same key splits)
    def logp(t):
        return -0.5 * jnp.sum(t * t)

    q0 = jax.random.normal(jax.random.PRNGKey(5), (8, 3))
    key = jax.random.PRNGKey(11)
    s, st = _nuts.sample_nuts_chain_chunked(
        logp, q0, key, num_warmup=8, num_samples=8, chain_chunk=4,
        chunk_size=4, max_depth=4)
    assert s.shape == (8, 8, 3)
    assert st["step_size"].shape == (2,)
    assert st["inv_mass"].shape == (2, 3)
    for g in range(2):
        sg, stg = _nuts.sample_nuts_chunked(
            logp, q0[g * 4:(g + 1) * 4], jax.random.fold_in(key, g),
            num_warmup=8, num_samples=8, chunk_size=4, max_depth=4)
        np.testing.assert_allclose(np.asarray(s[:, g * 4:(g + 1) * 4]),
                                   np.asarray(sg), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(st["step_size"][g]),
                                   np.asarray(stg["step_size"]), rtol=1e-6)


def test_chain_chunked_nuts_via_model():
    rng = np.random.default_rng(0)
    x = np.linspace(-2, 2, 24)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(24)
    m = pg.GPR()
    m.setData(x, y)
    s, stats = m.sample(num_samples=6, num_warmup=6, num_chains=6,
                        seed=0, max_depth=4, chunk_size=4, chain_chunk=3)
    assert s.shape == (6, 6, 1 + 1 + 1)  # RBF(ell, sf) + Gauss(sn)
    assert np.isfinite(np.asarray(s)).all()
    assert 0.0 < float(np.asarray(stats["accept_prob"]).mean()) <= 1.0
    with pytest.raises(ValueError, match="divisible"):
        _nuts.sample_nuts_chain_chunked(
            lambda t: -jnp.sum(t * t), jnp.zeros((5, 2)),
            jax.random.PRNGKey(0), chain_chunk=2)
