"""2-D block-cyclic process-grid Cholesky (parallel/pcholesky2d.py).

Runs on the 8-virtual-CPU-device mesh (conftest.py) arranged as a 2×4
grid; correctness vs dense np.linalg.cholesky, bf16-update accuracy,
and layout round-trips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygps_tpu.parallel import pcholesky2d as p2


PR, PC = 2, 4
N, B = 256, 16


@pytest.fixture(scope="module")
def grid():
    if len(jax.devices()) < PR * PC:
        pytest.skip("needs 8 devices")
    return p2.make_grid_mesh(PR, PC)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, 24))
    return jnp.asarray(A @ A.T + n * np.eye(n))


def test_layout_roundtrip():
    A = _spd(N)
    A2 = p2.to_block_cyclic_2d(A, B, PR, PC)
    assert A2.shape == (PR, PC, N // (B * PR), N // (B * PC), B, B)
    assert np.allclose(np.asarray(p2.from_block_cyclic_2d(A2)),
                       np.asarray(A))


def test_pcholesky2d_matches_dense(grid):
    A = _spd(N)
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, B, PR, PC), grid)
    L2 = p2.pcholesky2d(A2, grid)
    L = np.asarray(p2.from_block_cyclic_2d(L2, tril=True))
    Lref = np.linalg.cholesky(np.asarray(A))
    assert np.allclose(L, Lref, atol=1e-8 * N)


def test_pcholesky2d_logdet(grid):
    A = _spd(N, seed=3)
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, B, PR, PC), grid)
    L2 = p2.pcholesky2d(A2, grid)
    ld = float(p2.plogdet_chol2d(L2, grid))
    ref = float(np.linalg.slogdet(np.asarray(A))[1])
    assert abs(ld - ref) < 1e-8 * abs(ref) * N


def test_pcholesky2d_uneven_grid_chunks(grid):
    """nb not divisible by the default chunking: exercises the chunk-width
    fallback and the triangular suffix at every alignment."""
    n, b = 192, 8          # nb = 24 blocks; mc = 6 on the 2×4 grid
    A = _spd(n, seed=5)
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, b, PR, PC), grid)
    L2 = p2.pcholesky2d(A2, grid, n_col_chunks=5)
    L = np.asarray(p2.from_block_cyclic_2d(L2, tril=True))
    assert np.allclose(L, np.linalg.cholesky(np.asarray(A)),
                       atol=1e-8 * n)


def test_pcholesky2d_bf16_updates(grid):
    A = jnp.asarray(np.asarray(_spd(N, seed=7)), jnp.float32)
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, B, PR, PC), grid)
    L2 = p2.pcholesky2d(A2, grid, update_dtype=jnp.bfloat16)
    L = np.asarray(p2.from_block_cyclic_2d(L2, tril=True))
    Lref = np.linalg.cholesky(np.asarray(A, np.float64))
    rel = np.abs(L - Lref) / (np.abs(Lref) + 1e-3 * np.abs(Lref).max())
    assert np.nanmax(rel) < 0.1            # bf16 mantissa-level updates
    # reconstruction error is the meaningful metric
    rec = L @ L.T
    assert np.allclose(rec, np.asarray(A), rtol=2e-2, atol=2e-2 * N)


# ---------------------------------------------------------------------------
# Round 3: the 2-D layout as a full engine (solves / inverse / NLML+grad)
# ---------------------------------------------------------------------------


def test_psolve_chol2d_matches_dense(grid):
    from pygps_tpu.parallel import exact2d as e2

    A = _spd(N, seed=11)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(N))
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, B, PR, PC), grid)
    L2 = p2.pcholesky2d(A2, grid)
    x = np.asarray(e2.psolve_chol2d(L2, r, grid))
    ref = np.linalg.solve(np.asarray(A), np.asarray(r))
    assert np.allclose(x, ref, atol=1e-9 * N)


def test_psolve_tril2d_matches_dense(grid):
    from pygps_tpu.parallel import exact2d as e2

    A = _spd(N, seed=12)
    rng = np.random.default_rng(2)
    R = jnp.asarray(rng.standard_normal((N, 5)))
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, B, PR, PC), grid)
    L2 = p2.pcholesky2d(A2, grid)
    Z = np.asarray(e2.psolve_tril2d(L2, R, grid))
    Lref = np.linalg.cholesky(np.asarray(A))
    ref = np.linalg.solve(Lref, np.asarray(R))
    assert np.allclose(Z, ref, atol=1e-9 * N)


def test_pinv_chol2d_matches_dense(grid):
    from pygps_tpu.parallel import exact2d as e2

    A = _spd(N, seed=13)
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, B, PR, PC), grid)
    L2 = p2.pcholesky2d(A2, grid)
    X2 = e2.pinv_chol2d(L2, grid)
    X = np.asarray(p2.from_block_cyclic_2d(X2))
    ref = np.linalg.inv(np.asarray(A))
    assert np.allclose(X, ref, atol=1e-10 * N)


def test_pinv_chol2d_uneven_chunks(grid):
    """Chunk widths that do not divide evenly: exercises the fallback
    chunk shrink and the dynamic skip conditions at odd alignments."""
    from pygps_tpu.parallel import exact2d as e2

    n, b = 192, 8          # nb = 24; mr = 12, mc = 6 on the 2×4 grid
    A = _spd(n, seed=14)
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, b, PR, PC), grid)
    L2 = p2.pcholesky2d(A2, grid)
    X2 = e2.pinv_chol2d(L2, grid, n_chunks=5)
    X = np.asarray(p2.from_block_cyclic_2d(X2))
    assert np.allclose(X, np.linalg.inv(np.asarray(A)), atol=1e-10 * n)


def test_gram_bc2d_matches_dense(grid):
    from pygps_tpu.parallel import exact2d as e2
    import pygps_tpu as pg

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((N, 3)))
    kern = pg.cov.RBF(0.3, 0.1)
    K2 = e2.gram_bc2d(kern, x, grid, B, noise_diag=0.25)
    K = np.asarray(p2.from_block_cyclic_2d(K2))
    ref = np.asarray(kern.Ktrain(x)) + 0.25 * np.eye(N)
    assert np.allclose(K, ref, atol=1e-10)


def test_distributed_exact_2d_nlml_grad(grid):
    """End-to-end: DistributedExact(layout='2d') NLML + full hyp gradient
    matches the dense single-device engine to 1e-9 — the round-2 verdict
    bar for promoting the 2-D grid to a full engine."""
    from jax.flatten_util import ravel_pytree

    import pygps_tpu as pg
    from pygps_tpu.inference import exact as dense_exact
    from pygps_tpu.parallel.exact import DistributedExact

    rng = np.random.default_rng(21)
    n = 256
    x = jnp.asarray(rng.standard_normal((n, 3)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0])
                    + 0.1 * rng.standard_normal(n))
    prior = (pg.mean.Zero(), pg.cov.RBF(0.3, 0.1), pg.lik.Gauss(-1.0))
    theta, unravel = ravel_pytree(prior)

    def dense(t):
        m, k, l = unravel(t)
        return dense_exact.nlml(m, k, l, x, y)

    eng = DistributedExact(grid, block=16, layout="2d")

    def dist(t):
        m, k, l = unravel(t)
        return eng.nlml(m, k, l, x, y)

    v0, g0 = jax.value_and_grad(dense)(theta)
    v1, g1 = jax.jit(jax.value_and_grad(dist))(theta)
    assert abs(float(v1 - v0)) < 1e-9 * abs(float(v0))
    assert np.allclose(np.asarray(g1), np.asarray(g0), rtol=1e-8)


def test_distributed_exact_2d_predict(grid):
    """2-D-layout prediction matches the dense posterior predictive."""
    import pygps_tpu as pg
    from pygps_tpu.inference import exact as dense_exact
    from pygps_tpu.parallel.exact import DistributedExact

    rng = np.random.default_rng(22)
    n = 256
    x = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]))
    xs = jnp.asarray(rng.standard_normal((7, 2)))
    mean, kern, lik = pg.mean.Zero(), pg.cov.RBF(0.2, 0.0), pg.lik.Gauss(-1.5)

    eng = DistributedExact(grid, block=16, layout="2d")
    ym, ys2, fm, fs2 = eng.predict(mean, kern, lik, x, y, xs)

    # direct dense reference
    K = np.asarray(kern.Ktrain(x)) + np.exp(2 * float(lik.log_sigma)) * np.eye(n)
    Ks = np.asarray(kern.K(x, xs))
    al = np.linalg.solve(K, np.asarray(y))
    fm_ref = Ks.T @ al
    fs2_ref = np.asarray(kern.Kdiag(xs)) - np.einsum(
        "ij,ij->j", Ks, np.linalg.solve(K, Ks))
    assert np.allclose(np.asarray(fm), fm_ref, atol=1e-8)
    assert np.allclose(np.asarray(fs2), fs2_ref, atol=1e-8)


def test_pinv_chol2d_lower_triangle(grid):
    """triangle="lower": lower blocks exact, strict-upper blocks ZERO
    (the symmetry-skip bwd sweep, round-5; consumers double the lower
    cotangent instead of mirroring)."""
    from pygps_tpu.parallel import exact2d as e2

    A = _spd(N, seed=15)
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, B, PR, PC), grid)
    L2 = p2.pcholesky2d(A2, grid)
    X2 = e2.pinv_chol2d(L2, grid, triangle="lower")
    X = np.asarray(p2.from_block_cyclic_2d(X2))
    ref = np.linalg.inv(np.asarray(A))
    nb = N // B
    blk_row = np.repeat(np.arange(nb), B)
    low = blk_row[:, None] >= blk_row[None, :]       # block-lower mask
    assert np.allclose(X[low], ref[low], atol=1e-10 * N)
    assert np.all(X[~low] == 0.0)
    with pytest.raises(ValueError, match="triangle"):
        e2.pinv_chol2d(L2, grid, triangle="upper")


def test_nlml2d_grad_matches_dense_after_lower_inverse(grid):
    """End-to-end guard for the doubled-cotangent trick: the 2-D
    engine's NLML hyperparameter gradient (which now backs through the
    lower-only inverse) must still match the dense engine."""
    import pygps_tpu as pg
    from jax.flatten_util import ravel_pytree
    from pygps_tpu.inference import exact as dense_exact
    from pygps_tpu.parallel.exact import DistributedExact

    n, b = 128, 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, 3)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]))
    prior = (pg.mean.Zero(), pg.cov.RBF(0.1, 0.2), pg.lik.Gauss(-0.7))
    t0, unr = ravel_pytree(prior)
    eng = DistributedExact(grid, block=b, layout="2d")
    v2, g2 = jax.jit(jax.value_and_grad(
        lambda t: eng.nlml(*unr(t), x, y)))(t0)
    vr, gr = jax.jit(jax.value_and_grad(
        lambda t: dense_exact.nlml(*unr(t), x, y)))(t0)
    assert np.isclose(float(v2), float(vr), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(gr),
                               rtol=1e-6, atol=1e-9)

def test_pinv_chol2d_single_device_fast_path():
    """pr=pc=1 routes through the dense GEMM inverse (ops/trtri.py) —
    both triangle modes must match the dense inverse / its tril."""
    from pygps_tpu.parallel import exact2d as e2

    n, b = 128, 16
    A = _spd(n, seed=19)
    grid1 = p2.make_grid_mesh(1, 1)
    A2 = p2.shard_bc2d(p2.to_block_cyclic_2d(A, b, 1, 1), grid1)
    L2 = p2.pcholesky2d(A2, grid1)
    ref = np.linalg.inv(np.asarray(A))
    X = np.asarray(p2.from_block_cyclic_2d(
        e2.pinv_chol2d(L2, grid1)))
    assert np.allclose(X, ref, atol=1e-10 * n)
    # triangle="lower": lower blocks valid; upper UNSPECIFIED (the
    # fast path returns mirrored values, no zeroing pass)
    Xl = np.asarray(p2.from_block_cyclic_2d(
        e2.pinv_chol2d(L2, grid1, triangle="lower")))
    blk = np.repeat(np.arange(n // b), b)
    low = blk[:, None] >= blk[None, :]
    assert np.allclose(Xl[low], ref[low], atol=1e-10 * n)


def test_distributed_exact_2d_p1_grid_grad():
    """1×1 grid: the NLML backward takes the dense fast path (dense
    inverse + fused triangle-weighted cotangent + one layout transpose)
    and must match the dense engine's gradient exactly."""
    from jax.flatten_util import ravel_pytree

    import pygps_tpu as pg
    from pygps_tpu.inference import exact as dense_exact
    from pygps_tpu.parallel.exact import DistributedExact

    rng = np.random.default_rng(23)
    n = 128
    x = jnp.asarray(rng.standard_normal((n, 3)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]))
    prior = (pg.mean.Zero(), pg.cov.RBF(0.1, 0.2), pg.lik.Gauss(-0.7))
    t0, unr = ravel_pytree(prior)
    eng = DistributedExact(p2.make_grid_mesh(1, 1), block=16, layout="2d")
    v2, g2 = jax.jit(jax.value_and_grad(
        lambda t: eng.nlml(*unr(t), x, y)))(t0)
    vr, gr = jax.value_and_grad(
        lambda t: dense_exact.nlml(*unr(t), x, y))(t0)
    assert np.isclose(float(v2), float(vr), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(gr), rtol=1e-8)
