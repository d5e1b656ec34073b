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
