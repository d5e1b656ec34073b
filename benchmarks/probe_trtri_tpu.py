"""TPU probe: GEMM-blocked inverse-from-Cholesky vs TRSM solve_chol.

Context (MEASUREMENTS.md): the exact-NLML analytic backward computes
K̃⁻¹ via solve_chol(L, I) — two n×n TRSMs at ~7 TF/s on v5e.  This probe
measures (f32): raw HIGHEST-precision matmul rate, the TRSM formulation,
and ops/trtri.py's blocked GEMM formulation, plus end-to-end NLML+grad.

Run ON the TPU host (axon): python benchmarks/probe_trtri_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
cache = os.path.join(_root, ".jax_cache")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import pygps_tpu  # noqa: F401  (sets matmul precision policy)
    from pygps_tpu.ops.trtri import inv_from_chol
    from pygps_tpu.utils.tools import solve_chol

    def _sync(o):
        # over the axon tunnel block_until_ready can return early; a scalar
        # device->host fetch is the only reliable barrier (see bench.py)
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.asarray(leaf).reshape(-1)[0])

    def bench(f, *args, reps=5):
        o = f(*args)
        _sync(o)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*args)
            _sync(o)
        return (time.perf_counter() - t0) / reps, o

    for n in (4096, 8192):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n, 8)).astype(np.float32)
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        B = (np.exp(-0.5 * d2) / 0.01 + np.eye(n)).astype(np.float32)
        Bj = jnp.asarray(B)
        L = jax.block_until_ready(jnp.linalg.cholesky(Bj))

        A = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
        t, _ = bench(jax.jit(lambda a: a @ a), A)
        print(f"n={n} dense matmul(HIGHEST): {t*1e3:8.2f} ms "
              f"({2*n**3/t/1e12:5.1f} TF/s)")

        t_trsm, ref = bench(
            jax.jit(lambda l: solve_chol(l, jnp.eye(n, dtype=l.dtype))), L)
        print(f"n={n} solve_chol(L, I)      : {t_trsm*1e3:8.2f} ms "
              f"({2*n**3/t_trsm/1e12:5.1f} TF/s-equiv)")

        for b in (256, 512, 1024):
            t_new, out = bench(
                jax.jit(lambda l: inv_from_chol(l, b)), L)
            err = float(jnp.max(jnp.abs(out - ref)) /
                        jnp.max(jnp.abs(ref)))
            print(f"n={n} inv_from_chol b={b:4d} : {t_new*1e3:8.2f} ms "
                  f"(x{t_trsm/t_new:4.2f} vs trsm, rel err {err:.2e})")

    # end-to-end NLML+grad at n=8192 with each backward path
    from pygps_tpu import config, cov, lik, mean
    from pygps_tpu.inference import exact
    n = 8192
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    y = jnp.sin(x[:, 0]) + 0.1 * jnp.asarray(
        rng.standard_normal(n).astype(np.float32))
    prior = (mean.Zero(), cov.RBF(0.0, 0.0), lik.Gauss(-1.0))
    for flag in (False, True):
        config.use_gemm_inverse(flag)
        # fresh closure → fresh jit cache → the flag is re-read at trace
        vg = jax.jit(jax.value_and_grad(
            lambda pr: exact.nlml(pr[0], pr[1], pr[2], x, y)))
        t, _ = bench(vg, prior, reps=3)
        name = "GEMM-inverse" if flag else "TRSM solve  "
        print(f"n={n} NLML+grad [{name}]: {t*1e3:8.2f} ms")
    config.use_gemm_inverse(False)


if __name__ == "__main__":
    main()
