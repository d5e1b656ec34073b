"""Distributed exact-GP benchmark — the n=100k north-star configuration.

Target (BASELINE.md): n=100k Cholesky + solve < 2 s/iteration on 8 × v5e.
On this single-chip environment the script accepts --n/--devices to run
scaled-down; on a real pod slice run with the full configuration:

    python benchmarks/bench_dist.py --n 98304 --block 512

With one physical device it builds the virtual CPU mesh instead (smoke /
scaling-law measurement mode).  Reports wall-clock for sharded Gram,
distributed Cholesky, solve, and full NLML+grad, as JSON lines.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="force 8 virtual CPU devices")
    ap.add_argument("--sweep", action="store_true",
                    help="device-count sweep: report scaling efficiency "
                         "(wall-clock_1 / (p * wall-clock_p)) per op")
    ap.add_argument("--precision", choices=["highest", "high", "bf16"],
                    default="highest",
                    help="Cholesky trailing-update precision "
                         "(DistributedExact(precision=...))")
    ap.add_argument("--chunks", type=int, default=16,
                    help="pcholesky trailing-update column chunks")
    ap.add_argument("--chol-only", action="store_true",
                    help="only Gram + distributed Cholesky (kernel tuning)")
    args = ap.parse_args()

    import os

    if args.cpu_mesh:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import pygps_tpu as pg
    from pygps_tpu.parallel import mesh as pmesh
    from pygps_tpu.parallel.exact import DistributedExact
    from pygps_tpu.parallel.pcholesky import pcholesky, psolve_chol
    from pygps_tpu.parallel.ring_gram import gram_bc

    if args.sweep:
        _sweep(args)
        return

    ndev = args.devices or len(jax.devices())
    mesh = pmesh.make_mesh(ndev)
    p = mesh.devices.size
    n = pmesh.pad_to_blocks(args.n, args.block, p)
    print(json.dumps({"config": {"n": n, "d": args.d, "block": args.block,
                                 "devices": p,
                                 "precision": args.precision,
                                 "platform": jax.devices()[0].platform}}))

    rng = np.random.default_rng(0)
    dtype = (jnp.float64 if (jax.devices()[0].platform != "tpu"
                             and jax.config.jax_enable_x64)
             else jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, args.d)), dtype=dtype)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), dtype=dtype)
    kern = pg.cov.RBF(jnp.asarray(0.5, dtype), jnp.asarray(0.0, dtype))
    mean, lik = pg.mean.Zero(), pg.lik.Gauss(jnp.asarray(-1.0, dtype))
    eng = DistributedExact(mesh, block=args.block,
                           precision=args.precision)
    upd_dtype = eng.update_dtype

    _LAST = [0.0]

    def timed(name, fn, *a, reps=3):
        # scalar device->host fetch as the sync barrier: over the axon
        # tunnel block_until_ready can return before the device finishes
        def sync(o):
            # single-element fetch WITHOUT reshape (reshape of a large
            # sharded array materializes a full copy → OOM at n=32k)
            leaf = jax.tree_util.tree_leaves(o)[0]
            return float(leaf[(0,) * leaf.ndim])

        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
            sync(out)
        dt = (time.perf_counter() - t0) / reps
        _LAST[0] = dt
        print(json.dumps({"metric": name, "value": round(dt, 4),
                          "unit": "s"}))
        return out

    gram_j = jax.jit(lambda: gram_bc(kern, x, mesh, args.block,
                                     noise_diag=jnp.exp(-2.0)))
    K_bc = timed("sharded_gram_s", gram_j)
    chol_j = jax.jit(lambda K: pcholesky(K, mesh, update_dtype=upd_dtype,
                                         gemm_precision=eng.gemm_precision,
                                         n_col_chunks=args.chunks))
    L = timed("dist_cholesky_s", chol_j, K_bc)
    if args.chol_only:
        eff = n**3 / 3.0
        print(json.dumps({"metric": "effective_tf_per_s",
                          "value": round(eff / _LAST[0] / 1e12 / p, 1),
                          "note": "n^3/3 over wall, per device"}))
        return
    solve_j = jax.jit(lambda L, r: psolve_chol(L, r, mesh))
    timed("dist_solve_s", solve_j, L, y)

    # free the standalone-phase buffers (K_bc + L = n²/2 bytes) before
    # the end-to-end NLML+grad — at n=32768 they are 8 GiB of dead
    # weight against the 15.75 GiB HBM plan
    del K_bc, L
    import gc

    gc.collect()

    vgrad = jax.jit(jax.value_and_grad(
        lambda k: eng.nlml(mean, k, lik, x, y)))
    timed("nlml_grad_s", vgrad, kern, reps=2)


def _sweep(args):
    """Scaling-efficiency sweep over device counts (north-star metric:
    efficiency ≥ 0.8 at ≥2 hosts; on real hardware run once per slice
    size).  eff_p = t_1 / (p · t_p) for the distributed Cholesky."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import pygps_tpu as pg
    from pygps_tpu.parallel import mesh as pmesh
    from pygps_tpu.parallel.pcholesky import pcholesky

    total = len(jax.devices())
    counts = [p for p in (1, 2, 4, 8, 16, 32) if p <= total]
    n = pmesh.pad_to_blocks(args.n, args.block, max(counts))
    rng = np.random.default_rng(0)
    W = rng.standard_normal((n, 256))
    A = jnp.asarray(W @ W.T + n * np.eye(n))
    t_by_p = {}
    for p in counts:
        mesh = pmesh.make_mesh(p)
        Abc = pmesh.shard_bc(pmesh.to_block_cyclic(A, args.block, p), mesh)
        f = jax.jit(lambda K: pcholesky(K, mesh))
        out = f(Abc)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(Abc)
        jax.block_until_ready(out)
        t_by_p[p] = (time.perf_counter() - t0) / 3
    for p in counts:
        eff = t_by_p[counts[0]] / (p / counts[0]) / t_by_p[p]
        print(json.dumps({"metric": f"dist_chol_scaling_p{p}",
                          "wall_s": round(t_by_p[p], 4),
                          "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
