"""On-chip p=1 perf for the 2-D-layout engine (round-3 verdict item 2).

A (1×1) grid degenerates the collectives to no-ops, so this measures
the 2-D kernel bodies' single-chip cost — factor, in-layout inverse,
and end-to-end NLML+grad — against the 1-D engine at the same shapes.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import pygps_tpu as pg
from pygps_tpu.parallel import mesh as pmesh
from pygps_tpu.parallel.exact import DistributedExact
from pygps_tpu.parallel.exact2d import make_grid_mesh


def timed(name, fn, *a, reps=3):
    out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0] if leaf.ndim else leaf)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0] if leaf.ndim else leaf)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"metric": name,
                      "ms": round(statistics.median(ts) * 1e3, 1)}),
          flush=True)


def main(n=8192, block=1024, precision="bf16", factor_only=False):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
    kern = pg.cov.RBF(jnp.asarray(0.5, jnp.float32),
                      jnp.asarray(0.0, jnp.float32))
    mean, lik = pg.mean.Zero(), pg.lik.Gauss(jnp.asarray(-1.0, jnp.float32))
    upd = jnp.bfloat16 if precision == "bf16" else None
    gp = jax.lax.Precision.HIGH if precision == "high" else None

    grid = make_grid_mesh(1, 1)
    from pygps_tpu.parallel import pcholesky2d as p2
    from pygps_tpu.parallel.exact2d import gram_bc2d, pinv_chol2d

    # the probe's standalone input can't be buffer-reused unless donated
    # (in the engine the Gram is an intermediate of the same jit); the
    # Gram is rebuilt per rep, as in probe_pchol_sweep --don
    gram_j = jax.jit(lambda: gram_bc2d(kern, x, grid, block,
                                       noise_diag=jnp.asarray(
                                           0.135, jnp.float32)))
    chol2 = jax.jit(lambda K: p2.pcholesky2d(K, grid, update_dtype=upd,
                                             gemm_precision=gp),
                    donate_argnums=(0,))
    K2 = gram_j()
    L2 = chol2(K2)
    finite = bool(jax.jit(lambda L: jnp.isfinite(L).all())(L2))
    import statistics as _st
    ts = []
    for _ in range(3):
        del L2
        K2 = gram_j()
        jax.block_until_ready(K2)
        t0 = time.perf_counter()
        L2 = chol2(K2)
        float(L2[0, 0, 0, 0, 0, 0])
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"metric": f"pchol2d_n{n}_b{block}_{precision}"
                                f"_finite{finite}",
                      "ms": round(_st.median(ts) * 1e3, 1)}), flush=True)
    if factor_only:
        del K2, L2
    else:
        timed(f"pinv2d_n{n}_b{block}_{precision}",
              jax.jit(lambda L: pinv_chol2d(L, grid, update_dtype=upd,
                                            gemm_precision=gp)), L2)
        del K2, L2

    eng2 = DistributedExact(grid, block=block, layout="2d",
                            precision=precision)
    eng1 = DistributedExact(pmesh.make_mesh(1), block=block,
                            precision=precision)
    for tag, eng in (("2d", eng2), ("1d", eng1)):
        vg = jax.jit(jax.value_and_grad(
            lambda k, eng=eng: eng.nlml(mean, k, lik, x, y)))
        timed(f"nlml_grad_{tag}_n{n}_b{block}_{precision}", vg, kern,
              reps=2)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--precision", default="bf16",
                    choices=["bf16", "high", "highest"])
    ap.add_argument("--factor-only", action="store_true",
                    help="skip inverse + engine NLML (memory-tight n)")
    a = ap.parse_args()
    main(a.n, a.block, a.precision, a.factor_only)
