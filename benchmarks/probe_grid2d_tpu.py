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


def main(n=8192, block=1024, precision="bf16", factor_only=False,
         engine_only=False, inv_chunks=8, fwd_too=False, skip_1d=False):
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

    if engine_only:
        # fresh-process engine timing only: at n=32768 the standalone
        # factor/inverse timings hold extra full-size buffers and an OOM
        # wedges the device allocator for the rest of the process
        _engines(n, block, precision, mean, kern, lik, x, y, grid,
                 inv_chunks=inv_chunks, fwd_too=fwd_too, skip_1d=skip_1d)
        return

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
        # fault-isolated: the standalone inverse holds L2 + a full-size
        # output + slab transients simultaneously, which OOMs at
        # n=32768 (in the engine the Gram/factor are same-jit
        # intermediates and the buffers reuse); the decisive number is
        # the engine NLML+grad below
        for tri in ("lower", "full"):
            try:
                timed(f"pinv2d_{tri}_n{n}_b{block}_{precision}",
                      jax.jit(lambda L, tri=tri: pinv_chol2d(
                          L, grid, update_dtype=upd, gemm_precision=gp,
                          triangle=tri)), L2)
            except Exception as e:  # noqa: BLE001
                print(json.dumps(
                    {"metric": f"pinv2d_{tri}_n{n}_b{block}_{precision}",
                     "error": repr(e)[:120]}), flush=True)
        del K2, L2

    _engines(n, block, precision, mean, kern, lik, x, y, grid)


def _engines(n, block, precision, mean, kern, lik, x, y, grid,
             inv_chunks=8, fwd_too=False, skip_1d=False):
    eng2 = DistributedExact(grid, block=block, layout="2d",
                            precision=precision, inv_chunks=inv_chunks)
    eng1 = DistributedExact(pmesh.make_mesh(1), block=block,
                            precision=precision)
    engines = [("2d", eng2)] + ([] if skip_1d else [("1d", eng1)])
    for tag, eng in engines:
        if fwd_too:
            f = jax.jit(lambda k, eng=eng: eng.nlml(mean, k, lik, x, y))
            timed(f"nlml_fwd_{tag}_n{n}_b{block}_{precision}", f, kern,
                  reps=2)
        vg = jax.jit(jax.value_and_grad(
            lambda k, eng=eng: eng.nlml(mean, k, lik, x, y)))
        timed(f"nlml_grad_{tag}_n{n}_b{block}_{precision}"
              f"_ic{inv_chunks}", vg, kern, reps=2)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--precision", default="bf16",
                    choices=["bf16", "high", "highest"])
    ap.add_argument("--factor-only", action="store_true",
                    help="skip inverse + engine NLML (memory-tight n)")
    ap.add_argument("--engine-only", action="store_true",
                    help="only the 2-D/1-D engine NLML+grad timings")
    ap.add_argument("--inv-chunks", type=int, default=8)
    ap.add_argument("--fwd-too", action="store_true")
    ap.add_argument("--skip-1d", action="store_true")
    a = ap.parse_args()
    main(a.n, a.block, a.precision, a.factor_only, a.engine_only,
         a.inv_chunks, a.fwd_too, a.skip_1d)
