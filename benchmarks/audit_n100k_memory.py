"""AOT compile + memory audit of the n≈100k distributed NLML+grad program.

VERDICT round-3 item 3: nothing proved the n=100k, p=8 program actually
fits 16 GB/chip — the projection silently assumed it.  This audit
AOT-compiles the REAL programs against a v5e 2x4 TPU *topology* (no
devices needed — PJRT topology compilation through the same backend the
chip uses) at n=98304, p=8, and reports XLA's buffer-assignment peak
(argument + output + temp) per device, plus the collective schedule
facts (op counts, per-panel gather bytes).

Programs audited:
  * 1-D DistributedExact NLML+grad (precision="high", b=4096,
    lookahead on) — gram → factor → solve → analytic-VJP gradient.
  * 2-D (4x2 grid) exact2d NLML+grad core at the same shapes.

Usage:  python benchmarks/audit_n100k_memory.py [--n 98304] [--block 4096]
Writes one JSON line per program; exits nonzero on compile failure.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gib(x):
    return round(x / 2**30, 2)


def audit_1d(n, b, p, topo_devs):
    from pygps_tpu.parallel.exact import make_dist_nlml_core
    from pygps_tpu.parallel.ring_gram import gram_bc

    import pygps_tpu as pg

    mesh = Mesh(np.array(topo_devs), ("shard",))
    m = n // b // p
    core = make_dist_nlml_core(mesh, "shard",
                               gemm_precision=jax.lax.Precision.HIGH,
                               lookahead=True)

    def nlml_grad(x, y, log_ell, log_sf, log_sn):
        kern = pg.cov.RBF(log_ell, log_sf)
        sn2 = jnp.exp(2.0 * log_sn)

        def f(le, ls, lsn):
            K_bc = gram_bc(pg.cov.RBF(le, ls), x, mesh, b)
            return core(K_bc, jnp.zeros_like(y), jnp.exp(2.0 * lsn), y)

        return jax.value_and_grad(f, argnums=(0, 1, 2))(
            log_ell, log_sf, log_sn)

    xs = jax.ShapeDtypeStruct((n, 8), jnp.float32,
                              sharding=NamedSharding(mesh, P()))
    ys = jax.ShapeDtypeStruct((n,), jnp.float32,
                              sharding=NamedSharding(mesh, P()))
    sc = jax.ShapeDtypeStruct((), jnp.float32,
                              sharding=NamedSharding(mesh, P()))
    lowered = jax.jit(nlml_grad).lower(xs, ys, sc, sc, sc)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    txt = comp.as_text()
    return comp, {
        "program": "1d_nlml_grad_high_lookahead",
        "n": n, "block": b, "p": p,
        "temp_gib_per_device": gib(ma.temp_size_in_bytes),
        "args_gib_per_device": gib(ma.argument_size_in_bytes),
        "out_gib_per_device": gib(ma.output_size_in_bytes),
        "peak_gib_per_device": gib(ma.temp_size_in_bytes
                                   + ma.argument_size_in_bytes
                                   + ma.output_size_in_bytes),
        "hbm_budget_gib": 16.0,
        "n_all_gather": txt.count(" all-gather("),
        "n_all_reduce": txt.count(" all-reduce("),
        "gather_bytes_per_panel_per_dev": n * b * 4,
    }


def audit_2d(n, b, pr, pc, topo_devs):
    from pygps_tpu.parallel import exact2d

    import pygps_tpu as pg

    mesh = exact2d.make_grid_mesh(pr, pc, devices=list(topo_devs))
    axes = tuple(mesh.axis_names)
    core = exact2d.make_dist_nlml_core2d(
        mesh, axes, gemm_precision=jax.lax.Precision.HIGH)

    def nlml_grad(x, y, log_ell, log_sf, log_sn):
        def f(le, ls, lsn):
            K2 = exact2d.gram_bc2d(pg.cov.RBF(le, ls), x, mesh, b, axes)
            return core(K2, jnp.zeros_like(y), jnp.exp(2.0 * lsn), y)

        return jax.value_and_grad(f, argnums=(0, 1, 2))(
            log_ell, log_sf, log_sn)

    xs = jax.ShapeDtypeStruct((n, 8), jnp.float32,
                              sharding=NamedSharding(mesh, P()))
    ys = jax.ShapeDtypeStruct((n,), jnp.float32,
                              sharding=NamedSharding(mesh, P()))
    sc = jax.ShapeDtypeStruct((), jnp.float32,
                              sharding=NamedSharding(mesh, P()))
    lowered = jax.jit(nlml_grad).lower(xs, ys, sc, sc, sc)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    txt = comp.as_text()
    return comp, {
        "program": "2d_nlml_grad_high",
        "n": n, "block": b, "grid": [pr, pc],
        "temp_gib_per_device": gib(ma.temp_size_in_bytes),
        "args_gib_per_device": gib(ma.argument_size_in_bytes),
        "out_gib_per_device": gib(ma.output_size_in_bytes),
        "peak_gib_per_device": gib(ma.temp_size_in_bytes
                                   + ma.argument_size_in_bytes
                                   + ma.output_size_in_bytes),
        "hbm_budget_gib": 16.0,
        "n_all_gather": txt.count(" all-gather("),
        "n_all_reduce": txt.count(" all-reduce("),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=98304)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--skip-2d", action="store_true")
    args = ap.parse_args()

    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    devs = topo.devices
    rc = 0
    try:
        _, rec = audit_1d(args.n, args.block, 8, devs)
        print(json.dumps(rec), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"program": "1d", "error": repr(e)[:500]}),
              flush=True)
        rc = 1
    if not args.skip_2d:
        try:
            _, rec = audit_2d(args.n, args.block, 4, 2, devs)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"program": "2d", "error": repr(e)[:500]}),
                  flush=True)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
