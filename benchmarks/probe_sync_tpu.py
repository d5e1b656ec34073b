"""Timing-methodology probe for the axon tunnel.

Observed: `jax.block_until_ready` on a remote (tunnel) array can return
before the computation finishes — a 4096³ HIGHEST matmul "measured"
0.08 ms (1758 TF/s), physically impossible on one v5e.  This probe
compares three sync methods on the same op so every other benchmark can
use one that is actually synchronous:

  A. block_until_ready(out)            (suspect)
  B. float(jnp.sum(out)) per rep       (forces a 4-byte device→host read)
  C. np.asarray(out[:1, :1]) per rep   (tiny slice transfer)

Run ON the TPU host: python benchmarks/probe_sync_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import pygps_tpu  # noqa: F401  (matmul precision policy)

    n = 4096
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

    mm = jax.jit(lambda a: a @ a)
    mm_s = jax.jit(lambda a: jnp.sum(a @ a))
    flops = 2 * n**3

    # warm
    jax.block_until_ready(mm(A))
    jax.block_until_ready(mm_s(A))

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        o = mm(A)
    jax.block_until_ready(o)
    tA = (time.perf_counter() - t0) / reps
    print(f"A block_until_ready : {tA*1e3:8.2f} ms ({flops/tA/1e12:6.1f} TF/s)")

    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(mm_s(A))
    tB = (time.perf_counter() - t0) / reps
    print(f"B float(sum) per rep: {tB*1e3:8.2f} ms ({flops/tB/1e12:6.1f} TF/s)")

    t0 = time.perf_counter()
    for _ in range(reps):
        v = np.asarray(mm(A)[:1, :1])
    tC = (time.perf_counter() - t0) / reps
    print(f"C tiny-slice fetch  : {tC*1e3:8.2f} ms ({flops/tC/1e12:6.1f} TF/s)")

    # round-trip floor (no compute)
    tiny = jax.jit(lambda a: jnp.sum(a[:2, :2]))
    float(tiny(A))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(tiny(A))
    t_rt = (time.perf_counter() - t0) / reps
    print(f"dispatch+fetch floor: {t_rt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
