"""Phase-level microbenchmarks for the distributed Cholesky at n=32768.

Answers: where does the 1.066 s (bf16, b=1024, p=1) go?  Candidate costs
per panel (nb=32 panels): b x b diagonal Cholesky, b x b triangular
inverse, panel GEMM, trailing GEMMs, mask/where traffic.  Each component
is timed standalone at the exact shapes the kernel uses, so expected
totals can be assembled and compared against the measured whole.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(name, fn, *a, reps=5, flops=None):
    out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    dt = statistics.median(ts)
    rec = {"metric": name, "ms": round(dt * 1e3, 3)}
    if flops:
        rec["tf_per_s"] = round(flops / dt / 1e12, 1)
    print(json.dumps(rec), flush=True)
    return dt


def main():
    n = 32768
    rng = np.random.default_rng(0)

    for b in (512, 1024):
        W = rng.standard_normal((b, b)).astype(np.float32)
        A = jnp.asarray(W @ W.T + b * np.eye(b, dtype=np.float32))

        chol = jax.jit(jnp.linalg.cholesky)
        timed(f"chol_b{b}", chol, A, flops=b**3 / 3)

        L = chol(A)
        trsm = jax.jit(lambda L: lax.linalg.triangular_solve(
            L, jnp.eye(b, dtype=jnp.float32), left_side=True, lower=True))
        timed(f"trsm_eye_b{b}", trsm, L, flops=b**3 / 2)

        # panel GEMM: (n, b) @ (b, b)
        C = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        pg = jax.jit(lambda C, iL: C @ iL.T)
        timed(f"panel_gemm_n{n}_b{b}", pg, C, L, flops=2 * n * b * b)

        # trailing GEMM f32 + bf16: (n, b) @ (b, n) -- the per-panel hot op
        P = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        tg32 = jax.jit(lambda C, P: jnp.matmul(
            C, P, preferred_element_type=jnp.float32))
        timed(f"trailing_gemm_f32_n{n}_b{b}", tg32, C, P,
              flops=2 * n * n * b)
        Cb = C.astype(jnp.bfloat16)
        Pb = P.astype(jnp.bfloat16)
        tg16 = jax.jit(lambda C, P: jnp.matmul(
            C, P, preferred_element_type=jnp.float32))
        timed(f"trailing_gemm_bf16_n{n}_b{b}", tg16, Cb, Pb,
              flops=2 * n * n * b)

        # trailing GEMM + subtract-from-A chunked (the .at[].add shape):
        # measures whether the add traffic costs beyond the GEMM
        Abig = jnp.zeros((n, n), jnp.float32)

        def upd(Abig, C, P):
            d = jnp.matmul(C.astype(jnp.bfloat16), P.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return Abig - d

        timed(f"trailing_gemm_bf16_sub_n{n}_b{b}", jax.jit(upd),
              Abig, C, P, flops=2 * n * n * b)

    # half-size trailing GEMM (mid-factorization shape)
    b = 1024
    h = n // 2
    C = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
    P = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
    tg = jax.jit(lambda C, P: jnp.matmul(
        C.astype(jnp.bfloat16), P.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32))
    timed(f"trailing_gemm_bf16_n{h}_b{b}", tg, C, P, flops=2 * h * h * b)

    # measured whole, for reference (bf16, block=1024, p=1)
    from pygps_tpu.parallel import mesh as pmesh
    from pygps_tpu.parallel.pcholesky import pcholesky

    mesh = pmesh.make_mesh(1)
    Wn = rng.standard_normal((n, 256)).astype(np.float32)
    K = jnp.asarray(Wn @ Wn.T) + n * jnp.eye(n, dtype=jnp.float32)
    for b in (512, 1024):
        Kbc = pmesh.shard_bc(pmesh.to_block_cyclic(K, b, 1), mesh)
        f = jax.jit(lambda K: pcholesky(K, mesh, update_dtype=jnp.bfloat16))
        timed(f"pchol_full_bf16_b{b}", f, Kbc, reps=3, flops=n**3 / 3)
        del Kbc
    del K


if __name__ == "__main__":
    main()
