"""Scan-chained phase microbenchmarks (dispatch-floor-free).

probe_chol_phases.py round 1 showed a ~26 ms per-dispatch floor over the
axon tunnel that drowns every sub-30 ms op.  Here each candidate op runs
as a chain of ITERS sequentially-dependent applications inside one jit
(the bench.py protocol), so per-op cost = (chain time) / ITERS.
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

ITERS = 20


def chain(name, op, x0, flops_per, reps=5, iters=ITERS):
    """Median per-op time of op chained iters times (dependent)."""

    @jax.jit
    def f(x):
        def step(x, _):
            return op(x), None
        out, _ = lax.scan(step, x, None, length=iters)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.reshape(-1)[0]

    float(f(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x0))
        ts.append(time.perf_counter() - t0)
    dt = statistics.median(ts) / iters
    rec = {"metric": name, "ms": round(dt * 1e3, 3)}
    if flops_per:
        rec["tf_per_s"] = round(flops_per / dt / 1e12, 1)
    print(json.dumps(rec), flush=True)
    return dt


def blocked_chol(A, bs):
    """Hand-blocked right-looking Cholesky with bs-wide panels (static
    unrolled), candidate replacement for jnp.linalg.cholesky on the
    diagonal blocks of the distributed factorization."""
    n = A.shape[0]
    nb = n // bs
    L = jnp.zeros_like(A)
    for k in range(nb):
        s = k * bs
        Akk = A[s:s + bs, s:s + bs]
        Lkk = jnp.linalg.cholesky(Akk)
        L = L.at[s:s + bs, s:s + bs].set(Lkk)
        if k + 1 < nb:
            Ak = A[s + bs:, s:s + bs]
            Pk = lax.linalg.triangular_solve(
                Lkk, Ak, left_side=False, lower=True, transpose_a=True)
            L = L.at[s + bs:, s:s + bs].set(Pk)
            A = A.at[s + bs:, s + bs:].add(
                -jnp.matmul(Pk, Pk.T, preferred_element_type=A.dtype))
    return L


def main():
    rng = np.random.default_rng(0)
    n = 32768

    for b in (512, 1024):
        W = rng.standard_normal((b, b)).astype(np.float32)
        A = jnp.asarray(W @ W.T + b * np.eye(b, dtype=np.float32))

        chain(f"chol_b{b}", lambda X: jnp.linalg.cholesky(
            X + jnp.eye(b, dtype=X.dtype)) @ jnp.linalg.cholesky(
            X + jnp.eye(b, dtype=X.dtype)).T, A, 2 * b**3 / 3)

        for bs in (128, 256):
            if bs < b:
                chain(f"blocked_chol_b{b}_bs{bs}",
                      lambda X, bs=bs: blocked_chol(
                          X + jnp.eye(b, dtype=X.dtype), bs)
                      @ blocked_chol(
                          X + jnp.eye(b, dtype=X.dtype), bs).T,
                      A, 2 * b**3 / 3)

        L0 = jnp.linalg.cholesky(A)
        chain(f"trsm_eye_b{b}", lambda L: lax.linalg.triangular_solve(
            L, jnp.eye(b, dtype=L.dtype), left_side=True, lower=True) + L,
            L0, b**3 / 2)

        from pygps_tpu.ops.trtri import tril_inverse
        chain(f"trtri_blocked_b{b}", lambda L: tril_inverse(L) + L,
              L0, b**3 / 2)

        # panel GEMM (n, b) @ (b, b), dependent via output feedback
        C = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        iL = jnp.asarray(np.eye(b, dtype=np.float32))
        chain(f"panel_gemm_n{n}_b{b}",
              lambda C: jnp.matmul(C, iL, preferred_element_type=C.dtype),
              C, 2 * n * b * b)

        # trailing GEMM bf16 (n,b)@(b,n), chained via first column feedback
        P = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

        def tg2(C):
            out = jnp.matmul(C.astype(jnp.bfloat16),
                             P.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)  # (n, n)
            return out[:, :b] * 1e-6 + C

        chain(f"trailing_gemm_bf16_n{n}_b{b}", tg2, C, 2 * n * n * b,
              iters=5)

    # HIGHEST f32 trailing GEMM for reference
    b = 1024
    C = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    P = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    def tgh(C):
        out = jnp.matmul(C, P, precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        return out[:, :b] * 1e-6 + C

    chain(f"trailing_gemm_f32H_n{n}_b{b}", tgh, C, 2 * n * n * b, iters=5)

    def tgd(C):
        out = jnp.matmul(C, P, preferred_element_type=jnp.float32)
        return out[:, :b] * 1e-6 + C

    chain(f"trailing_gemm_f32def_n{n}_b{b}", tgd, C, 2 * n * n * b,
          iters=5)


if __name__ == "__main__":
    main()
