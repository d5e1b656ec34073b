"""Where does the n=8192 NLML+grad eval's time go?  (round-5)

Times each stage of the headline eval in isolation, same protocol as the
bench (scanned sequentially-dependent loop, scalar-fetch barrier), so the
sum can be checked against the end-to-end number and the residual —
whatever XLA cannot fuse/overlap across stage seams — becomes visible.

History: this probe found the round-5 bench-protocol bug.  Its first
version drove the e2e scan with raw-GD steps (p -= 1e-3 g), like the
bench did since round 1 — which diverges to NaN within 3 iterations at
this n (gradients are O(n)); every NaN iteration still runs all the
FLOPs AND fires safe_cholesky's full jitter ladder, so "e2e" measured
99 ms/eval while the isolated stages summed to ~55 ms.  The discrepancy
was this pathology, not a fusion residual: with Adam-normalized steps
(below) the healthy e2e is ~46 ms and the stage sum OVER-covers it
(XLA overlaps across stage seams).  See MEASUREMENTS.md round-5
bench-protocol section.

Stages (f32, defaults: fused Pallas gram, safe_cholesky reuse-factor,
GEMM inverse at EXACT_BWD_PRECISION):
  e2e        full value_and_grad (control; = bench headline)
  fwd        nlml forward only (gram + chol + solve + logdet)
  gram       kernel.Ktrain alone
  chol       safe_cholesky alone (on a fixed SPD matrix + eps*carry)
  inv        inv_from_chol alone (on a fixed L, precision=config knob)
  kvjp       kernel pullback alone: vjp of Ktrain wrt hyps at cotangent G

Run: python benchmarks/probe_decomp8192.py [n]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import pygps_tpu as pg
    from pygps_tpu import config
    from pygps_tpu.inference import exact
    from pygps_tpu.ops.trtri import inv_from_chol
    from pygps_tpu.utils.tools import safe_cholesky

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    d = 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0])
                    + 0.1 * rng.standard_normal(n), jnp.float32)
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Gauss(-1.0))

    inner = 5
    reps = 5

    def timed(name, scanned_fn, init, *big):
        """scanned_fn: (carry, big_tuple) -> (carry, scalar); carry
        sequentially dependent so nothing is hoisted/DCE'd.  Large arrays
        go through jit ARGUMENTS (a closed-over n x n constant is embedded
        in the compile upload and trips the tunnel's HTTP 413 cap)."""
        def body(c, bigs):
            return jax.lax.scan(lambda cc, _: scanned_fn(cc, bigs),
                                c, None, length=inner)
        run = jax.jit(body)
        out = run(init, big)
        float(jax.tree.leaves(out[1])[-1][-1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(init, big)
            float(jax.tree.leaves(out[1])[-1][-1])
            ts.append((time.perf_counter() - t0) / inner)
        ms = statistics.median(ts) * 1e3
        print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)
        return ms

    # --- e2e control (Adam steps: bounded, trajectory stays finite) ---
    vg = jax.value_and_grad(
        lambda pr: exact.nlml(pr[0], pr[1], pr[2], x, y))

    def e2e_step(carry, _):
        pr, mm, ss, t = carry
        v, g = vg(pr)
        t = t + 1.0
        mm = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, mm, g)
        ss = jax.tree.map(lambda a, b: 0.999 * a + 0.001 * b * b, ss, g)

        def upd(p, m1, s1):
            return p - 1e-2 * (m1 / (1.0 - 0.9 ** t)) / (
                jnp.sqrt(s1 / (1.0 - 0.999 ** t)) + 1e-8)
        pr = jax.tree.map(upd, pr, mm, ss)
        return (pr, mm, ss, t), v
    z = jax.tree.map(jnp.zeros_like, prior)
    timed("e2e_nlml_grad", e2e_step, (prior, z, z, jnp.float32(0.0)))

    # --- forward only (tiny bounded poke keeps it finite) ---
    def fwd_step(pr, _):
        v = exact.nlml(pr[0], pr[1], pr[2], x, y)
        return jax.tree.map(lambda p: p - 1e-9 * jnp.tanh(v), pr), v
    timed("fwd_nlml", fwd_step, prior)

    # --- gram alone ---
    kern0 = prior[1]

    def gram_step(c, _):
        k = jax.tree.map(lambda p: p + 1e-9 * c, kern0)
        K = k.Ktrain(x)
        s = K[0, 0] + K[-1, -1]
        return s, s
    timed("gram", gram_step, jnp.float32(0.0))

    # --- chol alone (fixed SPD + carry-dependent diag shift) ---
    K0 = kern0.Ktrain(x)
    B0 = K0 / jnp.exp(-2.0) + jnp.eye(n, dtype=jnp.float32)
    B0 = jax.device_put(B0)

    def chol_step(c, bigs):
        (B,) = bigs
        L, _ = safe_cholesky(
            B + (1e-7 * c) * jnp.eye(n, dtype=jnp.float32))
        s = jnp.log(L[n - 1, n - 1])
        return s, s
    timed("chol", chol_step, jnp.float32(0.0), B0)

    L0, _ = safe_cholesky(B0)
    L0 = jax.device_put(L0)

    def inv_step(c, bigs):
        (L,) = bigs
        Li = L.at[0, 0].add(1e-7 * c)
        Kinv = inv_from_chol(Li, precision=config.EXACT_BWD_PRECISION)
        s = Kinv[0, 0] + Kinv[n - 1, n - 1]
        return s, s
    timed("inv_from_chol", inv_step, jnp.float32(0.0), L0)

    # --- kernel pullback alone at an n x n cotangent ---
    G0 = jax.device_put(B0 * 1e-3)

    def kvjp_step(c, bigs):
        (G,) = bigs
        k = jax.tree.map(lambda p: p + 1e-9 * c, kern0)
        _, pull = jax.vjp(lambda kk: kk.Ktrain(x), k)
        (gk,) = pull(G + c * 1e-9)
        s = sum(jax.tree.leaves(jax.tree.map(jnp.sum, gk)))
        return s, s
    timed("kernel_vjp", kvjp_step, jnp.float32(0.0), G0)

    # --- Q assembly + trace/cotangent products, given Kinv and alpha ---
    a0 = jax.device_put(jnp.asarray(
        rng.standard_normal(n), jnp.float32))

    def qasm_step(c, bigs):
        (B, a) = bigs
        Kinv = B + c * 1e-9          # stand-in n x n read
        Q = Kinv - a[:, None] * a[None, :]
        s = 0.5 * jnp.trace(Q) + Q[0, 0]
        return s, s
    timed("q_assembly_trace", qasm_step, jnp.float32(0.0), B0, a0)

    # --- the custom-vjp core alone, K passed in: chol + solve + inverse
    # + Q + trace, NO gram / kernel pullback ---
    sn2_0 = jnp.exp(jnp.float32(-2.0))
    core_vg = jax.value_and_grad(exact._nlml_core, argnums=(0, 2))

    def core_step(c, bigs):
        (K,) = bigs
        v, (gK, gsn2) = core_vg(K + c * 1e-9, jnp.zeros(n, jnp.float32),
                                sn2_0 + c * 1e-12, y)
        s = v + gK[0, 0] + gsn2
        return s, s
    timed("core_value_and_grad", core_step, jnp.float32(0.0), K0)

    # --- forward core alone (chol + solve + logdet), K passed in ---
    def fcore_step(c, bigs):
        (K,) = bigs
        v = exact._nlml_core(K + c * 1e-9, jnp.zeros(n, jnp.float32),
                             sn2_0, y)
        return v, v
    timed("core_forward", fcore_step, jnp.float32(0.0), K0)


if __name__ == "__main__":
    main()
