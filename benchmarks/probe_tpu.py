"""Single-chip TPU microbenchmarks: where does the NLML+grad time go?

Measures (f32, n=4096/8192): XLA cholesky, a blocked MXU-matmul cholesky
candidate, triangular solve, XLA gram vs Pallas fused gram, end-to-end
NLML+grad.  Drives the optimization decisions for the hot path.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(name, fn, *args, reps=5, flops=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    rec = {"probe": name, "ms": round(dt * 1e3, 3)}
    if flops:
        rec["tflops"] = round(flops / dt / 1e12, 2)
    print(json.dumps(rec), flush=True)
    return out


def blocked_chol(A, b=512):
    """Right-looking blocked Cholesky, single chip, full-width masked
    trailing updates on the MXU (candidate vs jnp.linalg.cholesky)."""
    n = A.shape[0]
    nb = n // b
    colb = jnp.arange(n) // b
    Ab = A.reshape(nb, b, n)

    def panel(k, Ab):
        cs = k * b
        C = lax.dynamic_slice(Ab, (cs * 0, cs * 0, cs), (nb, b, b))
        Akk = lax.dynamic_index_in_dim(C, k, 0, keepdims=False)
        Lkk = jnp.linalg.cholesky(Akk)
        gidx = jnp.arange(nb)
        Lpan = lax.linalg.triangular_solve(
            jnp.broadcast_to(Lkk, (nb, b, b)), C,
            left_side=False, lower=True, transpose_a=True)
        after = (gidx > k)[:, None, None]
        is_k = (gidx == k)[:, None, None]
        Ploc = jnp.where(after, Lpan, 0.0) + jnp.where(is_k, Lkk, 0.0)
        Ab = lax.dynamic_update_slice(Ab, Ploc, (cs * 0, cs * 0, cs))
        Pdense = Ploc.reshape(n, b)
        Pcols = jnp.where((colb > k)[:, None], Pdense, 0.0)
        Lrows = jnp.where(after, Lpan, 0.0)
        return Ab - jnp.einsum("mrc,nc->mrn", Lrows, Pcols,
                               preferred_element_type=Ab.dtype)

    Ab = lax.fori_loop(0, nb, panel, Ab)
    return Ab.reshape(n, n)


def main():
    import pygps_tpu as pg
    from pygps_tpu.inference import exact
    from pygps_tpu.ops.gram_pallas import fused_gram

    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    rng = np.random.default_rng(0)
    for n in (4096, 8192):
        d = 8
        x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
        W = jnp.asarray(rng.standard_normal((n, 256)), jnp.float32)
        A = W @ W.T + n * jnp.eye(n, dtype=jnp.float32)
        A = jax.device_put(A)

        cflops = n**3 / 3
        timed(f"xla_chol_n{n}", jax.jit(jnp.linalg.cholesky), A,
              flops=cflops)
        timed(f"blocked_chol_n{n}", jax.jit(blocked_chol), A,
              flops=cflops)
        L = jnp.linalg.cholesky(A)
        timed(f"trsm_vec_n{n}",
              jax.jit(lambda L, y: lax.linalg.triangular_solve(
                  L, y[:, None], left_side=True, lower=True)), L, y)
        timed(f"trsm_full_n{n}",
              jax.jit(lambda L, B: lax.linalg.triangular_solve(
                  L, B, left_side=True, lower=True)), L, A,
              flops=n**3 / 2)

        k = pg.cov.RBF(0.0, 0.0)
        timed(f"xla_gram_n{n}", jax.jit(lambda x: k.Ktrain(x)), x,
              flops=2 * n * n * d)
        iell2 = jnp.asarray(1.0, jnp.float32)
        sf2 = jnp.asarray(1.0, jnp.float32)
        timed(f"pallas_gram_n{n}",
              jax.jit(lambda x: fused_gram("rbf", x, x, iell2, sf2)), x,
              flops=2 * n * n * d)

        prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Gauss(-1.0))
        step = jax.jit(lambda pr: jax.value_and_grad(
            lambda p: exact.nlml(p[0], p[1], p[2], x, y))(pr))
        timed(f"nlml_grad_n{n}", step, prior, reps=3,
              flops=4 * n**3 / 3)


if __name__ == "__main__":
    main()
