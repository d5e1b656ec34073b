"""Iterative-engine accuracy-control probe (real TPU, f32).

Round-2 verdict item: accuracy as a *user tolerance*, not a fixed probe
budget — target ≤3e-3 relative nlZ error at n=32768 within 2× the
round-1 runtime (1.67 s/eval at fixed probes=16).

Measures, at n ∈ {16384, 32768}:
  * dense-forward reference nlZ (Cholesky logdet, forward only — fits
    where the dense NLML+grad VJP OOMs)
  * adaptive-SLQ nlZ (tol_nlz=3e-3) error + wall time, NLML+grad
  * fixed-probe (round-1 config) error + wall time for comparison
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pygps_tpu as pg
from pygps_tpu.inference import iterative


def make_problem(n, d=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0])
                    + 0.1 * rng.standard_normal(n), jnp.float32)
    return x, y


def dense_nlz(mean, kern, lik, x, y):
    K = kern.Ktrain(x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    n = y.shape[0]
    i = jnp.arange(n)
    L = jnp.linalg.cholesky(K.at[i, i].add(sn2))  # no eye(): HBM at n=32k
    r = y - mean(x)
    a = jax.scipy.linalg.cho_solve((L, True), r)
    return (0.5 * jnp.dot(r, a) + jnp.sum(jnp.log(jnp.diag(L)))
            + 0.5 * n * jnp.log(2.0 * jnp.pi))


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps


def run(n):
    x, y = make_problem(n)
    mean, kern, lik = (pg.mean.Zero(), pg.cov.RBF(0.3, 0.0),
                       pg.lik.Gauss(-1.0))

    ref = float(jax.jit(dense_nlz, static_argnums=())(mean, kern, lik, x, y))
    print(json.dumps({"probe": f"dense_fwd_ref_n{n}", "nlz": ref}),
          flush=True)

    cfgs = [
        ("fixed16 (round-1)", dict(num_probes=16, lanczos_iters=25,
                                   precond_rank=128)),
        ("adaptive tol=1e-2", dict(num_probes=8, lanczos_iters=30,
                                   precond_rank=128, tol_nlz=1e-2,
                                   max_probes=512)),
        ("adaptive tol=3e-3", dict(num_probes=8, lanczos_iters=30,
                                   precond_rank=128, tol_nlz=3e-3,
                                   max_probes=512)),
        ("adaptive tol=1e-3", dict(num_probes=8, lanczos_iters=30,
                                   precond_rank=128, tol_nlz=1e-3,
                                   max_probes=512)),
        ("deep lanczos64 pc256 tol=3e-3",
         dict(num_probes=8, lanczos_iters=64, precond_rank=256,
              tol_nlz=3e-3, max_probes=512)),
    ]
    for name, kw in cfgs:
        f = jax.jit(lambda x_, y_, kw=kw: iterative.nlml(
            mean, kern, lik, x_, y_, cg_tol=1e-4, cg_iters=512, **kw))
        val, dt_f = timed(f, x, y)
        err = abs(float(val) - ref) / abs(ref)

        def obj(ls, kw=kw):
            return iterative.nlml(mean, kern, pg.lik.Gauss(ls), x, y,
                                  cg_tol=1e-4, cg_iters=512, **kw)

        g = jax.jit(jax.value_and_grad(obj))
        _, dt_g = timed(g, jnp.asarray(-1.0, jnp.float32))
        print(json.dumps({"probe": f"iter_n{n}", "cfg": name,
                          "rel_err_nlz": round(err, 6),
                          "fwd_ms": round(dt_f * 1e3, 1),
                          "nlml_grad_ms": round(dt_g * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    for n in (16384, 32768):
        run(n)
