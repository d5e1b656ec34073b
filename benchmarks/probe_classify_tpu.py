"""Real-TPU probes for the non-conjugate engines (SURVEY §3.3/§3.4):

1. Laplace-GPC NLML+grad at n=4096 (Erf likelihood, Newton under
   while_loop, IFT custom-VJP gradients).
2. Parallel-EP-GPC NLML+grad at n=4096 (damped batched sweeps).

These are the classification hot paths; the reference runs them as
O(n³)-per-sweep sequential site loops on CPU.  Each probe prints one
JSON line; run without platform overrides (tunneled v5e, f32).
"""

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, D = 4096, 4


def _data():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, D)).astype(np.float32)
    w = rng.standard_normal(D).astype(np.float32)
    y = np.sign(x @ w + 0.3 * rng.standard_normal(N)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def _time_step(step, arg, reps):
    out = step(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def probe(name):
    def deco(fn):
        def run():
            try:
                t0 = time.perf_counter()
                rec = fn()
                rec["probe"] = name
                rec["total_s"] = round(time.perf_counter() - t0, 1)
                print(json.dumps(rec), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"probe": name, "error": repr(e)}),
                      flush=True)
                traceback.print_exc()
        return run
    return deco


@probe("laplace_gpc_nlml_grad_n4096")
def laplace_probe():
    import pygps_tpu as pg
    from pygps_tpu.inference import laplace

    x, y = _data()
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Erf())

    @jax.jit
    def step(prior):
        return jax.value_and_grad(
            lambda pr: laplace.nlml(pr[0], pr[1], pr[2], x, y))(prior)

    dt = _time_step(step, prior, reps=5)
    v, _ = step(prior)
    return {"n": N, "d": D, "ms_per_eval": round(dt * 1e3, 1),
            "evals_per_s": round(1.0 / dt, 2), "nlZ": float(v[0] if
            isinstance(v, tuple) else v)}


@probe("ep_gpc_nlml_grad_n4096")
def ep_probe():
    import pygps_tpu as pg
    from pygps_tpu.inference import ep

    x, y = _data()
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Erf())

    @jax.jit
    def step(prior):
        return jax.value_and_grad(
            lambda pr: ep.nlml(pr[0], pr[1], pr[2], x, y))(prior)

    dt = _time_step(step, prior, reps=5)
    v, _ = step(prior)
    return {"n": N, "d": D, "ms_per_eval": round(dt * 1e3, 1),
            "evals_per_s": round(1.0 / dt, 2), "nlZ": float(v[0] if
            isinstance(v, tuple) else v)}


@probe("dist_laplace_gpc_nlml_grad_n16384")
def dist_laplace_probe():
    """Distributed Laplace-GPC at n=16384 over the p=1 mesh (verdict r4
    item 7): parallel/classify.py's laplace_nlml — ring Gram (gram_bc)
    -> DistributedOps -> the generic Newton/IFT engine — value+grad."""
    import pygps_tpu as pg
    from pygps_tpu.parallel import classify as pclassify
    from pygps_tpu.parallel import mesh as pmesh

    n, d, block = 16384, 4, 2048
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)
    w = rng.standard_normal(d).astype(np.float32)
    y = np.sign(x @ w + 0.3 * rng.standard_normal(n)).astype(np.float32)
    x, y = jnp.asarray(x), jnp.asarray(y)

    mesh = pmesh.make_mesh(1)
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Erf())

    @jax.jit
    def step(prior):
        return jax.value_and_grad(
            lambda pr: pclassify.laplace_nlml(pr[0], pr[1], pr[2], x, y,
                                              mesh, block=block))(prior)

    dt = _time_step(step, prior, reps=3)
    v, _ = step(prior)
    return {"n": n, "d": d, "block": block, "p": 1,
            "ms_per_eval": round(dt * 1e3, 1),
            "evals_per_s": round(1.0 / dt, 2), "nlZ": float(v)}


def dist_ep_probe(n=8192):
    """Distributed parallel-EP-GPC over the p=1 mesh: the autodiff
    energy gradient through pcholesky_ad's analytic backward (the dense
    engine's analytic fixed-point gradient is DenseOps-only).  n=16384
    compile-OOMs on one chip: diag_Sigma's jvp materializes an
    (n/b, n, n) 8 GB stack (measured; a diag_Sigma analytic VJP is the
    documented extension) — the default n=8192 fits."""

    @probe(f"dist_ep_gpc_nlml_grad_n{n}")
    def _run():
        import pygps_tpu as pg
        from pygps_tpu.parallel import classify as pclassify
        from pygps_tpu.parallel import mesh as pmesh

        d, block = 4, 2048
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n, d)).astype(np.float32)
        w = rng.standard_normal(d).astype(np.float32)
        y = np.sign(x @ w + 0.3 * rng.standard_normal(n)).astype(np.float32)
        xj, yj = jnp.asarray(x), jnp.asarray(y)

        mesh = pmesh.make_mesh(1)
        prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Erf())

        @jax.jit
        def step(prior):
            return jax.value_and_grad(
                lambda pr: pclassify.ep_nlml(pr[0], pr[1], pr[2], xj, yj,
                                             mesh, block=block))(prior)

        dt = _time_step(step, prior, reps=3)
        v, _ = step(prior)
        return {"n": n, "d": d, "block": block, "p": 1,
                "ms_per_eval": round(dt * 1e3, 1),
                "evals_per_s": round(1.0 / dt, 2), "nlZ": float(v)}

    _run()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    table = {"laplace": laplace_probe, "ep": ep_probe,
             "dist": dist_laplace_probe, "dist_ep": dist_ep_probe}
    if which == "all":
        for fn in table.values():
            fn()
    else:
        table[which]()
