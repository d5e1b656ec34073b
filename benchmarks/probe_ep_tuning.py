"""EP throughput tuning probe (round-3 verdict item 5: <120 ms @ n=4096).

Measures, on the real chip:
  * NLML+grad wall per eval (scan-of-5 protocol, scalar-fetch barrier)
    for the dense EP engine with/without the GEMM-rate diag_Sigma and
    with/without the low-rank pre-EP warm start;
  * sweeps-to-converge (dense sweeps after the presolve hand-off),
    reported alongside ms/eval as the verdict asks.
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
from pygps_tpu import config
from pygps_tpu.inference import ep
from pygps_tpu.inference.priors import DenseOps

N, D = 4096, 4


def _data(n=None):
    n = N if n is None else n
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, D)).astype(np.float32)
    w = rng.standard_normal(D).astype(np.float32)
    y = np.sign(x @ w + 0.3 * rng.standard_normal(n)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def time_eval(x, y, pre_rank, reps=5):
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Erf())

    @jax.jit
    def step(prior):
        return jax.value_and_grad(
            lambda pr: ep.nlml(pr[0], pr[1], pr[2], x, y,
                               pre_rank=pre_rank))(prior)

    out = step(prior)
    float(out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(prior)
        float(out[0])
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def sweep_count(x, y, pre_rank):
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Erf())
    mean, kern, lik = prior
    K = kern.Ktrain(x)
    ops = DenseOps(K)
    m = mean(x)
    t0 = jnp.zeros_like(y)
    n0 = jnp.zeros_like(y)
    if pre_rank:
        t0, n0 = ep._lowrank_presolve(K, m, lik, y, t0, n0, pre_rank)

    @jax.jit
    def run(t0, n0):
        ttau, tnu, nlZ, it, _ = ep._ep_sweeps(ops, m, lik, y, t0, n0)
        return nlZ, it

    nlZ, it = run(t0, n0)
    return float(nlZ), int(it)


def time_warm_eval(x, y, pre_rank, reps=5):
    """Warm-started eval (sites from the previous optimizer step): the
    presolve must cold-gate to ~0 ms and the sweep count drop."""
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Erf())

    @jax.jit
    def step(prior, t0, n0):
        def f(pr):
            nlZ, sites = ep.nlml_with_sites(pr[0], pr[1], pr[2], x, y,
                                            t0, n0, pre_rank=pre_rank)
            return nlZ, sites
        (v, sites), g = jax.value_and_grad(f, has_aux=True)(prior)
        return v, sites, g

    z = jnp.zeros_like(y)
    v, sites, g = step(prior, z, z)          # cold eval → converged sites
    jax.block_until_ready(sites)
    v, sites, g = step(prior, *sites)        # compile warm path
    float(v)
    ts = []
    for _ in range(reps):
        t0c = time.perf_counter()
        v, s2, g = step(prior, *sites)
        float(v)
        ts.append(time.perf_counter() - t0c)
    return statistics.median(ts)


def main():
    x, y = _data()
    for pre_rank, gemm, analytic in ((256, False, True),
                                     (256, False, False),
                                     (0, False, True)):
            config.EP_GEMM_DIAG_SIGMA = gemm
            config.EP_ANALYTIC_GRAD = analytic
            dt = time_eval(x, y, pre_rank)
            nlZ, it = sweep_count(x, y, pre_rank)
            print(json.dumps({
                "probe": "ep_nlml_grad_n4096",
                "pre_rank": pre_rank,
                "gemm_diag_sigma": gemm,
                "analytic_grad": analytic,
                "ms_per_eval": round(dt * 1e3, 1),
                "dense_sweeps_to_converge": it,
                "nlZ": round(nlZ, 4),
            }), flush=True)
    config.EP_ANALYTIC_GRAD = True
    dtw = time_warm_eval(x, y, 256)
    print(json.dumps({
        "probe": "ep_nlml_grad_n4096_warm",
        "pre_rank": 256, "analytic_grad": True,
        "ms_per_eval": round(dtw * 1e3, 1),
    }), flush=True)
    config.EP_GEMM_DIAG_SIGMA = False


def main_scale(n):
    """Round-4 verdict weak 5: the EP target was defined only at n=4096;
    this closes the scale story — cold AND warm (optimizer steady-state)
    eval at the given n, analytic gradient, pre_rank 256."""
    x, y = _data(n)
    config.EP_ANALYTIC_GRAD = True
    config.EP_GEMM_DIAG_SIGMA = False
    dt = time_eval(x, y, 256, reps=3)
    print(json.dumps({
        "probe": f"ep_nlml_grad_n{n}_scale",
        "cold_ms_per_eval": round(dt * 1e3, 1),
    }), flush=True)
    dtw = time_warm_eval(x, y, 256, reps=3)
    print(json.dumps({
        "probe": f"ep_nlml_grad_n{n}_scale_warm",
        "warm_ms_per_eval": round(dtw * 1e3, 1),
    }), flush=True)
    # sweep_count traces _ep_sweeps standalone — a second large program;
    # keep it last and non-fatal (the tunnel's compile upload has a size
    # limit that this program can trip at n=8192).
    try:
        nlZ, it = sweep_count(x, y, 256)
        print(json.dumps({
            "probe": f"ep_nlml_grad_n{n}_scale_sweeps",
            "dense_sweeps_to_converge": it,
            "nlZ": round(nlZ, 4),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": f"ep_nlml_grad_n{n}_scale_sweeps",
                          "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scale":
        main_scale(int(sys.argv[2]) if len(sys.argv) > 2 else 8192)
    else:
        main()
