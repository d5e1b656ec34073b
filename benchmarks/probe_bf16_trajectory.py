"""bf16 trajectory study (round-3 verdict item 7).

Question: do the bf16 trailing/coupling GEMMs (the n=100k default
candidate) change where optimization CONVERGES, or only perturb each
eval?  Runs the same Adam trajectory on DistributedExact(precision=
"bf16") vs "highest" at n=8192 on the real chip and compares final
hyperparameters, final nlZ (both re-evaluated under "highest"), and
held-out predictive RMSE / NLPD.  A short NUTS chain set over the
bf16 vs highest NLML adds the sampling-side check.

Output: JSON lines for MEASUREMENTS.md's bf16 table.
"""

from __future__ import annotations

import json
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
import optax
from jax.flatten_util import ravel_pytree

import pygps_tpu as pg
from pygps_tpu.parallel import mesh as pmesh
from pygps_tpu.parallel.exact import DistributedExact

N_TRAIN, N_TEST, D = 8192, 1024, 4
STEPS = 60


def _data():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N_TRAIN + N_TEST, D)).astype(np.float32)
    f = (np.sin(1.5 * x[:, 0]) + 0.5 * np.cos(2.0 * x[:, 1])
         + 0.3 * x[:, 2])
    y = f + 0.15 * rng.standard_normal(len(f)).astype(np.float32)
    return (jnp.asarray(x[:N_TRAIN]), jnp.asarray(y[:N_TRAIN]),
            jnp.asarray(x[N_TRAIN:]), jnp.asarray(y[N_TRAIN:]))


def optimize(eng, x, y, theta0, unravel, steps=STEPS):
    tx = optax.adam(5e-2)

    @jax.jit
    def run(theta):
        def step(carry, _):
            th, st = carry
            v, g = jax.value_and_grad(
                lambda t: eng.nlml(*unravel(t), x, y))(th)
            up, st = tx.update(g, st, th)
            return (optax.apply_updates(th, up), st), v

        (th, _), vs = jax.lax.scan(step, (theta, tx.init(theta)),
                                   None, length=steps)
        return th, vs

    t0 = time.perf_counter()
    th, vs = run(theta0)
    th.block_until_ready()
    float(vs[-1])
    return th, vs, time.perf_counter() - t0


def main():
    x, y, xs, ys = _data()
    mesh = pmesh.make_mesh(1)
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Gauss(-1.0))
    theta0, unravel = ravel_pytree(prior)

    engines = {
        "highest": DistributedExact(mesh, block=512, precision="highest"),
        "high": DistributedExact(mesh, block=512, precision="high"),
        "bf16": DistributedExact(mesh, block=512, precision="bf16"),
    }
    ref_eng = engines["highest"]
    results = {}
    for name, eng in engines.items():
        th, vs, wall = optimize(eng, x, y, theta0, unravel)
        # re-evaluate the endpoint under the HIGHEST engine so nlZ
        # numbers are comparable
        nlz_ref = float(jax.jit(
            lambda t: ref_eng.nlml(*unravel(t), x, y))(th))
        mean_f, kern_f, lik_f = unravel(th)
        ym, ys2, fm, fs2 = ref_eng.predict(mean_f, kern_f, lik_f, x, y, xs)
        rmse = float(jnp.sqrt(jnp.mean((ym - ys) ** 2)))
        nlpd = float(-jnp.mean(
            -0.5 * (ys - ym) ** 2 / ys2
            - 0.5 * jnp.log(2.0 * jnp.pi * ys2)))
        results[name] = dict(theta=np.asarray(th).tolist(),
                             nlz_final_ref=nlz_ref, rmse=rmse, nlpd=nlpd)
        print(json.dumps({
            "probe": f"bf16_traj_opt_{name}", "n": N_TRAIN,
            "steps": STEPS, "wall_s": round(wall, 1),
            "final_hyps": [round(v, 5) for v in np.asarray(th).tolist()],
            "final_nlz_under_highest": round(nlz_ref, 3),
            "test_rmse": round(rmse, 5), "test_nlpd": round(nlpd, 5),
        }), flush=True)

    for nm in ("high", "bf16"):
        dth = np.abs(np.asarray(results[nm]["theta"])
                     - np.asarray(results["highest"]["theta"]))
        print(json.dumps({
            "probe": f"{nm}_traj_delta",
            "max_abs_hyp_delta": round(float(dth.max()), 6),
            "nlz_delta": round(results[nm]["nlz_final_ref"]
                               - results["highest"]["nlz_final_ref"], 4),
            "rmse_delta": round(results[nm]["rmse"]
                                - results["highest"]["rmse"], 6),
            "nlpd_delta": round(results[nm]["nlpd"]
                                - results["highest"]["nlpd"], 6),
        }), flush=True)

    # --- short NUTS chain set over the hyperparameters (n=2048 subset,
    # 2 chains) under each precision; compare posterior hyp means ---
    from pygps_tpu.inference.nuts import sample_nuts

    xs_n, ys_n = x[:2048], y[:2048]
    post_means = {}
    for name, eng in engines.items():
        def logp(t, eng=eng):
            return (-eng.nlml(*unravel(t), xs_n, ys_n)
                    - 0.05 * jnp.sum(t * t))

        q0 = theta0[None, :] + 0.01 * jax.random.normal(
            jax.random.PRNGKey(1), (2,) + theta0.shape)
        t0 = time.perf_counter()
        samples, stats = sample_nuts(logp, q0, jax.random.PRNGKey(2),
                                     num_warmup=40, num_samples=40,
                                     max_depth=6)
        jax.block_until_ready(samples)
        wall = time.perf_counter() - t0
        pm = np.asarray(jnp.mean(samples, axis=(0, 1)))
        post_means[name] = pm
        print(json.dumps({
            "probe": f"bf16_traj_nuts_{name}",
            "wall_s": round(wall, 1),
            "posterior_hyp_means": [round(float(v), 5) for v in pm],
        }), flush=True)
    for nm in ("high", "bf16"):
        d = np.abs(post_means[nm] - post_means["highest"])
        print(json.dumps({"probe": f"{nm}_traj_nuts_delta",
                          "max_abs_posterior_mean_delta":
                              round(float(d.max()), 6)}), flush=True)


if __name__ == "__main__":
    main()
