"""Perf characterization for SVGP, the serving layer, and SMC.

Round-4 verdict missing #4: `inference/svgp.py` (the designated
minibatch-scalable big-n path) and `serve.py::PredictServer` (which
claims "no jit recompiles on the request path") had zero measured
numbers.  This probe records:

  (a) SVGP at n=100k (the FITC config-3-style synthetic dataset):
      minibatch training steps/s on-chip, final ELBO trajectory, and
      held-out RMSE/NLPD — vs FITC inference at MATCHED m (same
      inducing set) as the quality baseline.
  (b) PredictServer p50/p95 latency at batch 1 / 128 / 1024 against a
      trained n=8192 exact-GPR posterior, plus a no-recompile assertion
      across mixed request shapes (jit cache size unchanged after warm).
  (c) one SMC wall-clock line (n=2048, tempered evidence estimate) so
      every entry on the inference menu has at least one number.

Run on the TPU chip:  python benchmarks/probe_svgp_serve.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _data(n, d=8, seed=0, noise=0.1):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    f = np.sin(x[:, 0]) + 0.5 * np.cos(2.0 * x[:, 1]) + 0.3 * x[:, 2]
    y = (f + noise * rng.standard_normal(n)).astype(np.float32)
    return x, y, f.astype(np.float32)


def svgp_line():
    import jax
    import jax.numpy as jnp
    import optax

    import pygps_tpu as pg
    from pygps_tpu.inference import svgp

    n, m, bs = 100_000, 512, 2048
    x, y, _ = _data(n + 4096, seed=1)
    xtr, ytr = jnp.asarray(x[:n]), jnp.asarray(y[:n])
    xte, yte = x[n:], y[n:]

    rng = np.random.default_rng(2)
    z0 = x[rng.choice(n, m, replace=False)]
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Gauss(-1.0))
    params = svgp.init_params(*prior, z0)

    # steps/s: time a run of jitted minibatch steps (fit() already jits
    # one step; we re-time its inner loop shape here explicitly)
    tx = optax.adam(1e-2)

    def loss(p, xb, yb):
        return -svgp.elbo(p, xb, yb, n_total=n)

    @jax.jit
    def step(p, opt_state, key):
        idx = jax.random.choice(key, n, (bs,), replace=False)
        v, g = jax.value_and_grad(loss)(p, xtr[idx], ytr[idx])
        updates, opt_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, -v

    opt_state = tx.init(params)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    params, opt_state, e0 = step(params, opt_state, keys[0])   # compile
    float(e0)
    t0 = time.perf_counter()
    reps = 100
    for k in keys[1:1 + reps]:
        params, opt_state, e = step(params, opt_state, k)
    float(e)
    sps = reps / (time.perf_counter() - t0)

    # train to convergence-ish for the quality row
    for k in keys[1 + reps:1 + reps + 900]:
        params, opt_state, e = step(params, opt_state, k)
    elbo_final = float(e)

    _, ymu, ys2, _, _ = svgp.predict(params, jnp.asarray(xte))
    ymu = np.asarray(ymu)
    ys2 = np.asarray(ys2)
    rmse = float(np.sqrt(np.mean((ymu - yte) ** 2)))
    nlpd = float(np.mean(0.5 * np.log(2 * np.pi * ys2)
                         + 0.5 * (yte - ymu) ** 2 / ys2))
    print(json.dumps({
        "metric": f"svgp_train_n{n}_m{m}_b{bs}", "steps_per_s":
        round(sps, 1), "elbo_final": round(elbo_final, 1),
        "rmse": round(rmse, 4), "nlpd": round(nlpd, 4),
        "protocol": f"adam lr 1e-2, {reps} timed steps after compile, "
                    f"quality after 1000 steps"}))

    # FITC quality baseline at MATCHED m (its inducing set = trained z)
    mfit = pg.GPR_FITC()
    mfit.setPrior(mean=pg.mean.Zero(),
                  kernel=pg.cov.RBF(0.0, 0.0),
                  inducing_points=np.asarray(params.z))
    mfit.setData(np.asarray(xtr), np.asarray(ytr))
    t0 = time.perf_counter()
    mfit.optimize(numIterations=20)
    fitc_fit_s = time.perf_counter() - t0
    ymu_f, ys2_f, _, _, _ = mfit.predict(xte)
    ymu_f, ys2_f = np.asarray(ymu_f).ravel(), np.asarray(ys2_f).ravel()
    rmse_f = float(np.sqrt(np.mean((ymu_f - yte) ** 2)))
    nlpd_f = float(np.mean(0.5 * np.log(2 * np.pi * ys2_f)
                           + 0.5 * (yte - ymu_f) ** 2 / ys2_f))
    print(json.dumps({
        "metric": f"fitc_baseline_n{n}_m{m}", "fit_s": round(fitc_fit_s, 1),
        "rmse": round(rmse_f, 4), "nlpd": round(nlpd_f, 4),
        "protocol": "20 CG iters on the FITC NLML, same inducing set"}))


def svgp_cls_line():
    """SVGP classification at n=100k (Erf likelihood, GH expected
    log-lik): the menu's minibatch-scalable big-n CLASSIFICATION path —
    dense/distributed Laplace caps at n=16384 on one chip."""
    import jax
    import jax.numpy as jnp
    import optax

    import pygps_tpu as pg
    from pygps_tpu.inference import svgp

    n, m, bs = 100_000, 512, 2048
    rng = np.random.default_rng(11)
    x = rng.standard_normal((n + 4096, 8)).astype(np.float32)
    f = np.sin(x[:, 0]) + x[:, 1] * x[:, 2]
    yc = np.sign(f + 0.3 * rng.standard_normal(n + 4096)).astype(np.float32)
    xtr, ytr = jnp.asarray(x[:n]), jnp.asarray(yc[:n])
    xte, yte = x[n:], yc[n:]

    z0 = x[rng.choice(n, m, replace=False)]
    prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Erf())
    params = svgp.init_params(*prior, z0)
    tx = optax.adam(1e-2)

    def loss(p, xb, yb):
        return -svgp.elbo(p, xb, yb, n_total=n)

    @jax.jit
    def step(p, opt_state, key):
        idx = jax.random.choice(key, n, (bs,), replace=False)
        v, g = jax.value_and_grad(loss)(p, xtr[idx], ytr[idx])
        updates, opt_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, -v

    opt_state = tx.init(params)
    keys = jax.random.split(jax.random.PRNGKey(7), 1200)
    params, opt_state, e0 = step(params, opt_state, keys[0])
    float(e0)
    t0 = time.perf_counter()
    reps = 100
    for k in keys[1:1 + reps]:
        params, opt_state, e = step(params, opt_state, k)
    float(e)
    sps = reps / (time.perf_counter() - t0)
    for k in keys[1 + reps:1100]:
        params, opt_state, e = step(params, opt_state, k)

    lp, ymu, _, _, _ = svgp.predict(params, jnp.asarray(xte),
                                    ys=jnp.asarray(yte))
    acc = float(np.mean(np.sign(np.asarray(ymu)) == yte))
    nlpd = float(-np.mean(np.asarray(lp)))
    print(json.dumps({
        "metric": f"svgp_cls_n{n}_m{m}_b{bs}", "steps_per_s":
        round(sps, 1), "elbo_final": round(float(e), 1),
        "holdout_acc": round(acc, 4), "holdout_nlpd": round(nlpd, 4),
        "protocol": "Erf lik, adam 1e-2, 100 timed steps, quality "
                    "after ~1100 steps"}))


def serve_line():
    import jax
    import jax.numpy as jnp

    import pygps_tpu as pg
    from pygps_tpu.serve import PredictServer

    n, d = 8192, 8
    x, y, _ = _data(n, seed=3)
    m = pg.GPR()
    m.setData(jnp.asarray(x), jnp.asarray(y))
    m.getPosterior(der=False)

    srv = PredictServer(m, batch_sizes=(32, 256, 1024))
    srv.warm()
    cache_after_warm = srv._fn._cache_size()

    rng = np.random.default_rng(4)
    for q in (1, 128, 1024):
        lats = []
        for _ in range(50):
            xq = rng.standard_normal((q, d)).astype(np.float32)
            t0 = time.perf_counter()
            ym, ys2 = srv.predict(xq)
            np.asarray(ym)                       # host sync
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()
        print(json.dumps({
            "metric": f"serve_p50_ms_q{q}_n{n}",
            "p50_ms": round(statistics.median(lats), 2),
            "p95_ms": round(lats[int(0.95 * len(lats))], 2)}))

    # mixed-shape traffic must not recompile
    for q in (7, 33, 200, 511, 777, 1000):
        srv.predict(rng.standard_normal((q, d)).astype(np.float32))
    cache_after_mixed = srv._fn._cache_size()
    ok = cache_after_mixed == cache_after_warm
    print(json.dumps({"metric": "serve_no_recompile",
                      "cache_after_warm": cache_after_warm,
                      "cache_after_mixed": cache_after_mixed,
                      "ok": bool(ok)}))
    assert ok, "request path recompiled on mixed shapes"


def smc_line():
    import jax
    import jax.numpy as jnp

    import pygps_tpu as pg

    n = 2048
    x, y, _ = _data(n, seed=5)
    m = pg.GPR()
    m.setData(jnp.asarray(x), jnp.asarray(y))
    t0 = time.perf_counter()
    s, stats = m.sample(sampler="smc", num_chains=8, seed=0)
    jax.block_until_ready(s)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"smc_n{n}_p{s.shape[1]}", "wall_s": round(wall, 1),
        "log_evidence": round(stats["log_evidence"], 2),
        "protocol": "tempered SMC, default schedule, incl. compile"}))


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    parts = {"serve": serve_line, "svgp": svgp_line,
             "svgp_cls": svgp_cls_line, "smc": smc_line}
    if which == "all":
        for fn in parts.values():
            fn()
    else:
        parts[which]()


if __name__ == "__main__":
    main()
