"""f32 FITC posterior-QUALITY parity at n=100k (real TPU).

Round-1 verdict weak #6: the documented f32 nlZ bias at n=100k
(jitter-induced model shift on near-singular Kuu) asserted that
*posterior* quality is far less sensitive — measure it instead of
asserting.  This probe compares the chip's f32 FITC predictions
(pygps_tpu.models.GPR_FITC path) against an independent float64 numpy
FITC implementation (SoR-with-corrected-diagonal form, the reference's
inf.FITC_Exact math per SURVEY.md §2.4/§3.5) at the f64-feasible small
jitter, and reports predictive-mean RMSE (relative to the function
scale), predictive-variance relative error, and test-set NLPD delta.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pygps_tpu as pg


def make_problem(n=100_000, ns=2048, d=4, m=512, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2.0, 2.0, (n, d))
    xs = rng.uniform(-2.0, 2.0, (ns, d))
    f = lambda z: (np.sin(2 * z[:, 0]) + 0.5 * np.cos(3 * z[:, 1])
                   + 0.25 * z[:, 2] * z[:, 3])
    sn = 0.1
    y = f(x) + sn * rng.standard_normal(n)
    fs = f(xs)
    # inducing points: uniform subsample (same for both paths)
    u = x[rng.choice(n, m, replace=False)]
    return x, y, xs, fs, u, sn


def numpy_f64_fitc_predict(x, y, xs, u, log_ell, log_sf, sn2, snu2):
    """FITC predictive mean/variance in float64 (SoR + corrected diag)."""
    ell2, sf2 = np.exp(2 * log_ell), np.exp(2 * log_sf)

    def k(a, b):
        aa = (a * a).sum(1)[:, None]
        bb = (b * b).sum(1)[None, :]
        sq = np.maximum(aa + bb - 2 * a @ b.T, 0.0)
        return sf2 * np.exp(-0.5 * sq / ell2)

    m = u.shape[0]
    Kuu = k(u, u) + snu2 * np.eye(m)
    Kuf = k(u, x)
    Luu = np.linalg.cholesky(Kuu)
    import scipy.linalg as sla
    V = sla.solve_triangular(Luu, Kuf, lower=True)          # (m, n)
    g = sf2 - (V * V).sum(0) + sn2                          # FITC diag
    # Sigma = (Kuu + Kuf G^-1 Kfu)^-1 ; work in whitened coords:
    # A = I + V G^-1 V^T ; mu_w = A^-1 V G^-1 y
    Vg = V / g[None, :]
    A = np.eye(m) + Vg @ V.T
    La = np.linalg.cholesky(A)
    b = Vg @ y
    w = sla.cho_solve((La, True), b)                        # A^-1 V G^-1 y
    Ksu = k(xs, u)                                          # (ns, m)
    Ws = sla.solve_triangular(Luu, Ksu.T, lower=True)       # (m, ns)
    mu = Ws.T @ w
    # var = k** - Ws^T Ws + Ws^T A^-1 Ws + sn2
    AWs = sla.cho_solve((La, True), Ws)
    var = (sf2 - (Ws * Ws).sum(0) + (Ws * AWs).sum(0)) + sn2
    return mu, np.maximum(var, 1e-12)


def main():
    x, y, xs, fs, u, sn = make_problem()
    log_ell, log_sf = np.log(0.6), 0.0
    sn2 = sn * sn

    # --- chip path (f32, package surface) ---
    model = pg.GPR_FITC()
    kern = pg.cov.RBF(log_ell=float(log_ell), log_sigma=float(log_sf))
    model.setPrior(mean=pg.mean.Zero(), kernel=kern,
                   inducing_points=jnp.asarray(u, jnp.float32))
    model.setData(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    model.setNoise(log_sigma=float(np.log(sn)))
    t0 = time.perf_counter()
    ym, ys2, fm, fs2, _ = model.predict(jnp.asarray(xs, jnp.float32))
    ym = np.asarray(ym).ravel()
    ys2 = np.asarray(ys2).ravel()
    t1 = time.perf_counter()
    print(json.dumps({"probe": "fitc_chip_f32",
                      "predict_s": round(t1 - t0, 2)}), flush=True)

    # --- f64 reference (numpy, small jitter) ---
    from pygps_tpu import config
    snu2_chip = config.FITC_JITTER_REL * sn2     # what the chip used
    for tag, snu2 in (("matched_jitter", float(snu2_chip)),
                      ("small_jitter_f64", 1e-10)):
        mu64, var64 = numpy_f64_fitc_predict(
            x.astype(np.float64), y.astype(np.float64),
            xs.astype(np.float64), u.astype(np.float64),
            log_ell, log_sf, sn2, snu2)
        fscale = float(np.std(fs))
        rmse_mu = float(np.sqrt(np.mean((ym - mu64) ** 2)) / fscale)
        rel_var = float(np.median(np.abs(ys2 - var64) / var64))
        nlpd32 = float(np.mean(0.5 * np.log(2 * np.pi * ys2)
                               + 0.5 * (fs - ym) ** 2 / ys2))
        nlpd64 = float(np.mean(0.5 * np.log(2 * np.pi * var64)
                               + 0.5 * (fs - mu64) ** 2 / var64))
        print(json.dumps({"probe": f"fitc_quality_vs_f64_{tag}",
                          "rmse_mean_over_fscale": round(rmse_mu, 6),
                          "median_rel_var_err": round(rel_var, 6),
                          "nlpd_chip_f32": round(nlpd32, 5),
                          "nlpd_ref_f64": round(nlpd64, 5)}), flush=True)


if __name__ == "__main__":
    main()
