"""SVGP (variational sparse GP) + tempered-SMC demo.

North-star inference-menu extensions (no reference counterpart; pyGPs's
only sparse method is FITC and its only hyperparameter treatment is
point-estimate optimization).  Both are reachable from the pyGPs-shaped
model API:

* ``GPR_FITC().useInference("SVGP")`` — whitened variational sparse GP
  through the standard optimize/predict surface.
* ``GPR().sample(sampler="smc")`` — likelihood-tempered SMC over the
  hyperparameters, returning a particle population AND a log-evidence
  estimate (which neither the optimizer nor NUTS provides).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygps_tpu as pg           # noqa: E402
from data import regression_1d   # noqa: E402


def main():
    x, y, xs = regression_1d(n=160, seed=7)

    # ---- SVGP through the model API ----------------------------------
    u = np.linspace(-3, 3, 14)[:, None]
    model = pg.GPR_FITC()
    model.setPrior(kernel=pg.cov.RBF(0.0, 0.0), inducing_points=u)
    model.setData(x, y)
    model.useInference("SVGP")
    model.setOptimizer("Adam")
    nlZ0, _, _ = model.getPosterior(der=False)
    print(f"[SVGP] initial -ELBO = {nlZ0:.6f} (m={len(u)} inducing)")
    nlZ1, _ = model.optimize(numIterations=40)
    print(f"[SVGP] optimized -ELBO = {nlZ1:.6f}")
    assert nlZ1 < nlZ0
    ym, ys2, _, _, _ = model.predict(x)
    rmse = float(np.sqrt(np.mean((ym[:, 0] - y) ** 2)))
    print(f"[SVGP] train RMSE = {rmse:.4f}")
    assert rmse < 0.35

    # the -ELBO upper-bounds the FITC/exact NLML (sanity cross-check)
    fitc = pg.GPR_FITC()
    fitc.setPrior(kernel=pg.cov.RBF(0.0, 0.0), inducing_points=u)
    fitc.setData(x, y)
    fitc.getPosterior(der=False)
    print(f"[SVGP] FITC nlZ at same hyps = {fitc.nlZ:.6f}")

    # ---- SMC over hyperparameters -------------------------------------
    m2 = pg.GPR()
    m2.setData(x, y)
    samples, stats = m2.sample(sampler="smc", num_particles=128,
                               num_stages=10, eps=0.1, seed=0)
    part = np.asarray(samples)[0]           # (P, n_hyp)
    print(f"[SMC] particles {part.shape}, "
          f"posterior hyp mean = {part.mean(0).round(3)}, "
          f"log evidence = {stats['log_evidence']:.3f}")
    assert np.isfinite(stats["log_evidence"])
    assert np.all(np.isfinite(part))
    return nlZ1


if __name__ == "__main__":
    main()
