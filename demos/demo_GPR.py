"""GPR demo — parity fixture for BASELINE.json configs[0]
(mirrors pyGPs/Demo/demo_GPR.py: default model, explicit prior, optimize,
predict; prints nlZ before/after like the reference)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygps_tpu as pg           # noqa: E402
from data import regression_1d   # noqa: E402


def main():
    x, y, xs = regression_1d()

    # -- default model: mean.Zero + cov.RBF + lik.Gauss + inf.Exact -------
    model = pg.GPR()
    model.setData(x, y)
    nlZ0, dnlZ, post = model.getPosterior()
    print(f"[GPR] initial nlZ = {nlZ0:.6f}")

    nlZ1, _ = model.optimize(numIterations=40)
    print(f"[GPR] optimized nlZ = {nlZ1:.6f}")
    print(f"[GPR] learned hyp: cov={model.covfunc.hyp} "
          f"lik={model.likfunc.hyp}")

    ym, ys2, fm, fs2, _ = model.predict(xs)
    print(f"[GPR] predictive mean range: [{ym.min():.3f}, {ym.max():.3f}]")

    # -- explicit prior: composite kernel + const mean ---------------------
    m2 = pg.GPR()
    m2.setPrior(mean=pg.mean.Const(float(y.mean())),
                kernel=pg.cov.RBF(0.0, 0.0) + pg.cov.Noise(-2.0))
    m2.setData(x, y)
    m2.optimize(numIterations=40)
    print(f"[GPR] composite-kernel nlZ = {m2.nlZ:.6f}")

    rmse = float(np.sqrt(np.mean(
        (model.predict(x)[0][:, 0] - y) ** 2)))
    print(f"[GPR] train RMSE = {rmse:.4f}")
    assert rmse < 0.3
    return nlZ1


if __name__ == "__main__":
    main()
