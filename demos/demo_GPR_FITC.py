"""FITC sparse GPR demo — parity fixture for BASELINE.json configs[3]
(mirrors pyGPs/Demo/demo_GPR_FITC.py; scaled-down n for the demo, the
n=100k configuration runs in benchmarks/bench_dist.py)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygps_tpu as pg           # noqa: E402
from data import regression_1d   # noqa: E402


def main():
    x, y, xs = regression_1d(n=200, seed=1)

    # user-specified inducing grid (reference setPrior inducing_points)
    u = np.linspace(-3, 3, 12)[:, None]
    model = pg.GPR_FITC()
    model.setPrior(kernel=pg.cov.RBF(0.0, 0.0), inducing_points=u)
    model.setData(x, y)
    nlZ0, _, _ = model.getPosterior()
    print(f"[GPR_FITC] initial nlZ = {nlZ0:.6f} (m={len(u)} inducing)")
    nlZ1, _ = model.optimize(numIterations=30)
    print(f"[GPR_FITC] optimized nlZ = {nlZ1:.6f}")
    ym, ys2, fm, fs2, _ = model.predict(x)
    rmse = float(np.sqrt(np.mean((ym[:, 0] - y) ** 2)))
    print(f"[GPR_FITC] train RMSE = {rmse:.4f}")
    assert rmse < 0.35

    # default inducing subsample path
    m2 = pg.GPR_FITC()
    m2.setData(x, y)
    m2.optimize(numIterations=15)
    print(f"[GPR_FITC] default-inducing nlZ = {m2.nlZ:.6f} "
          f"(m={m2.u.shape[0]})")
    return nlZ1


if __name__ == "__main__":
    main()
