"""GPC demo — parity fixture for BASELINE.json configs[1] (EP, cum-Gauss
likelihood on 2-D clusters + a USPS-3-vs-5-shaped task) and configs[2]
(Laplace with composite RBF+Linear kernel).
Mirrors pyGPs/Demo/demo_GPC.py."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygps_tpu as pg                        # noqa: E402
from data import classification_2d, digits_3v5  # noqa: E402


def main():
    x, y, t1, t2 = classification_2d()

    # -- EP (default) ------------------------------------------------------
    model = pg.GPC()
    model.setData(x, y)
    nlZ0, _, _ = model.getPosterior()
    print(f"[GPC/EP] initial nlZ = {nlZ0:.6f}")
    nlZ1, _ = model.optimize(numIterations=20)
    print(f"[GPC/EP] optimized nlZ = {nlZ1:.6f}")
    ym, _, _, _, lp = model.predict(x, ys=y)
    acc = np.mean(np.sign(ym[:, 0]) == y)
    print(f"[GPC/EP] train accuracy = {acc:.3f}")
    assert acc > 0.9

    # -- Laplace with composite kernel (configs[2]) ------------------------
    m2 = pg.GPC()
    m2.useInference("Laplace")
    m2.setPrior(kernel=pg.cov.RBF(0.0, 0.0) + pg.cov.Linear(0.0))
    m2.setData(x, y)
    m2.optimize(numIterations=15)
    ym2, *_ = m2.predict(x)
    acc2 = np.mean(np.sign(ym2[:, 0]) == y)
    print(f"[GPC/Laplace+RBF+Linear] nlZ = {m2.nlZ:.6f}, acc = {acc2:.3f}")
    assert acc2 > 0.9

    # -- USPS-3-vs-5-shaped task (configs[1]) ------------------------------
    xd, yd = digits_3v5()
    m3 = pg.GPC()
    m3.setPrior(kernel=pg.cov.RBF(np.log(4.0), 0.0))
    m3.setData(xd, yd)
    m3.optimize(numIterations=10)
    ym3, _, _, _, lp3 = m3.predict(xd, ys=yd)
    acc3 = np.mean(np.sign(ym3[:, 0]) == yd)
    print(f"[GPC/EP digits] nlZ = {m3.nlZ:.6f}, acc = {acc3:.3f}, "
          f"mean lp = {lp3.mean():.4f}")
    assert acc3 > 0.9
    return nlZ1


if __name__ == "__main__":
    main()
