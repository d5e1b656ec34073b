"""GPMC demo — one-vs-rest multiclass (mirrors pyGPs/Demo/demo_GPMC.py)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygps_tpu as pg             # noqa: E402
from data import multiclass_blobs  # noqa: E402


def main():
    x, y = multiclass_blobs(n_per=25, n_class=4)
    model = pg.GPMC(n_class=4)
    model.setData(x, y)
    vote, pred = model.optimizeAndPredict(x, numIterations=8)
    acc = np.mean(pred == y)
    print(f"[GPMC] 4-class train accuracy = {acc:.3f}")
    print(f"[GPMC] vote rows sum to 1: "
          f"{np.allclose(vote.sum(axis=1), 1.0)}")
    assert acc > 0.9

    vote2, pred2 = model.fitAndPredict(x)
    print(f"[GPMC] fitAndPredict accuracy = {np.mean(pred2 == y):.3f}")
    return acc


if __name__ == "__main__":
    main()
