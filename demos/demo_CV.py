"""Cross-validation demo (mirrors the reference's CV demo)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygps_tpu as pg              # noqa: E402
from pygps_tpu.utils import validation as valid  # noqa: E402
from data import regression_1d, classification_2d  # noqa: E402


def main():
    x, y, _ = regression_1d(n=60, seed=3)
    score, folds = valid.k_fold_validation(
        pg.GPR, x, y, K=5, measure=valid.RMSE, numIterations=10)
    print(f"[CV] GPR 5-fold RMSE = {score:.4f} (folds: "
          f"{[round(f, 3) for f in folds]})")
    assert score < 0.5

    xc, yc, _, _ = classification_2d(n_per=30, seed=4)
    acc, folds = valid.k_fold_validation(
        pg.GPC, xc, yc, K=4, measure=valid.ACC, numIterations=8)
    print(f"[CV] GPC 4-fold ACC = {acc:.3f}")
    assert acc > 0.85


if __name__ == "__main__":
    main()
