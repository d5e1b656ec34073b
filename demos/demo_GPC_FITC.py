"""FITC sparse GPC demo (mirrors pyGPs/Demo/demo_GPC_FITC.py)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygps_tpu as pg              # noqa: E402
from data import classification_2d  # noqa: E402


def main():
    x, y, t1, t2 = classification_2d(n_per=40, seed=2)

    for inf_name in ["EP", "Laplace"]:
        model = pg.GPC_FITC()
        model.useInference(inf_name)
        model.setData(x, y)
        nlZ, _, _ = model.getPosterior()
        ym, *_ = model.predict(x)
        acc = np.mean(np.sign(ym[:, 0]) == y)
        print(f"[GPC_FITC/{inf_name}] nlZ = {nlZ:.6f}, "
              f"train acc = {acc:.3f} (m={model.u.shape[0]})")
        assert acc > 0.85


if __name__ == "__main__":
    main()
