"""Graph-kernel demo — propagation kernel → cov.Pre → GPC
(mirrors the reference's MUTAG demo pipeline on synthetic graphs)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygps_tpu as pg  # noqa: E402
from pygps_tpu.graph.propagation import normalizeKernel, propagationKernel  # noqa: E402
from pygps_tpu.graph.util import formKernelMatrix  # noqa: E402
from data import mutag_like  # noqa: E402


def main():
    A, l, gr_id, gy = mutag_like(n_graphs=30)
    K = np.asarray(normalizeKernel(
        propagationKernel(A, l, gr_id, h_max=5, w=1e-3)))
    G = len(gy)
    rng = np.random.default_rng(0)
    perm = rng.permutation(G)
    tr, te = perm[:20], perm[20:]

    M1, M2 = formKernelMatrix(K, tr, te)
    model = pg.GPC()
    model.useInference("Laplace")
    model.setPrior(kernel=pg.cov.Pre(M1, M2))
    model.setData(np.zeros((len(tr), 1)), gy[tr])
    nlZ, _, _ = model.getPosterior()
    ym, *_ = model.predict(np.zeros((len(te), 1)))
    acc = np.mean(np.sign(ym[:, 0]) == gy[te])
    print(f"[Graph] propagation-kernel GPC: nlZ = {nlZ:.4f}, "
          f"test acc = {acc:.3f} ({len(tr)} train / {len(te)} test graphs)")
    assert acc >= 0.8


if __name__ == "__main__":
    main()
