"""Validation layer + graph extension tests (reference L6)."""

import numpy as np
import pytest

import jax.numpy as jnp

import pygps_tpu as pg
from pygps_tpu.graph import node_kernels as nk
from pygps_tpu.graph.propagation import normalizeKernel, propagationKernel
from pygps_tpu.graph.util import formKernelMatrix
from pygps_tpu.utils import validation as valid


def test_kfold_indices_partition():
    folds = list(valid.k_fold_index(23, K=5))
    assert len(folds) == 5
    all_test = np.concatenate([te for _, te in folds])
    assert sorted(all_test.tolist()) == list(range(23))
    for tr, te in folds:
        assert set(tr) & set(te) == set()


def test_measures():
    y = np.array([1, 1, -1, -1])
    p = np.array([0.5, -0.5, -0.5, -2.0])
    assert valid.ACC(y, p) == 0.75
    assert valid.Prec(y, p) == 1.0
    assert valid.Recall(y, p) == 0.5
    assert np.isclose(valid.RMSE(np.zeros(2), np.array([3.0, 4.0])),
                      np.sqrt(12.5))


def test_kfold_validation_gpr():
    rng = np.random.default_rng(0)
    x = np.linspace(-3, 3, 40)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(40)
    score, per_fold = valid.k_fold_validation(
        pg.GPR, x, y, K=4, optimize=True, numIterations=8)
    assert len(per_fold) == 4
    assert score < 0.5


def _two_cluster_graph(seed=0):
    """Block-diagonal adjacency of G small graphs: half 'chains', half
    'stars' — distinguishable by propagation features."""
    rng = np.random.default_rng(seed)
    blocks, gr_id, labels, gy = [], [], [], []
    G = 12
    for g in range(G):
        n = 5
        A = np.zeros((n, n))
        if g % 2 == 0:    # chain
            for i in range(n - 1):
                A[i, i + 1] = A[i + 1, i] = 1
            gy.append(1.0)
        else:             # star
            A[0, 1:] = A[1:, 0] = 1
            gy.append(-1.0)
        blocks.append(A)
        gr_id += [g] * n
        labels += ([0, 1] * n)[:n]
    N = sum(b.shape[0] for b in blocks)
    Afull = np.zeros((N, N))
    ofs = 0
    for b in blocks:
        k = b.shape[0]
        Afull[ofs:ofs + k, ofs:ofs + k] = b
        ofs += k
    return Afull, np.array(labels), np.array(gr_id), np.array(gy)


def test_propagation_kernel_psd_and_informative():
    A, l, gr_id, gy = _two_cluster_graph()
    K = np.asarray(propagationKernel(A, l, gr_id, h_max=3, w=1e-3))
    G = len(gy)
    assert K.shape == (G, G)
    assert np.allclose(K, K.T)
    assert np.linalg.eigvalsh(K).min() > -1e-8
    Kn = np.asarray(normalizeKernel(K))
    assert np.allclose(np.diag(Kn), 1.0)
    # same-class graphs more similar than cross-class on average
    same = Kn[np.ix_(gy > 0, gy > 0)].mean()
    cross = Kn[np.ix_(gy > 0, gy < 0)].mean()
    assert same > cross


def test_graph_classification_via_pre_kernel():
    """End-to-end graph classification: propagation kernel → cov.Pre →
    GPC (the reference's MUTAG demo pipeline)."""
    A, l, gr_id, gy = _two_cluster_graph()
    K = np.asarray(normalizeKernel(propagationKernel(A, l, gr_id, h_max=4)))
    G = len(gy)
    tr = np.arange(0, G, 2).tolist() + np.arange(1, G, 2).tolist()[:3]
    te = [g for g in range(G) if g not in tr]
    M1, M2 = formKernelMatrix(K, tr, te)
    m = pg.GPC()
    m.useInference("Laplace")
    m.setPrior(kernel=pg.cov.Pre(M1, M2))
    xtr = np.zeros((len(tr), 1))   # placeholder inputs (Pre ignores values)
    m.setData(xtr, gy[tr])
    nlZ, _, _ = m.getPosterior()
    assert np.isfinite(nlZ)
    ym, *_ = m.predict(np.zeros((len(te), 1)))
    acc = np.mean(np.sign(ym[:, 0]) == gy[te])
    assert acc >= 0.6


@pytest.mark.parametrize("fn,kwargs", [
    (nk.diffKernel, {"beta": 0.5}),
    (nk.vnKernel, {"alpha": 0.5}),
    (nk.rwKernel, {"p": 2}),
    (nk.regLapKernel, {"sigma": 1.0}),
    (nk.psInvLapKernel, {}),
])
def test_node_kernels_psd(fn, kwargs):
    A, _, _, _ = _two_cluster_graph()
    K = np.asarray(fn(A[:10, :10], **kwargs))
    assert K.shape == (10, 10)
    assert np.allclose(K, K.T, atol=1e-8)
    assert np.linalg.eigvalsh((K + K.T) / 2).min() > -1e-6
