"""Native C++ runtime library tests (pygps_tpu/native)."""

import numpy as np
import pytest

from pygps_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "g++ toolchain present in image; build must succeed"


def test_csr_spmm_matches_dense():
    rng = np.random.default_rng(0)
    n, C = 50, 4
    A = (rng.random((n, n)) < 0.1).astype(np.float32)
    A = np.maximum(A, A.T)
    from scipy import sparse

    S = sparse.csr_matrix(A)
    data = S.data.astype(np.float32).copy()
    native.csr_row_normalize(S.indptr.astype(np.int64), data)
    P = rng.random((n, C)).astype(np.float32)
    out = native.csr_spmm(S.indptr.astype(np.int64),
                          S.indices.astype(np.int32), data, P)
    rowsum = A.sum(1, keepdims=True)
    T = np.divide(A, rowsum, out=np.zeros_like(A), where=rowsum > 1e-12)
    assert np.allclose(out, T @ P, atol=1e-5)


def test_bin_counts_and_gram():
    bins = np.array([0, 1, 1, 2, 0], dtype=np.int64)
    gr = np.array([0, 0, 1, 1, 1], dtype=np.int32)
    M = native.bin_counts(bins, gr, G=2, nbins=3)
    assert np.allclose(M, [[1, 1, 0], [1, 1, 1]])
    K = np.zeros((2, 2))
    native.gram_accumulate(M, K)
    assert np.allclose(K, M @ M.T)


def test_loader_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.standard_normal((32, 8)).astype(np.float32)
    p32 = str(tmp_path / "m32.bin")
    arr.tofile(p32)
    out = native.load_matrix_f32(p32, (32, 8))
    assert np.array_equal(out, arr)

    arr64 = rng.standard_normal((16, 4))
    p64 = str(tmp_path / "m64.bin")
    arr64.tofile(p64)
    out2 = native.load_matrix_f32(p64, (16, 4), src_dtype="f8")
    assert np.allclose(out2, arr64.astype(np.float32))


def test_shuffled_indices_is_permutation():
    idx = native.shuffled_indices(100, seed=7)
    assert sorted(idx.tolist()) == list(range(100))
    idx2 = native.shuffled_indices(100, seed=7)
    assert np.array_equal(idx, idx2)          # deterministic
    idx3 = native.shuffled_indices(100, seed=8)
    assert not np.array_equal(idx, idx3)


def test_sparse_propagation_matches_dense():
    from scipy import sparse

    from pygps_tpu.graph.propagation import (propagationKernel,
                                             propagationKernel_sparse)

    rng = np.random.default_rng(2)
    blocks, gr_id, labels = [], [], []
    for g in range(8):
        n = 6
        A = np.zeros((n, n))
        for i in range(n - 1):
            A[i, i + 1] = A[i + 1, i] = 1
        if g % 2:
            A[0, n - 1] = A[n - 1, 0] = 1
        blocks.append(A)
        gr_id += [g] * n
        labels += [int(v) for v in rng.integers(0, 2, n)]
    N = 6 * 8
    Afull = np.zeros((N, N))
    for g, b in enumerate(blocks):
        Afull[g * 6:(g + 1) * 6, g * 6:(g + 1) * 6] = b
    l = np.array(labels)
    gr = np.array(gr_id)

    K_dense = np.asarray(propagationKernel(Afull, l, gr, h_max=3, w=1e-3))
    S = sparse.csr_matrix(Afull.astype(np.float32))
    K_sparse = propagationKernel_sparse(S.indptr, S.indices, S.data, l, gr,
                                        h_max=3, w=1e-3)
    # same PRNG draws → identical Gram up to float32 propagation rounding
    assert np.allclose(K_sparse, K_dense, rtol=1e-4, atol=1e-6)
