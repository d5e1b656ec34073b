"""Kernel-matrix slicing for precomputed (graph) kernels.

Counterpart of pyGPs ``GraphExtensions/graphUtil.py``: split a full
precomputed Gram matrix into the (M1, M2) pair consumed by ``cov.Pre``
(M2 = train×train Gram; M1 = train×test cross with the test
self-variances appended as the last row), plus kernel normalization.
"""

from __future__ import annotations

import numpy as np

from pygps_tpu.graph.propagation import normalizeKernel  # re-export


def formKernelMatrix(K, train_idx, test_idx):
    """(M1, M2) for cov.Pre from a full (n, n) Gram and index sets."""
    K = np.asarray(K)
    tr = np.asarray(train_idx, dtype=int)
    te = np.asarray(test_idx, dtype=int)
    M2 = K[np.ix_(tr, tr)]
    cross = K[np.ix_(tr, te)]
    diag = K[te, te][None, :]
    M1 = np.vstack([cross, diag])
    return M1, M2


__all__ = ["formKernelMatrix", "normalizeKernel"]
