"""Cross-validation utilities and evaluation measures.

Counterpart of pyGPs ``pyGPs/Validation/valid.py``: k-fold index
generation + ACC/RMSE/Prec/Recall/NLPD measures (names per SURVEY.md §2.3,
verify-tagged).  Measures are numpy-level (evaluation is not a hot path).
"""

from __future__ import annotations

import numpy as np


def k_fold_index(n: int, K: int = 10, shuffle: bool = False, seed: int = 0):
    """Yield (train_idx, test_idx) pairs for K folds over n points
    (reference valid.k_fold_index)."""
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    folds = np.array_split(idx, K)
    for k in range(K):
        test = folds[k]
        train = np.concatenate([folds[j] for j in range(K) if j != k])
        yield train, test


def k_fold_validation(model_factory, x, y, K: int = 10, measure=None,
                      optimize: bool = True, numIterations: int = 20,
                      shuffle: bool = False, seed: int = 0):
    """Run K-fold CV (reference valid.k_fold_validation).

    ``model_factory()`` returns a fresh model per fold (the reference
    mutates one model; a factory avoids hyperparameter leakage across
    folds).  ``measure(y_true, y_pred) -> float`` defaults to RMSE.
    Returns (mean_score, per_fold_scores)."""
    x = np.asarray(x)
    y = np.asarray(y).reshape(-1)
    measure = measure or RMSE
    scores = []
    for tr, te in k_fold_index(len(y), K, shuffle=shuffle, seed=seed):
        m = model_factory()
        m.setData(x[tr], y[tr])
        if optimize:
            m.optimize(numIterations=numIterations)
        ym, ys2, fm, fs2, lp = m.predict(x[te], ys=y[te])
        if measure is NLPD:
            scores.append(NLPD(y[te], lp))
        else:
            scores.append(measure(y[te], ym[:, 0]))
    return float(np.mean(scores)), [float(s) for s in scores]


# -- measures (reference valid.ACC/RMSE/Prec/Recall/NLPD) -------------------


def ACC(y_true, y_pred):
    """Classification accuracy on ±1 labels (sign of prediction)."""
    return float(np.mean(np.sign(y_pred) == np.sign(y_true)))


def RMSE(y_true, y_pred):
    return float(np.sqrt(np.mean((np.asarray(y_pred) - np.asarray(y_true)) ** 2)))


def Prec(y_true, y_pred):
    """Precision for +1 class."""
    pred_pos = np.sign(y_pred) > 0
    if pred_pos.sum() == 0:
        return 0.0
    return float(np.mean(np.sign(y_true)[pred_pos] > 0))


def Recall(y_true, y_pred):
    """Recall for +1 class."""
    true_pos = np.sign(y_true) > 0
    if true_pos.sum() == 0:
        return 0.0
    return float(np.mean(np.sign(y_pred)[true_pos] > 0))


def NLPD(y_true, lp):
    """Mean negative log predictive density from per-point log densities
    (the lp column returned by predict with ys given)."""
    return float(-np.mean(np.asarray(lp)))
