"""Scaled conjugate gradients (Møller 1993).

Functional counterpart of pyGPs ``Optimization/scg.py`` (a port of netlab's
``scg.m``) — fresh implementation of the published SCG algorithm:
trust-region-like scaling λ of the Hessian-vector estimate obtained from a
finite difference of gradients along the search direction; no line searches.
"""

from __future__ import annotations

import numpy as np


def run(f, x0, niters=100, verbose=False):
    """Minimise ``f(x) -> (fx, gx)``. Returns (x, history, iters)."""
    sigma0 = 1e-4
    x = np.array(x0, dtype=np.float64)
    fnow, gradnew = f(x)
    if not np.isfinite(fnow):
        return x, [float(fnow)], 0
    history = [float(fnow)]
    gradold = gradnew
    d = -gradnew
    success = True
    nsuccess = 0
    lam = 1.0
    lammin, lammax = 1e-15, 1e100
    mu = delta = kappa = 0.0

    for j in range(1, niters + 1):
        if success:
            mu = float(d @ gradnew)
            if mu >= 0:
                d = -gradnew
                mu = float(d @ gradnew)
            kappa = float(d @ d)
            if kappa < 1e-30:
                break
            sigma = sigma0 / np.sqrt(kappa)
            _, gplus = f(x + sigma * d)
            if not np.all(np.isfinite(gplus)):
                break
            theta = float(d @ (gplus - gradnew)) / sigma
            delta = theta

        delta += (lam) * kappa
        if delta <= 0:           # make Hessian estimate positive definite
            delta = lam * kappa
            lam = lam - delta / kappa

        alpha = -mu / delta
        xnew = x + alpha * d
        fnew, _ = f(xnew)
        if np.isfinite(fnew):
            Delta = 2.0 * (fnew - fnow) / (alpha * mu)
        else:
            Delta = -1.0

        if Delta >= 0:
            success = True
            nsuccess += 1
            x = xnew
            fnow = float(fnew)
            gradold = gradnew
            _, gradnew = f(x)
            history.append(fnow)
            if verbose:
                print(f"scg: iter {j:3d}  f = {fnow:.6e}")
            if float(gradnew @ gradnew) < 1e-16:
                break
        else:
            success = False

        if Delta < 0.25:
            lam = min(4.0 * lam, lammax)
        elif Delta > 0.75:
            lam = max(0.5 * lam, lammin)

        if nsuccess == x.size:
            d = -gradnew
            nsuccess = 0
        elif success:
            gamma = float((gradnew @ gradnew - gradnew @ gradold)) / mu if mu != 0 else 0.0
            d = gamma * d - gradnew
    return x, history, len(history) - 1
