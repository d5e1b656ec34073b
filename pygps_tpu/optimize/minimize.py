"""Conjugate-gradient minimizer with strong-Wolfe line search.

Functional counterpart of pyGPs ``Optimization/minimize.py`` (a port of
Rasmussen's ``minimize.m``: Polack–Ribière CG + Wolfe–Powell line search
with cubic interpolation).  This is a fresh implementation of the same
textbook algorithm (Nocedal & Wright alg. 3.5/3.6 line search + PR+ CG with
restarts) — behavioural parity (monotone NLML descent, comparable iteration
counts), not a code port.

Host-side numpy driver; the objective is a jitted value-and-grad closure
(see objective.py), so all FLOPs stay on the accelerator.
"""

from __future__ import annotations

import numpy as np

_C1 = 1e-4     # sufficient-decrease (Armijo)
_C2 = 0.1      # curvature (strong Wolfe; 0.1 matches minimize.m's SIG)
_MAX_LS = 20   # max function evals per line search (minimize.m MAX)


def _cubic_min(a, fa, ga, b, fb, gb):
    """Minimiser of the cubic interpolant through (a,fa,ga),(b,fb,gb)."""
    d1 = ga + gb - 3.0 * (fa - fb) / (a - b)
    disc = d1 * d1 - ga * gb
    if disc < 0:
        return 0.5 * (a + b)
    d2 = np.sqrt(disc) * np.sign(b - a)
    denom = gb - ga + 2.0 * d2
    if denom == 0:
        return 0.5 * (a + b)
    t = b - (b - a) * (gb + d2 - d1) / denom
    if not np.isfinite(t):
        return 0.5 * (a + b)
    lo, hi = min(a, b), max(a, b)
    return float(np.clip(t, lo + 0.1 * (hi - lo), hi - 0.1 * (hi - lo)))


def _line_search(phi, f0, g0, alpha0=1.0):
    """Strong-Wolfe line search. ``phi(a) -> (f, g)`` with g = dφ/da.
    Returns (alpha, f, evals) or (None, f0, evals) on failure."""

    def zoom(alo, flo, glo, ahi, fhi, ghi, evals):
        for _ in range(_MAX_LS):
            a = _cubic_min(alo, flo, glo, ahi, fhi, ghi)
            fa, ga = phi(a)
            evals += 1
            if not np.isfinite(fa) or fa > f0 + _C1 * a * g0 or fa >= flo:
                ahi, fhi, ghi = a, fa, ga
            else:
                if abs(ga) <= -_C2 * g0:
                    return a, fa, evals
                if ga * (ahi - alo) >= 0:
                    ahi, fhi, ghi = alo, flo, glo
                alo, flo, glo = a, fa, ga
            if abs(ahi - alo) < 1e-14:
                break
        return (alo, flo, evals) if flo < f0 else (None, f0, evals)

    a_prev, f_prev, g_prev = 0.0, f0, g0
    a = alpha0
    evals = 0
    for i in range(_MAX_LS):
        fa, ga = phi(a)
        evals += 1
        if not np.isfinite(fa) or fa > f0 + _C1 * a * g0 or (i > 0 and fa >= f_prev):
            return zoom(a_prev, f_prev, g_prev, a, fa, ga, evals)
        if abs(ga) <= -_C2 * g0:
            return a, fa, evals
        if ga >= 0:
            return zoom(a, fa, ga, a_prev, f_prev, g_prev, evals)
        a_prev, f_prev, g_prev = a, fa, ga
        a = min(a * 3.0, 1e8)          # EXT-style extrapolation
    return None, f0, evals


def run(f, X0, length=-100, verbose=False):
    """Minimise ``f(X) -> (fX, dfX)`` starting from ``X0``.

    ``length > 0``: max line searches; ``length < 0``: max function
    evaluations (the reference's convention).  Returns ``(X, fX_history,
    iters)``.
    """
    X = np.array(X0, dtype=np.float64)
    fX, dfX = f(X)
    if not np.isfinite(fX):
        return X, [float(fX)], 0
    history = [float(fX)]
    evals = 1
    max_ls = length if length > 0 else np.inf
    max_ev = -length if length < 0 else np.inf

    s = -dfX                       # search direction
    ls_done = 0
    while ls_done < max_ls and evals < max_ev:
        g0 = float(np.dot(dfX, s))
        if g0 >= 0:                # reset to steepest descent
            s = -dfX
            g0 = float(np.dot(dfX, s))
            if g0 >= 0:
                break              # gradient is ~0
        # initial step: reuse previous slope scale
        alpha0 = min(1.0, 2.0 * abs((history[-1] - (history[-2] if len(history) > 1 else history[-1] + 1.0)) / g0)) if g0 != 0 else 1.0
        alpha0 = alpha0 if np.isfinite(alpha0) and alpha0 > 0 else 1.0

        df_new = [None]

        def phi(a):
            fa, ga = f(X + a * s)
            df_new[0] = ga
            return float(fa), float(np.dot(ga, s))

        alpha, f_new, ev = _line_search(phi, float(fX), g0, alpha0)
        evals += ev
        if alpha is None:
            # failed line search: restart along steepest descent once
            if np.allclose(s, -dfX):
                break
            s = -dfX
            continue
        X = X + alpha * s
        df_old, fX = dfX, f_new
        dfX = df_new[0]
        history.append(float(fX))
        ls_done += 1
        if verbose:
            print(f"minimize: ls {ls_done:3d}  f = {fX:.6e}")
        # Polack–Ribière+ update
        beta = max(0.0, float(np.dot(dfX, dfX - df_old) / max(np.dot(df_old, df_old), 1e-300)))
        s = -dfX + beta * s
        if len(history) > 2 and abs(history[-1] - history[-2]) < 1e-12 * (1 + abs(history[-1])):
            break
    return X, history, ls_done
