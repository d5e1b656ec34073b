"""Verbatim reference-golden capture harness.

BASELINE.md's parity rows ("posterior parity on all pyGPs demos") need
*verbatim* outputs from the reference package — but `/root/reference`
has been an empty mount every round so far.  This module is the tested,
one-command path that captures those goldens THE MOMENT the mount is
populated:

    python tools/capture_reference_goldens.py --reference /root/reference

It imports the reference `pyGPs` package (upstream marionmari/pyGPs,
SURVEY.md §2.3), runs the four capturable BASELINE configs on
deterministic fixtures, and writes ``tests/goldens/goldens_reference.json``.
``tests/test_goldens.py`` automatically switches its parity section to
verbatim mode when that file exists (config 4 — NUTS — has no reference
counterpart: the reference has no sampler, SURVEY.md §2.1).

Fixture policy: seeded synthetic data generated HERE (so the capture is
reproducible without the reference's demo .npz files); when the
reference's own demo data is present it is recorded as well, under
separate keys.  All arrays are float64 — the reference is numpy f64
(SURVEY.md §0) and our CPU x64 path is the comparison side.

Exercised end-to-end (against a mocked reference tree with known
outputs) by tests/test_capture_harness.py — the capture path stays a
working code path even while the real mount is empty.
"""

from __future__ import annotations

import importlib
import json
import sys
from pathlib import Path

import numpy as np

#: bump when fixture definitions change (goldens are only comparable
#: within one fixture version)
FIXTURE_VERSION = 1


def fixtures():
    """Deterministic fixtures for the four capturable BASELINE configs.

    Returns a dict of plain-numpy arrays (all f64, fixed seeds)."""
    rng = np.random.default_rng(20260821)
    # config 0: 1-D exact GPR (demo_GPR.py-shaped: smooth curve + noise)
    x0 = np.sort(rng.uniform(-3.0, 3.0, 40))[:, None]
    y0 = np.sin(2.0 * x0[:, 0]) + 0.12 * rng.standard_normal(40)
    xs0 = np.linspace(-3.2, 3.2, 11)[:, None]
    # config 1: EP binary GPC, 2-D two-cluster (demo_GPC.py-shaped)
    x1 = np.concatenate([rng.standard_normal((16, 2)) + 1.6,
                         rng.standard_normal((16, 2)) - 1.6])
    y1 = np.concatenate([np.ones(16), -np.ones(16)])
    xs1 = np.stack([np.linspace(-2.5, 2.5, 9),
                    np.linspace(2.5, -2.5, 9)], axis=1)
    # config 2: Laplace GPC, composite RBF+Linear kernel
    #   (same data as config 1; the kernel differs)
    # config 3: FITC GPR with explicit inducing grid
    x3 = np.sort(rng.uniform(-4.0, 4.0, 64))[:, None]
    y3 = np.cos(x3[:, 0]) + 0.15 * rng.standard_normal(64)
    u3 = np.linspace(-4.0, 4.0, 10)[:, None]
    xs3 = np.linspace(-4.1, 4.1, 9)[:, None]
    return {
        "x0": x0, "y0": y0, "xs0": xs0,
        "x1": x1, "y1": y1, "xs1": xs1,
        "x3": x3, "y3": y3, "u3": u3, "xs3": xs3,
    }


#: log-hyperparameters used for every capture (NO optimization — the
#: capture pins inference outputs at FIXED hyps, so CG/SCG differences
#: cannot leak into the goldens)
HYPS = {
    "log_ell": 0.25, "log_sf": 0.1, "log_sn": -1.3,
    "gpc_log_ell": 0.4, "gpc_log_sf": 0.3,
    "lin_log_sf": -0.4,
}


def _tolist(a):
    return np.asarray(a, dtype=np.float64).ravel().tolist()


def import_reference(reference_path):
    """Import ``pyGPs`` from the reference tree (supports both a repo
    checkout — pyGPs/ package at top level — and an installed layout)."""
    ref = Path(reference_path)
    if not ref.exists():
        raise FileNotFoundError(f"reference path {ref} does not exist")
    # p is .../pyGPs/__init__.py → the importable ROOT is two levels up
    # (the directory CONTAINING the pyGPs package)
    candidates = [ref] + [p.parent.parent
                          for p in ref.glob("**/pyGPs/__init__.py")]
    last_err = None
    seen = set()
    for c in candidates[:8]:
        c = str(c)
        if c in seen:
            continue
        seen.add(c)
        sys.path.insert(0, c)
        try:
            mod = importlib.import_module("pyGPs")
            # guard against an implicit EMPTY namespace package (a bare
            # pyGPs/ dir without __init__.py shadowing the real one)
            if getattr(mod, "__file__", None) is None:
                raise ImportError(f"{c}/pyGPs resolved to a namespace "
                                  "package (no __init__.py)")
            return mod
        except Exception as e:  # noqa: BLE001 — record and try next root
            last_err = e
            sys.path.pop(0)
            sys.modules.pop("pyGPs", None)
    raise ImportError(f"could not import pyGPs from {ref}: {last_err!r}")


def capture(reference_path, out_path=None):
    """Run the reference on the fixtures; write + return the goldens.

    Every config is fault-isolated: an API mismatch in one config
    records an ``error`` entry instead of aborting the capture."""
    pyGPs = import_reference(reference_path)
    fx = fixtures()
    gold = {
        "_meta": {
            "reference_path": str(reference_path),
            "reference_version": getattr(pyGPs, "__version__", "unknown"),
            "fixture_version": FIXTURE_VERSION,
            "hyps": HYPS,
        }
    }

    def config0():
        m = pyGPs.GPR()
        m.setPrior(mean=pyGPs.mean.Zero(),
                   kernel=pyGPs.cov.RBF(log_ell=HYPS["log_ell"],
                                        log_sigma=HYPS["log_sf"]))
        m.setData(fx["x0"], fx["y0"][:, None])
        m.setNoise(log_sigma=HYPS["log_sn"])
        m.getPosterior()
        ym, ys2, fm, fs2, lp = m.predict(fx["xs0"])
        return {"nlZ": float(m.nlZ), "ym": _tolist(ym), "ys2": _tolist(ys2),
                "fm": _tolist(fm), "fs2": _tolist(fs2)}

    def config1():
        m = pyGPs.GPC()   # EP + Erf is the reference default
        m.setPrior(mean=pyGPs.mean.Zero(),
                   kernel=pyGPs.cov.RBF(log_ell=HYPS["gpc_log_ell"],
                                        log_sigma=HYPS["gpc_log_sf"]))
        m.setData(fx["x1"], fx["y1"][:, None])
        m.getPosterior()
        ym, ys2, fm, fs2, lp = m.predict(
            fx["xs1"], ys=np.ones((len(fx["xs1"]), 1)))
        return {"nlZ": float(m.nlZ), "p_plus": _tolist(np.exp(lp)),
                "fm": _tolist(fm), "fs2": _tolist(fs2)}

    def config2():
        m = pyGPs.GPC()
        m.useInference("Laplace")
        k = (pyGPs.cov.RBF(log_ell=HYPS["gpc_log_ell"],
                           log_sigma=HYPS["gpc_log_sf"])
             + pyGPs.cov.Linear(log_sigma=HYPS["lin_log_sf"]))
        m.setPrior(mean=pyGPs.mean.Zero(), kernel=k)
        m.setData(fx["x1"], fx["y1"][:, None])
        m.getPosterior()
        ym, ys2, fm, fs2, lp = m.predict(
            fx["xs1"], ys=np.ones((len(fx["xs1"]), 1)))
        return {"nlZ": float(m.nlZ), "p_plus": _tolist(np.exp(lp)),
                "fm": _tolist(fm), "fs2": _tolist(fs2)}

    def config3():
        m = pyGPs.GPR_FITC()
        m.setPrior(mean=pyGPs.mean.Zero(),
                   kernel=pyGPs.cov.RBF(log_ell=HYPS["log_ell"],
                                        log_sigma=HYPS["log_sf"]),
                   inducing_points=fx["u3"])
        m.setData(fx["x3"], fx["y3"][:, None])
        m.setNoise(log_sigma=HYPS["log_sn"])
        m.getPosterior()
        ym, ys2, fm, fs2, lp = m.predict(fx["xs3"])
        return {"nlZ": float(m.nlZ), "ym": _tolist(ym), "ys2": _tolist(ys2),
                "fm": _tolist(fm), "fs2": _tolist(fs2)}

    for name, fn in [("config0_exact_gpr", config0),
                     ("config1_ep_gpc", config1),
                     ("config2_laplace_gpc_composite", config2),
                     ("config3_fitc_gpr", config3)]:
        try:
            gold[name] = fn()
        except Exception as e:  # noqa: BLE001 — fault-isolate per config
            gold[name] = {"error": repr(e)}

    if out_path is not None:
        out = Path(out_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(gold, indent=1))
    return gold


def default_out_path():
    return (Path(__file__).resolve().parent.parent.parent / "tests"
            / "goldens" / "goldens_reference.json")


#: per-config tolerances for the verbatim comparison.  Deterministic
#: algorithms (exact GPR, FITC — closed linear algebra, f64 both sides)
#: get tight bounds; EP is parallel-vs-sequential (different fixed-point
#: iterations, BASELINE.md "within MC/solver tolerance") and Laplace is
#: backtracking-Newton-vs-brentmin, so those compare loosely.
TOLS = {
    "config0_exact_gpr": {"nlZ": 1e-6, "vec": 1e-5},
    "config1_ep_gpc": {"nlZ": 3e-3, "vec": 5e-3},
    "config2_laplace_gpc_composite": {"nlZ": 1e-4, "vec": 2e-3},
    "config3_fitc_gpr": {"nlZ": 1e-6, "vec": 1e-5},
}


def compare_against_ours(gold):
    """Run OUR implementation (CPU f64) on the captured fixtures and
    compare against the reference goldens.  Returns a list of failure
    strings (empty = verbatim parity holds).  Used by test_goldens's
    verbatim mode and by the mocked-harness test."""
    import jax

    # Comparison runs under f64; restore the caller's flag on exit so an
    # in-process invocation (test_capture_harness.py runs first in a plain
    # pytest order) cannot silently flip the rest of the suite to f64 and
    # mask f32 regressions (round-4 advisor, medium).
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        return _compare_against_ours_x64(gold)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def _compare_against_ours_x64(gold):
    import jax.numpy as jnp

    import pygps_tpu as pg

    fx = {k: jnp.asarray(v) for k, v in fixtures().items()}
    H = gold["_meta"]["hyps"]
    fails = []

    def check(name, key, ours, ref, tol):
        ours = np.asarray(ours, dtype=np.float64).ravel()
        ref = np.asarray(ref, dtype=np.float64).ravel()
        err = np.max(np.abs(ours - ref) / (1.0 + np.abs(ref)))
        if not err < tol:
            fails.append(f"{name}.{key}: rel err {err:.3e} > {tol}")

    def cfg0():
        m = pg.GPR()
        m.setPrior(mean=pg.mean.Zero(),
                   kernel=pg.cov.RBF(H["log_ell"], H["log_sf"]))
        m.setData(fx["x0"], fx["y0"])
        m.setNoise(H["log_sn"])
        m.getPosterior()
        ym, ys2, fm, fs2, _ = m.predict(fx["xs0"])
        g = gold["config0_exact_gpr"]
        t = TOLS["config0_exact_gpr"]
        check("config0", "nlZ", m.nlZ, g["nlZ"], t["nlZ"])
        for k, v in (("ym", ym), ("ys2", ys2), ("fm", fm), ("fs2", fs2)):
            check("config0", k, v, g[k], t["vec"])

    def cfg1():
        m = pg.GPC()
        m.setPrior(mean=pg.mean.Zero(),
                   kernel=pg.cov.RBF(H["gpc_log_ell"], H["gpc_log_sf"]))
        m.setData(fx["x1"], fx["y1"])
        m.getPosterior()
        ym, ys2, fm, fs2, lp = m.predict(
            fx["xs1"], ys=jnp.ones(len(fx["xs1"])))
        g = gold["config1_ep_gpc"]
        t = TOLS["config1_ep_gpc"]
        check("config1", "nlZ", m.nlZ, g["nlZ"], t["nlZ"])
        check("config1", "p_plus", jnp.exp(lp), g["p_plus"], t["vec"])
        for k, v in (("fm", fm), ("fs2", fs2)):
            check("config1", k, v, g[k], t["vec"])

    def cfg2():
        m = pg.GPC()
        m.useInference("Laplace")
        k = (pg.cov.RBF(H["gpc_log_ell"], H["gpc_log_sf"])
             + pg.cov.Linear(H["lin_log_sf"]))
        m.setPrior(mean=pg.mean.Zero(), kernel=k)
        m.setData(fx["x1"], fx["y1"])
        m.getPosterior()
        ym, ys2, fm, fs2, lp = m.predict(
            fx["xs1"], ys=jnp.ones(len(fx["xs1"])))
        g = gold["config2_laplace_gpc_composite"]
        t = TOLS["config2_laplace_gpc_composite"]
        check("config2", "nlZ", m.nlZ, g["nlZ"], t["nlZ"])
        check("config2", "p_plus", jnp.exp(lp), g["p_plus"], t["vec"])
        for k2, v in (("fm", fm), ("fs2", fs2)):
            check("config2", k2, v, g[k2], t["vec"])

    def cfg3():
        m = pg.GPR_FITC()
        m.setPrior(mean=pg.mean.Zero(),
                   kernel=pg.cov.RBF(H["log_ell"], H["log_sf"]),
                   inducing_points=fx["u3"])
        m.setData(fx["x3"], fx["y3"])
        m.setNoise(H["log_sn"])
        m.getPosterior()
        ym, ys2, fm, fs2, _ = m.predict(fx["xs3"])
        g = gold["config3_fitc_gpr"]
        t = TOLS["config3_fitc_gpr"]
        check("config3", "nlZ", m.nlZ, g["nlZ"], t["nlZ"])
        for k, v in (("ym", ym), ("ys2", ys2), ("fm", fm), ("fs2", fs2)):
            check("config3", k, v, g[k], t["vec"])

    for name, fn in [("config0_exact_gpr", cfg0), ("config1_ep_gpc", cfg1),
                     ("config2_laplace_gpc_composite", cfg2),
                     ("config3_fitc_gpr", cfg3)]:
        entry = gold.get(name)
        if entry is None or "error" in entry:
            fails.append(f"{name}: not captured "
                         f"({entry.get('error') if entry else 'missing'})")
            continue
        fn()
    return fails
