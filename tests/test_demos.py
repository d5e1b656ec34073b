"""Demos-as-tests: the reference treats its Demo/ scripts as de-facto
integration tests (SURVEY.md §4); each demo asserts its own quality bars."""

import runpy
import sys
from pathlib import Path

import pytest

DEMOS = Path(__file__).resolve().parent.parent / "demos"


_SLOW_DEMOS = {"demo_GPC", "demo_CV", "demo_Sampling", "demo_Distributed",
               "demo_GPR_FITC", "demo_GPMC", "demo_SVGP_SMC",
               "demo_GPC_FITC"}


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_DEMOS
    else n
    for n in ("demo_GPR", "demo_GPC", "demo_GPMC", "demo_GPR_FITC",
              "demo_GPC_FITC", "demo_CV", "demo_GraphKernel",
              "demo_Sampling", "demo_Distributed", "demo_SVGP_SMC")
])
def test_demo_runs(name):
    sys.path.insert(0, str(DEMOS))
    try:
        runpy.run_path(str(DEMOS / f"{name}.py"), run_name="__main__")
    finally:
        sys.path.remove(str(DEMOS))


def test_debug_nans_clean_path():
    """SURVEY.md §5.2: the inference path stays NaN-free under
    jax.debug_nans (deterministic-by-construction check)."""
    import numpy as np
    import jax

    import pygps_tpu as pg

    jax.config.update("jax_debug_nans", True)
    try:
        x = np.linspace(-2, 2, 12)[:, None]
        y = np.sin(x[:, 0])
        m = pg.GPR()
        m.setData(x, y)
        nlZ, _, _ = m.getPosterior()
        assert np.isfinite(nlZ)
    finally:
        jax.config.update("jax_debug_nans", False)
