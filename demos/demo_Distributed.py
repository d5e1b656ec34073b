"""Distributed demo — DistGPR over a device mesh (8 virtual CPU devices
when run off-TPU; the same code drives a v5e slice)."""

import os
import sys
from pathlib import Path

# default to the 8-device virtual CPU mesh; set PYGPS_DEMO_TPU=1 to run on
# real TPU devices instead (the session env pins JAX_PLATFORMS=axon, so a
# plain setdefault would silently land on the single tunneled chip)
if "pytest" not in sys.modules and not os.environ.get("PYGPS_DEMO_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax                                 # noqa: E402

if not os.environ.get("PYGPS_DEMO_TPU"):
    # env var alone does not override the session's axon platform pin;
    # the config update does (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import pygps_tpu as pg                     # noqa: E402
from pygps_tpu.models.dist import DistGPR  # noqa: E402
from pygps_tpu.parallel import mesh as pmesh  # noqa: E402


def main():
    p = min(8, len(jax.devices()))
    mesh = pmesh.make_mesh(p)
    block = 8
    n = block * p * 4
    rng = np.random.default_rng(0)
    x = np.linspace(-3, 3, n)[:, None]
    y = np.sin(2 * x[:, 0]) + 0.15 * rng.standard_normal(n)

    model = DistGPR(mesh=mesh, block=block)
    model.setData(x, y)
    nlZ0, dnlZ, _ = model.getPosterior()
    print(f"[Dist] mesh={p} devices, n={n}: initial nlZ = {nlZ0:.4f}")
    nlZ1, _ = model.optimize(numIterations=15)
    print(f"[Dist] optimized nlZ = {nlZ1:.4f}")
    xs = np.linspace(-3, 3, 50)[:, None]
    ym, ys2, fm, fs2, _ = model.predict(xs)
    rmse = float(np.sqrt(np.mean((fm[:, 0] - np.sin(2 * xs[:, 0])) ** 2)))
    print(f"[Dist] predictive RMSE vs truth = {rmse:.4f}")
    assert rmse < 0.3


if __name__ == "__main__":
    main()
