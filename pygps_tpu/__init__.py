"""pygps_tpu — a TPU-native Gaussian-process inference engine.

Covers the full model surface of pyGPs (marionmari/pyGPs) — composable
mean/covariance/likelihood functors, Exact/Laplace/EP inference, FITC
sparse GPs, one-vs-rest multiclass, validation and graph-kernel
extensions — rebuilt from scratch for TPU: jax autodiff replaces hand
derivatives, Pallas kernels accelerate Gram/Cholesky, inference scales over
device meshes via shard_map/ICI collectives, and the inference menu extends
to SVGP, NUTS/HMC and SMC.

Top-level re-exports mirror the reference package root
(pyGPs/__init__.py:~1-20): models ``GPR, GPC, GPMC, GPR_FITC, GPC_FITC``
and the modules ``mean, cov, lik, inf, opt``.
"""

import jax as _jax

# True-f32 matmuls by default.  On TPU, f32 dot/conv inputs are otherwise
# multiplied in bf16 (one MXU pass): the resulting ~1e-3 relative error is
# catastrophic for Gram-matrix cancellation (‖x‖²+‖z‖²−2x·z can come out
# indefinite at the 1e-2 level → Cholesky NaN at FITC/exact scales).  The
# deliberate low-precision fast paths (e.g. pcholesky update_dtype=bf16)
# cast operands to bf16 explicitly and are unaffected.  Respect a user's
# own setting if one was made before import.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from pygps_tpu.core import kernels as cov
from pygps_tpu.core import likelihoods as lik
from pygps_tpu.core import means as mean
from pygps_tpu.core.posteriors import Posterior, predict_latent
from pygps_tpu.inference import engines as inf
from pygps_tpu.models.gp import GP, GPC, GPC_FITC, GPMC, GPR, GPR_FITC
from pygps_tpu.optimize import optimizers as opt

__version__ = "0.1.0"

__all__ = [
    "GP", "GPR", "GPC", "GPMC", "GPR_FITC", "GPC_FITC",
    "mean", "cov", "lik", "inf", "opt",
    "Posterior", "predict_latent",
    "DistGPR", "PredictServer",
]


def __getattr__(name):
    # lazy extension exports (avoid pulling the distributed/serving stacks
    # into the base import path)
    if name == "DistGPR":
        from pygps_tpu.models.dist import DistGPR

        return DistGPR
    if name == "PredictServer":
        from pygps_tpu.serve import PredictServer

        return PredictServer
    raise AttributeError(f"module 'pygps_tpu' has no attribute {name!r}")
