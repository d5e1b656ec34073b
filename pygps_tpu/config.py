"""Global numeric configuration for pygps_tpu.

The reference (pyGPs) runs everything in numpy float64 on CPU. On TPU the
native matmul/Cholesky path is float32 (MXU), so the library is written
dtype-polymorphic: all public entry points normalise inputs with
:func:`asarray`, and internal constants inherit the dtype of their operands.
Parity tests run on CPU with ``jax_enable_x64`` for float64 agreement with
closed-form references (see tests/conftest.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Diagonal jitter ladder used by ``utils.tools.safe_cholesky`` — mirrors the
#: escalation strategy of pyGPs ``tools.jitchol`` (×10 per retry, 5 tries)
#: but runs data-parallel under jit instead of a Python try/except loop.
JITTER_INIT_SCALE = 1e-10
JITTER_GROWTH = 10.0
JITTER_MAX_TRIES = 8

#: Relative jitter added to Kuu in FITC inference (reference: inf.py FITC
#: engines use snu2 = 1e-6 * sn2).
FITC_JITTER_REL = 1e-6

#: Backward pass of the exact-NLML analytic VJP: form K̃⁻¹ via the blocked
#: GEMM-rate inverse (ops/trtri.py, ~5n³/3 FLOPs at MXU rate) instead of
#: solve_chol(L, I) (2n³ FLOPs at the ~7 TF/s TRSM rate).  Same explicit
#: inverse, same conditioning; toggle with :func:`use_gemm_inverse`.
#: Default ON since round 2: measured on v5e (probe_trtri_tpu.py) the
#: GEMM form is 1.76× faster than solve_chol at n=8192 (58.5 vs 102.7 ms,
#: rel err ~1e-6) and the end-to-end NLML+grad drops 144 → 105 ms (1.37×).
GEMM_INVERSE = True

#: Matmul precision of the exact-engine backward-inverse GEMMs
#: (ops/trtri.py inside _nlml_core_bwd).  The package pins the global
#: default to "highest" (parity-first); the backward explicit inverse is
#: the one place "high" (bf16_3x) is measurably faster AND
#: gradient-gated safe: probe_bwd_precision.py measured the f32 hyp
#: gradients vs an exact f64 analytic reference at n=4096/8192 within
#: the dense engine's documented ~1e-4 envelope in both settings (see
#: MEASUREMENTS.md round-5).  No effect on CPU/f64 parity runs (matmul
#: precision is a TPU/f32 concept).  Same trace-time-capture caveat as
#: GEMM_INVERSE: set before building objectives.
EXACT_BWD_PRECISION: str | None = "high"

#: EP-sweep marginal variances (DenseOps.diag_Sigma) via explicit L⁻¹ +
#: DEFAULT-precision GEMM instead of the n×n TRSM.  Off by default:
#: measured at n=4096 on v5e the HIGHEST-precision GEMM form was SLOWER
#: than the TRSM (probe_ep_tuning.py round 3); the DEFAULT-precision
#: form trades ~2⁻²¹ contraction error (inside EP's 1e-4 tolerance) for
#: the MXU rate — enable for throughput-bound EP at large n.
EP_GEMM_DIAG_SIGMA = False

#: EP hyperparameter gradients via the analytic fixed-point form (GPML
#: infEP.m F-form; see inference/ep.py::energy_fixed_sites_dense) instead
#: of autodiff through the energy: reuses the sweep loop's converged
#: factorization, replacing the energy's forward re-factorization and its
#: ~2n³ VJP with ONE triangular-solve pass.  Exact at the EP fixed point
#: (same stationarity the site stop-gradient already relies on); disable
#: to fall back to full autodiff through the differentiable energy.
EP_ANALYTIC_GRAD = True


def use_gemm_inverse(enable: bool = True) -> None:
    """Route the exact-engine analytic backward through the blocked
    GEMM inverse (ops/trtri.py) instead of XLA triangular solves.

    .. note:: **Trace-time capture.** The flag is read while JAX traces the
       exact-engine VJP (inference/exact.py), and jit caches are NOT keyed
       on it: toggling after an objective/nlml has been compiled does not
       change already-compiled programs (they keep whichever path they were
       traced with; new shapes trace with the new value).  Set it before
       building objectives — e.g. at import, right after
       ``import pygps_tpu`` — or rebuild the objective after toggling."""
    global GEMM_INVERSE
    GEMM_INVERSE = enable


def default_dtype() -> jnp.dtype:
    """float64 when x64 is enabled (CPU parity mode), else float32 (TPU)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def asarray(x) -> jax.Array:
    """Convert to a jnp array in the default floating dtype."""
    a = jnp.asarray(x)
    if not jnp.issubdtype(a.dtype, jnp.floating):
        a = a.astype(default_dtype())
    elif a.dtype != default_dtype():
        a = a.astype(default_dtype())
    return a
