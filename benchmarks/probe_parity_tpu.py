"""Real-TPU numerics parity probe (BASELINE.md "parity within solver
tolerance" on actual hardware, f32).

Compares, at n=4096, the on-chip f32 NLML(+grad) of every exact-GP
engine — dense Cholesky, iterative (PCG+SLQ), distributed (p=1 mesh) —
against a float64 numpy reference evaluated host-side (the reference
recipe: dense Gram + Cholesky, SURVEY §2.4).

This is the regression guard for the f32-on-TPU accuracy story: with
default (bf16-multiply) matmul precision the Gram cancellation is wrong
at the 1e-2 level and this probe fails loudly; with the package's
HIGHEST-precision default the engines agree with f64 to ~1e-5 relative.

Prints one JSON line per engine; run without platform overrides.
"""

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, D = 4096, 4
LOG_ELL, LOG_SF, LOG_SN = 0.3, 0.1, -1.0


def _data():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((N, D)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(N)).astype(np.float32)
    return x, y


def numpy_f64_reference(x, y):
    """Dense f64 NLML + grads (reference inf.Exact recipe)."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    n = len(y)
    ell2 = np.exp(2 * LOG_ELL)
    sf2, sn2 = np.exp(2 * LOG_SF), np.exp(2 * LOG_SN)
    xn = (x * x).sum(1)
    d2 = np.maximum(xn[:, None] + xn[None, :] - 2.0 * (x @ x.T), 0.0)
    K = sf2 * np.exp(-0.5 * d2 / ell2)
    Kt = K + sn2 * np.eye(n)
    L = np.linalg.cholesky(Kt)
    a = np.linalg.solve(Kt, y)
    nlZ = 0.5 * y @ a + np.log(np.diag(L)).sum() + 0.5 * n * np.log(2 * np.pi)
    Q = np.linalg.inv(Kt) - np.outer(a, a)
    g = np.array([0.5 * (Q * (K * d2 / ell2)).sum(),   # dlog_ell
                  (Q * K).sum(),                        # dlog_sf
                  sn2 * np.trace(Q)])                   # dlog_sn
    return nlZ, g


def _flat_grad(g):
    leaves = jax.tree.leaves(g)
    return np.array([float(v) for v in leaves])


def probe(name):
    def deco(fn):
        def run(ref, x, y):
            try:
                t0 = time.perf_counter()
                rec = fn(ref, x, y)
                rec["probe"] = name
                rec["total_s"] = round(time.perf_counter() - t0, 1)
                print(json.dumps(rec), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"probe": name, "error": repr(e)}),
                      flush=True)
                traceback.print_exc()
        return run
    return deco


def _compare(ref, v, g):
    nl_ref, g_ref = ref
    rel_nlz = abs(float(v) - nl_ref) / abs(nl_ref)
    g = np.asarray(g, np.float64)
    rel_g = float(np.max(np.abs(g - g_ref) / (np.abs(g_ref) + 1e-6)))
    return {"nlZ": float(v), "nlZ_f64": nl_ref,
            "rel_err_nlZ": round(rel_nlz, 8),
            "max_rel_err_grad": round(rel_g, 6)}


def _prior():
    import pygps_tpu as pg

    return (pg.mean.Zero(), pg.cov.RBF(LOG_ELL, LOG_SF),
            pg.lik.Gauss(LOG_SN))


@probe("parity_dense_exact_f32")
def dense_probe(ref, x, y):
    from pygps_tpu.inference import exact

    xj, yj = jnp.asarray(x), jnp.asarray(y)
    v, g = jax.jit(jax.value_and_grad(
        lambda pr: exact.nlml(pr[0], pr[1], pr[2], xj, yj)))(_prior())
    return _compare(ref, v, _flat_grad(g))


@probe("parity_iterative_f32")
def iterative_probe(ref, x, y):
    from pygps_tpu.inference import iterative

    xj, yj = jnp.asarray(x), jnp.asarray(y)
    v, g = jax.jit(jax.value_and_grad(
        lambda pr: iterative.nlml(pr[0], pr[1], pr[2], xj, yj,
                                  num_probes=16, lanczos_iters=25,
                                  cg_tol=1e-5, cg_iters=256,
                                  precond_rank=128)))(_prior())
    rec = _compare(ref, v, _flat_grad(g))
    rec["note"] = "stochastic logdet/grad: expect ~1e-3"
    return rec


@probe("parity_distributed_f32")
def distributed_probe(ref, x, y):
    from pygps_tpu.parallel import mesh as pmesh
    from pygps_tpu.parallel.exact import DistributedExact

    mesh = pmesh.make_mesh()
    eng = DistributedExact(mesh, block=256)
    m, k, lik = _prior()
    v, g = jax.value_and_grad(
        lambda pr: eng.nlml(pr[0], pr[1], pr[2],
                            jnp.asarray(x), jnp.asarray(y)))((m, k, lik))
    return _compare(ref, v, _flat_grad(g))


if __name__ == "__main__":
    x, y = _data()
    ref = numpy_f64_reference(x, y)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    table = {"dense": dense_probe, "iterative": iterative_probe,
             "distributed": distributed_probe}
    if which == "all":
        for fn in table.values():
            fn(ref, x, y)
    else:
        table[which](ref, x, y)
