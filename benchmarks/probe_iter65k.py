"""Beyond-HBM demonstration: matrix-free NLML+grad at n=65536 on ONE chip.

Round-3 verdict missing #2: the iterative engine's claimed niche
(n ≳ 50k/chip, where the dense n×n Gram no longer fits 16 GB HBM) had
never been demonstrated.  This probe runs `parallel/piterative.py`
(K never materialized — Gram tiles computed on the fly inside the CG /
Lanczos matvec) at n=65536 on the real v5e and anchors accuracy THREE
ways, none requiring a dense n=65k factorization:

1. **Exact anchor at n=65536**: the Periodic kernel on a UNIFORM 1-D
   grid with period = domain length is exactly CIRCULANT, so its NLML
   (and ∂nlZ/∂log_sn) has a closed FFT form — computed numpy f64 on the
   host in O(n log n) — validating the full CG + SLQ + preconditioner +
   gradient machinery at the target scale against an exact value, on a
   realistic smoothly-decaying spectrum.  (A finite-rank Linear-kernel
   Woodbury anchor was tried first and rejected: XLA's dot merger
   re-associates the streamed linear tiles back into one x·xᵀ
   (n, n) dot — for finite-rank kernels the closed Woodbury path is the
   right tool anyway; the streaming engine's niche is the nonlinear
   stationary zoo, whose tiles cannot merge.)
2. **Dense-anchored trend**: the same RBF config measured at n=16384
   and n=32768 against the on-chip dense NLML (those sizes still fit),
   so the n=65536 RBF error is an extrapolation of a measured trend,
   stated as such.
3. **Posterior-mean check at n=65536**: CG is exact-to-tolerance, so
   ‖K̃·alpha − r‖/‖r‖ is a direct residual certificate.

Also reports wall-clock and the device HBM peak (memory_stats) —
the artifact that the 17 GB dense Gram regime runs in O(n·probes).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import pygps_tpu as pg
from pygps_tpu.parallel import mesh as pmesh
from pygps_tpu.parallel.piterative import DistributedIterative


def hbm_peak_gib():
    try:
        st = jax.local_devices()[0].memory_stats()
        return round(st.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:  # noqa: BLE001
        return None


def make_rbf_problem(n, d=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0])
                    + 0.1 * rng.standard_normal(n), jnp.float32)
    return x, y


def dense_nlz(mean, kern, lik, x, y):
    K = kern.Ktrain(x)
    sn2 = jnp.exp(2.0 * lik.log_sigma)
    n = y.shape[0]
    i = jnp.arange(n)
    L = jnp.linalg.cholesky(K.at[i, i].add(sn2))
    r = y - mean(x)
    a = jax.scipy.linalg.cho_solve((L, True), r)
    return (0.5 * jnp.dot(r, a) + jnp.sum(jnp.log(jnp.diag(L)))
            + 0.5 * n * jnp.log(2.0 * jnp.pi))


def circulant_exact(n, ell, sn2, y):
    """Exact NLML for the circulant K̃ = C + sn2·I, C the Periodic-kernel
    Gram on the uniform grid x_i = i/n with period 1 (numpy f64,
    O(n log n)): c_j = exp(−2 sin²(π j/n)/ℓ²), eig = Re FFT(c)."""
    j = np.arange(n)
    c = np.exp(-2.0 * np.sin(np.pi * j / n) ** 2 / ell**2)
    lam = np.real(np.fft.fft(c)) + sn2
    Fy = np.fft.fft(np.asarray(y, np.float64))
    quad = float(np.sum((Fy * np.conj(Fy)).real / lam)) / n
    return 0.5 * quad + 0.5 * np.log(lam).sum() + 0.5 * n * np.log(2 * np.pi)


def run_rbf(n, eng, anchor=True):
    x, y = make_rbf_problem(n)
    mean, kern, lik = (pg.mean.Zero(), pg.cov.RBF(0.3, 0.0),
                       pg.lik.Gauss(-1.0))
    ref = None
    if anchor:
        ref = float(jax.jit(dense_nlz)(mean, kern, lik, x, y))

    f = jax.jit(lambda x_, y_: eng.nlml(mean, kern, lik, x_, y_))
    v = f(x, y)
    float(v)
    t0 = time.perf_counter()
    v = f(x, y)
    float(v)
    dt_f = time.perf_counter() - t0

    def obj(ls):
        return eng.nlml(mean, kern, pg.lik.Gauss(ls), x, y)

    g = jax.jit(jax.value_and_grad(obj))
    out = g(jnp.asarray(-1.0, jnp.float32))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g(jnp.asarray(-1.0, jnp.float32))
    jax.block_until_ready(out)
    dt_g = time.perf_counter() - t0

    rec = {"probe": f"piter_rbf_n{n}", "fwd_s": round(dt_f, 2),
           "nlml_grad_s": round(dt_g, 2), "nlz": round(float(v), 2),
           "hbm_peak_gib": hbm_peak_gib()}
    if ref is not None:
        rec["rel_err_nlz"] = round(abs(float(v) - ref) / abs(ref), 6)
        rec["dense_ref"] = round(ref, 2)
    print(json.dumps(rec), flush=True)
    return rec


def run_circulant_exact(n, eng, ell=0.1):
    """Exact FFT anchor at full scale: Periodic kernel on the uniform
    grid over [0, 1) with period 1 → circulant Gram, closed-form NLML.

    Runs with the fused Pallas Gram DISABLED: the periodic-kind Pallas
    tile on d=1 inputs, invoked thousands of times inside the CG/Lanczos
    while loops at n=65536, reproducibly faults the TPU worker
    ("kernel fault") even though the same kernel passes isolated-shape
    tests — not yet root-caused; the XLA tile path is used here, and
    the RBF n=65536 case (d=8) exercises the Pallas path at scale
    without issue."""
    pg.cov.use_fused_gram(False)
    rng = np.random.default_rng(1)
    x = jnp.asarray((np.arange(n) / n).astype(np.float32)[:, None])
    y_np = (np.sin(6 * np.pi * np.arange(n) / n)
            + 0.3 * rng.standard_normal(n))
    yj = jnp.asarray(y_np.astype(np.float32))
    log_sn = -1.0
    sn2 = float(np.exp(2 * log_sn))
    mean = pg.mean.Zero()
    kern = pg.cov.Periodic(float(np.log(ell)), 0.0, 0.0)
    lik = pg.lik.Gauss(log_sn)
    ref = circulant_exact(n, ell, sn2, y_np)

    f = jax.jit(lambda x_, y_: eng.nlml(mean, kern, lik, x_, y_))
    v = f(x, yj)
    float(v)
    t0 = time.perf_counter()
    v = f(x, yj)
    float(v)
    dt = time.perf_counter() - t0

    # gradient anchor: d nlZ / d log_sn via central FD of the exact form
    eps = 1e-4
    fd = (circulant_exact(n, ell, float(np.exp(2 * (log_sn + eps))), y_np)
          - circulant_exact(n, ell, float(np.exp(2 * (log_sn - eps))),
                            y_np)) / (2 * eps)
    gfun = jax.jit(jax.grad(
        lambda ls: eng.nlml(mean, kern, pg.lik.Gauss(ls), x, yj)))
    gv = float(gfun(jnp.asarray(log_sn, jnp.float32)))

    # CG residual certificate for the posterior mean at scale
    alpha, it, res = eng.posterior_mean_alpha(mean, kern, lik, x, yj)
    print(json.dumps({
        "probe": f"piter_circulant_exact_n{n}_ell{ell}",
        "rel_err_nlz": round(abs(float(v) - ref) / abs(ref), 8),
        "nlz": round(float(v), 2), "exact_ref": round(ref, 2),
        "grad_log_sn": round(gv, 4), "grad_fd_exact": round(fd, 4),
        "rel_err_grad": round(abs(gv - fd) / (abs(fd) + 1e-12), 6),
        "fwd_s": round(dt, 2), "cg_iters": int(it),
        "cg_rel_residual": float(res),
        "hbm_peak_gib": hbm_peak_gib(),
    }), flush=True)
    pg.cov.use_fused_gram(None)   # restore the auto heuristic


def run_rbf_staged(n, eng, tag=""):
    """NLML+grad via the STAGED multi-dispatch driver (round-4 verdict
    weak 4: the 33.85 s single grad dispatch sat past the tunnel's
    ~25-30 s fault line — every staged phase stays well under it), with
    per-phase wall breakdown.  Runs twice: compile+run, then warm."""
    x, y = make_rbf_problem(n)
    mean, kern, lik = (pg.mean.Zero(), pg.cov.RBF(0.3, 0.0),
                       pg.lik.Gauss(-1.0))
    t_all = {}
    eng.nlml_and_grad_staged(mean, kern, lik, x, y, timings=t_all)
    cold = dict(t_all)
    t_all = {}
    t0 = time.perf_counter()
    v, grads = eng.nlml_and_grad_staged(mean, kern, lik, x, y,
                                        timings=t_all)
    wall = time.perf_counter() - t0
    import jax.flatten_util as fu

    gflat, _ = fu.ravel_pytree(grads)
    print(json.dumps({
        "probe": f"piter_rbf_staged_n{n}{tag}",
        "nlml_grad_s": round(wall, 2), "phases_s": t_all,
        "phases_cold_s": cold,
        "max_phase_s": round(max(t_all.values()), 2),
        "nlz": round(float(v), 2),
        "grad_finite": bool(np.all(np.isfinite(np.asarray(gflat)))),
        "hbm_peak_gib": hbm_peak_gib(),
    }), flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--lanczos", type=int, default=96)
    ap.add_argument("--rank", type=int, default=512)
    ap.add_argument("--probes", type=int, default=16)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--stage", choices=["trend", "65k", "all", "staged65k"],
                    default="all")
    ap.add_argument("--fused", choices=["auto", "on", "off"],
                    default="auto",
                    help="force the Pallas fused Gram inside the "
                         "streaming matvec on/off (staged65k only)")
    args = ap.parse_args()

    mesh = pmesh.make_mesh(1)
    eng = DistributedIterative(
        mesh_=mesh, col_chunks=args.chunks, cg_tol=1e-4, cg_iters=512,
        num_probes=args.probes, lanczos_iters=args.lanczos,
        precond_rank=args.rank)

    if args.stage in ("trend", "all"):
        for n in (16384, 32768):
            run_rbf(n, eng, anchor=True)
    if args.stage in ("65k", "all"):
        # dedicated shallower config for the anchor: rank-512 covers ALL
        # ~100 significant circulant modes, so the preconditioned
        # spectrum is ~flat and 32 Lanczos steps suffice; the deep
        # config's 96 sequential matvecs (~0.25 s each on the XLA d=1
        # periodic tiles) push the single nlml dispatch past the axon
        # tunnel's per-execution limit and fault the worker (observed
        # repeatedly; the 21 s RBF dispatch is just under it).
        eng_anchor = DistributedIterative(
            mesh_=mesh, col_chunks=args.chunks, cg_tol=1e-4, cg_iters=64,
            num_probes=args.probes, lanczos_iters=32, precond_rank=512)
        run_circulant_exact(65536, eng_anchor)
        run_rbf(65536, eng, anchor=False)
    if args.stage == "staged65k":
        if args.fused != "auto":
            pg.cov.use_fused_gram(args.fused == "on")
        run_rbf_staged(65536, eng,
                       tag=f"_ch{args.chunks}_p{args.probes}"
                           f"_f{args.fused}")
        pg.cov.use_fused_gram(None)


if __name__ == "__main__":
    main()
