"""Gradient-gate the exact-engine backward-inverse precision knob.

Round-4 measured `jax.default_matmul_precision("high")` around the dense
exact engine at 1.18x (100.8 -> 85.3 ms, n=8192) with nlZ identical to 3
decimals, but no GRADIENT accuracy measurement accompanied it, so the
default stayed "highest" (round-4 verdict weak 3 / next-item 4).

This probe closes the gate: for n in {4096, 8192} it compares the full
f32 hyperparameter gradient (d nlZ / d log_ell, log_sf, log_sn — RBF +
Gauss) against the EXACT f64 analytic gradient (numpy: Q = Ktilde^-1 -
aa^T, trace products — the reference's own identities, bench.py
baseline), under backward precision "highest" vs "high", and times the
scanned NLML+grad loop for both.  Gate: rel err of "high" within the
dense engine's documented ~1e-4 f32 envelope AND comparable to
"highest"'s own f32-vs-f64 error (i.e. the knob adds nothing on top of
the f32 floor).

Run on the TPU chip:  python benchmarks/probe_bwd_precision.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def f64_reference_grad(x, y, log_ell=0.0, log_sf=0.0, log_sn=-1.0):
    n = len(y)
    ell, sf2, sn2 = np.exp(log_ell), np.exp(2 * log_sf), np.exp(2 * log_sn)
    xn = (x * x).sum(1)
    d2 = np.maximum(xn[:, None] + xn[None, :] - 2.0 * (x @ x.T), 0.0)
    K = sf2 * np.exp(-0.5 * d2 / ell**2)
    Kt = K + sn2 * np.eye(n)
    L = np.linalg.cholesky(Kt)
    a = np.linalg.solve(Kt, y)
    nlZ = (0.5 * y @ a + np.log(np.diag(L)).sum()
           + 0.5 * n * np.log(2 * np.pi))
    Q = np.linalg.inv(Kt) - np.outer(a, a)
    g = np.array([0.5 * (Q * (K * (d2 / ell**2))).sum(),
                  (Q * K).sum(),
                  sn2 * np.trace(Q)])
    return nlZ, g


def main():
    import jax
    import jax.numpy as jnp

    import pygps_tpu as pg
    from pygps_tpu import config
    from pygps_tpu.inference import exact

    for n in (4096, 8192):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((n, 8))
        y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)
        _, g64 = f64_reference_grad(x, y)
        xj = jnp.asarray(x, jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        prior = (pg.mean.Zero(), pg.cov.RBF(0.0, 0.0), pg.lik.Gauss(-1.0))

        for prec in ("highest", "high", "high+fwd"):
            config.EXACT_BWD_PRECISION = ("high" if prec == "high+fwd"
                                          else prec)
            wrap = prec == "high+fwd"

            # fresh trace per setting (trace-time capture).  "high+fwd"
            # additionally scopes default_matmul_precision("high") over
            # the PRIMAL trace (round-4's whole-engine wrap) — the
            # custom_vjp backward is traced outside this dynamic scope,
            # so the bwd knob stays the explicit config field.
            def vgf(pr, xj=xj, yj=yj, wrap=wrap):
                f = lambda p: exact.nlml(p[0], p[1], p[2], xj, yj)
                if wrap:
                    with jax.default_matmul_precision("high"):
                        return jax.value_and_grad(f)(pr)
                return jax.value_and_grad(f)(pr)

            vg = jax.jit(vgf)
            v, g = vg(prior)
            jax.block_until_ready(v)
            gf = np.array([float(g[1].log_ell), float(g[1].log_sigma),
                           float(g[2].log_sigma)])
            rel = np.abs(gf - g64) / (1.0 + np.abs(g64))

            # timing: scanned loop of sequentially-dependent evals.
            # Round-5 protocol fix: Adam-normalized steps — the raw-GD
            # step (p -= 1e-3 g) diverges to NaN within 3 iterations at
            # these n (gradients scale O(n)), and NaN iterations fire
            # safe_cholesky's jitter ladder, inflating ms/eval ~2x.
            # Both precision arms shared the diverged trajectory, so the
            # round-5 RATIO conclusion (high = 1.08x) stands; absolute
            # ms from before this fix are diverged-trajectory numbers.
            inner = 20 if n == 4096 else 5

            @jax.jit
            def descend(pr, vgf=vgf, inner=inner):
                def step(carry, _):
                    p, m, s, t = carry
                    v, gg = vgf(p)
                    t = t + 1.0
                    m = jax.tree.map(lambda a, b: 0.9*a + 0.1*b, m, gg)
                    s = jax.tree.map(
                        lambda a, b: 0.999*a + 0.001*b*b, s, gg)

                    def upd(pp, mm, ss):
                        mhat = mm / (1.0 - 0.9**t)
                        shat = ss / (1.0 - 0.999**t)
                        return pp - 1e-2 * mhat / (jnp.sqrt(shat) + 1e-8)
                    p = jax.tree.map(upd, p, m, s)
                    return (p, m, s, t), v
                z = jax.tree.map(jnp.zeros_like, pr)
                return jax.lax.scan(
                    step, (pr, z, z, jnp.float32(0.0)), None, length=inner)

            out = descend(prior)
            float(out[1][-1])
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = descend(prior)
                float(out[1][-1])
                ts.append((time.perf_counter() - t0) / inner)
            ms = statistics.median(ts) * 1e3
            print(json.dumps({
                "n": n, "prec": prec, "ms_per_eval": round(ms, 1),
                "grad_rel_err": [float(f"{r:.3e}") for r in rel],
                "max_rel_err": float(f"{rel.max():.3e}"),
                "nlZ": round(float(v), 3),
            }))


if __name__ == "__main__":
    main()
