"""On-chip block/chunk sweep for the distributed Cholesky (p=1, bf16).

One process, one device init; each (block, chunks) config compiles its
own program (persistent cache makes repeats free).  Reports wall and
effective TF/s (n³/3 / wall) — the round-3 north-star gate is ≥30 TF/s
effective at n=32768.
"""

from __future__ import annotations

import json
import statistics
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
from pygps_tpu.parallel.pcholesky import pcholesky
from pygps_tpu.parallel.ring_gram import gram_bc


def run(n, block, chunks, reps=3, trailing="xla", mode="bf16",
        noise=None, lookahead=False, donate=False):
    mesh = pmesh.make_mesh(1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    kern = pg.cov.RBF(jnp.asarray(0.5, jnp.float32),
                      jnp.asarray(0.0, jnp.float32))
    noise = float(n) if noise is None else noise
    gram_j = jax.jit(lambda: gram_bc(kern, x, mesh, block,
                                     noise_diag=jnp.asarray(noise,
                                                            jnp.float32)))
    K_bc = gram_j()
    float(K_bc[0, 0, 0, 0])
    import jax.lax as _lax

    upd = jnp.bfloat16 if mode == "bf16" else None
    gp = _lax.Precision.HIGH if mode == "high" else None
    # donate=True aliases the input slab into the factorization (the
    # engine's real memory shape: the Gram is an intermediate of the same
    # jit there, so XLA reuses its buffer; a standalone probe input can't
    # be reused unless donated).  Timing then re-builds the Gram per rep
    # (subtracted via the measured gram_j wall).
    chol_j = jax.jit(lambda K: pcholesky(K, mesh,
                                         update_dtype=upd,
                                         gemm_precision=gp,
                                         n_col_chunks=chunks,
                                         trailing=trailing,
                                         lookahead=lookahead),
                     donate_argnums=(0,) if donate else ())
    t_gram = 0.0
    if donate:
        t0 = time.perf_counter()
        K_bc = gram_j()
        float(K_bc[0, 0, 0, 0])
        t_gram = time.perf_counter() - t0
    L = chol_j(K_bc)
    float(L[0, 0, 0, 0])
    ts = []
    for _ in range(reps):
        if donate:
            del L
            K_bc = gram_j()
            float(K_bc[0, 0, 0, 0])
        t0 = time.perf_counter()
        L = chol_j(K_bc)
        float(L[0, 0, 0, 0])
        ts.append(time.perf_counter() - t0)
    dt = statistics.median(ts)
    finite = bool(jax.jit(lambda L: jnp.isfinite(L).all())(L))
    print(json.dumps({"n": n, "block": block, "chunks": chunks,
                      "trailing": trailing, "mode": mode,
                      "lookahead": lookahead,
                      "noise": noise,
                      "wall_ms": round(dt * 1e3, 1),
                      "eff_tf_per_s": round(n**3 / 3 / dt / 1e12, 1),
                      "finite": finite}),
          flush=True)
    del K_bc, L


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--configs", type=str,
                    default="1024:16,1024:4,2048:4,2048:8,4096:4,512:16")
    ap.add_argument("--mode", choices=["bf16", "high", "highest"],
                    default="bf16")
    ap.add_argument("--noise", type=float, default=None,
                    help="diagonal noise (default: n, well-conditioned; "
                         "use e.g. 0.135 for the realistic GP regime)")
    args = ap.parse_args()
    for cfg in args.configs.split(","):
        parts = cfg.split(":")
        b, c = int(parts[0]), int(parts[1])
        tr = "xla"
        la = False
        donate = False
        for extra in parts[2:]:
            if extra == "la":
                la = True
            elif extra == "don":
                donate = True
            else:
                tr = extra
        run(args.n, b, c, trailing=tr, mode=args.mode, noise=args.noise,
            lookahead=la, donate=donate)
