"""Distributed inverse from a Cholesky factor: B⁻¹ = L⁻ᵀ L⁻¹.

Needed for the analytic NLML gradient (Q = K̃⁻¹ − ααᵀ, reference
inf.Exact dnlZ assembly, inf.py:~180) in the distributed exact engine.

Layout: L is bc-row-sharded (p, m, b, n).  The identity RHS is column
sharded the same block-cyclic way (device d owns column blocks ≡ d mod p),
so each device solves all n rows of its own n/p columns locally, with one
O(n·b) panel broadcast (psum / all_gather) per panel.  B⁻¹ is symmetric, so
the column-sharded result transposes block-locally into bc row layout —
no data movement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pygps_tpu.ops.trtri import inv_from_chol, tril_inverse


def _prec(update_dtype, gemm_precision=None):
    """Panel-GEMM precision policy: HIGHEST in full-precision mode;
    HIGH (bf16_3x, ~2⁻²¹ contraction error) in bf16/high modes —
    consistent with the pcholesky panel-solve policy and far tighter
    than the bf16 coupling GEMMs bf16 mode accepts.  (NOT DEFAULT: on
    v5e that is a single bf16 pass — see pcholesky panel comment.)"""
    if update_dtype is not None or gemm_precision == lax.Precision.HIGH:
        return lax.Precision.HIGH
    return lax.Precision.HIGHEST


def pinv_chol(L_bc: jax.Array, mesh: Mesh, axis: str = "shard",
              n_row_chunks: int = 8, update_dtype=None,
              gemm_precision=None) -> jax.Array:
    """B⁻¹ (bc row layout) from the bc-layout factor L of B.

    Both solve phases chunk their (n-long) contraction dimension into
    ``n_row_chunks`` static pieces and skip the structurally-zero half
    with ``lax.cond`` (forward: Z rows ≥ the active panel are still zero;
    backward: X rows ≤ the active panel are not yet filled) — ~2n³/p
    FLOPs instead of 4n³/p, same arithmetic.

    ``update_dtype=jnp.bfloat16`` feeds the chunked coupling GEMMs (the
    2n³/p hot FLOPs) bf16 operands with f32 accumulation; the b×b
    triangular solves and the solution panels stay f32.  Same error
    envelope as the pcholesky bf16 trailing updates (gradients ~1 % rel,
    tests/test_parallel.py)."""
    p, m, b, n = L_bc.shape
    nb = m * p
    nloc = m * b

    if p == 1:
        # single-device fast path: the bc slab IS the dense factor (a
        # reshape), so B⁻¹ comes from the GEMM-dominated blocked
        # tril_inverse + WᵀW (ops/trtri.py, ~n³ FLOPs with no
        # sequential panel loop) instead of the 2n³ forward/backward
        # substitution sweeps — ~2× fewer FLOPs and all of them
        # full-width GEMMs.
        prec = _prec(update_dtype, gemm_precision)
        # no tril(): pcholesky zeroes the strict upper triangle as each
        # panel column is written, and inv_from_chol only reads the
        # lower triangle anyway — a tril copy would cost an n² temp
        L_dense = L_bc.reshape(n, n)
        Binv = inv_from_chol(L_dense, precision=prec)
        return Binv.reshape(L_bc.shape)

    # cap the chunk unroll for small problems (compile time; see
    # _pchol_local) — the structural-zero skips only pay at scale
    if n < 4096:
        n_row_chunks = min(n_row_chunks, 4)
    # chunk height: multiple of b dividing n
    ch = max(b, (n // n_row_chunks) // b * b)
    while n % ch != 0:
        ch -= b
    nchunks = n // ch

    def body(L):
        L = L[0]
        d = lax.axis_index(axis)
        gidx = d + p * jnp.arange(m)           # my block indices
        # my columns' global positions, as an (nloc,) index map block-wise.
        # The identity RHS I[:, mycols] is NOT materialized (an n×n/p
        # one-hot buffer — 4 GiB at n=32768 p=1, part of the round-2
        # memory wall); each panel builds its own (b, n/p) row slice.
        mycols = (gidx[:, None] * b + jnp.arange(b)[None, :]).reshape(nloc)

        # ---- forward: Z = L⁻¹ I_cols  (Z: (n, nloc), all rows local) ----
        def fwd(k, Z):
            owner = k % p
            kloc = k // p
            cs = k * b
            row = lax.dynamic_index_in_dim(L, kloc, axis=0, keepdims=False)
            row = lax.psum(jnp.where(d == owner, row, jnp.zeros_like(row)),
                           axis)                       # (b, n) L block row k
            # S = Σ_{j<k} L_kj Z_j: Z rows ≥ cs are zero → skip chunks
            # that start at/after the panel
            S = jnp.zeros((b, nloc), L.dtype)
            for c in range(nchunks):
                start = c * ch
                needed = start < cs

                def part(ops):
                    r_, z_ = ops
                    if update_dtype is not None:
                        return jnp.matmul(r_.astype(update_dtype),
                                          z_.astype(update_dtype),
                                          preferred_element_type=L.dtype)
                    return jnp.matmul(r_, z_, precision=gemm_precision,
                                      preferred_element_type=L.dtype)

                S = S + lax.cond(
                    needed, part,
                    lambda ops: jnp.zeros((b, nloc), L.dtype),
                    (row[:, start:start + ch], Z[start:start + ch]))
            L_kk = lax.dynamic_slice(row, (cs * 0, cs), (b, b))
            I_k = ((cs + jnp.arange(b))[:, None] ==
                   mycols[None, :]).astype(L.dtype)
            # explicit b×b inverse + GEMM instead of a b×(n/p)-RHS TRSM:
            # XLA lowers the big-RHS triangular solve as a 128-panel while
            # loop whose growing (k·128, n/p) temps blew the HBM plan at
            # n=32768 b=4096 (20.7 GiB); the GEMM form has one (b, n/p)
            # temp and runs at MXU rate
            iL = tril_inverse(L_kk)
            Z_k = jnp.matmul(iL, I_k - S,
                             precision=_prec(update_dtype, gemm_precision),
                             preferred_element_type=L.dtype)
            return lax.dynamic_update_slice(Z, Z_k, (cs, cs * 0))

        Z = lax.fori_loop(0, nb, fwd, jnp.zeros((n, nloc), L.dtype))

        # ---- backward: X = L⁻ᵀ Z, IN PLACE over the Z buffer ----
        # The backward substitution runs k = nb-1 .. 0; at step k it reads
        # Z only at row block k and X only at row blocks > k (already
        # written).  Overwriting Z row-block k with X_k is therefore safe
        # and halves the solve-phase footprint (one (n, nloc) buffer
        # instead of two — at n=32768 p=1 that is a 4 GiB saving, part of
        # the n≈24k NLML-gradient memory-wall fix, SCALING.md §A).
        row_block = jnp.arange(n) // b

        def bwd(i, ZX):
            k = nb - 1 - i
            cs = k * b
            # full panel column L[:, cs:cs+b]: gather local contributions
            C = lax.dynamic_slice(L, (cs * 0, cs * 0, cs), (m, b, b))   # (m, b, b)
            C_all = lax.all_gather(C, axis)                   # (p, m, b, b)
            col = jnp.swapaxes(C_all, 0, 1).reshape(n, b)
            L_kk = lax.dynamic_slice(col, (cs, cs * 0), (b, b))
            # strict sub-panel only (rows > block k) for the coupling term;
            # ZX rows ≤ panel end still hold Z (not yet overwritten) →
            # skip those chunks
            col_strict = jnp.where((row_block > k)[:, None], col, 0.0)
            S = jnp.zeros((b, nloc), L.dtype)
            for c in range(nchunks):
                start = c * ch
                needed = (start + ch) > (cs + b)

                def part(ops):
                    c_, x_ = ops
                    if update_dtype is not None:
                        return jnp.matmul(c_.T.astype(update_dtype),
                                          x_.astype(update_dtype),
                                          preferred_element_type=L.dtype)
                    return jnp.matmul(c_.T, x_, precision=gemm_precision,
                                      preferred_element_type=L.dtype)

                S = S + lax.cond(
                    needed, part,
                    lambda ops: jnp.zeros((b, nloc), L.dtype),
                    (col_strict[start:start + ch], ZX[start:start + ch]))
            Z_k = lax.dynamic_slice(ZX, (cs, cs * 0), (b, nloc))
            iL = tril_inverse(L_kk)
            X_k = jnp.matmul(iL.T, Z_k - S,
                             precision=_prec(update_dtype, gemm_precision),
                             preferred_element_type=L.dtype)
            return lax.dynamic_update_slice(ZX, X_k, (cs, cs * 0))

        X = lax.fori_loop(0, nb, bwd, Z)
        # X[:, mycols] = B⁻¹[:, mycols]; symmetry → my row blocks are the
        # block-transposes of my column slabs
        Xb = X.reshape(n, m, b)                 # columns grouped by my blocks
        rows = jnp.transpose(Xb, (1, 2, 0))     # (m, b, n) = my bc row slab
        return rows[None]

    f = shard_map(body, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
                  check_vma=False)
    return f(L_bc)
