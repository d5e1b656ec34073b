"""Distributed Cholesky on a 2-D block-cyclic process grid.

The 2-D layout SURVEY.md §2.2 mandates for the TP analog ("2-D
block-cyclic sharding of the n×n Gram matrix"), complementing the 1-D
row layout in parallel/pcholesky.py.  Why 2-D matters (SCALING.md §B):
with the 1-D layout every device receives the FULL n·b panel column per
panel step (per-device gather volume ≈ n²·dtype per factorization,
constant in p), so at pod scale comms stops shrinking while compute
drops as 1/p.  On a (pr × pc) grid each device only needs the panel
blocks for its own block-rows plus the transposed panel for its own
block-columns — per-panel volume n·b/pr + n·b/pc, the classic √p
reduction (ScaLAPACK pdpotrf's communication pattern, re-expressed as
named-axis collectives inside ``shard_map``).

Layout: block (I, J) of the nb × nb block matrix lives on device
(I mod pr, J mod pc) at local index (I//pr, J//pc); the local slab is
(mr, mc, b, b) with mr = nb/pr, mc = nb/pc.  Only the lower block
triangle is meaningful (upper-triangle blocks are never read and are
zeroed on extraction).

Per panel k (owner grid column c0 = k mod pc, owner grid row
r0 = k mod pr):

1. psum-broadcast the b×b diagonal block over BOTH axes; all devices
   factor it redundantly and form its explicit inverse (same
   GEMM-panel-solve trick as the 1-D kernel).
2. Grid column c0 solves its local panel rows (one GEMM), masked to
   global rows > k.
3. Row broadcast: psum over the "col" axis gives every device the
   panel blocks of ITS block-rows (mr, b, b).
4. Transpose assembly: each device scatters the panel blocks it now
   holds that belong to ITS grid column (global row t ≡ c mod pc) into
   an (mc, b, b) buffer; psum over the "row" axis assembles the
   transposed panel segment every device needs (mc, b, b).
5. Trailing update: one (mr·b, b) × (b, mc·b) GEMM per device, chunked
   over local column blocks with the same static triangular row-suffix
   skip as the 1-D kernel (~n³/(3·pr·pc) FLOPs per device).

This module holds the 2-D layout + factorization; the in-layout solves,
inverse, Gram construction, and prediction (right-looking pdtrsm-style,
no dense redistribution) live in ``parallel/exact2d.py``, which is what
``DistributedExact(layout="2d")`` drives end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


# ---------------------------------------------------------------------------
# Layout helpers
# ---------------------------------------------------------------------------


def make_grid_mesh(pr: int, pc: int, axes=("row", "col"),
                   devices=None) -> Mesh:
    """(pr × pc) device grid from ``devices`` (default: the first pr·pc
    visible devices)."""
    devs = np.asarray((devices if devices is not None
                       else jax.devices())[: pr * pc]).reshape(pr, pc)
    return Mesh(devs, axes)


def to_block_cyclic_2d(A: jax.Array, b: int, pr: int, pc: int) -> jax.Array:
    """Dense (n, n) → (pr, pc, mr, mc, b, b) block-cyclic-2-D layout."""
    n = A.shape[0]
    nb = n // b
    assert n % b == 0 and nb % pr == 0 and nb % pc == 0, \
        "pad n so that b | n, pr | n/b, pc | n/b"
    mr, mc = nb // pr, nb // pc
    # (nb, b, nb, b) → block (I, J) at [I, :, J, :]
    Ab = A.reshape(nb, b, nb, b)
    # global I = r + pr*i ; global J = c + pc*j
    Ab = Ab.reshape(mr, pr, b, mc, pc, b)
    return jnp.transpose(Ab, (1, 4, 0, 3, 2, 5))


def from_block_cyclic_2d(A2: jax.Array, tril: bool = False) -> jax.Array:
    """(pr, pc, mr, mc, b, b) → dense (n, n); ``tril=True`` zeroes the
    strict upper BLOCK triangle and the in-block upper triangle of
    diagonal blocks (factor extraction)."""
    pr, pc, mr, mc, b, _ = A2.shape
    nb = mr * pr
    n = nb * b
    A = jnp.transpose(A2, (2, 0, 4, 3, 1, 5)).reshape(n, n)
    if tril:
        A = jnp.tril(A)
    return A


def bc2d_sharding(mesh: Mesh, axes=("row", "col")) -> NamedSharding:
    return NamedSharding(mesh, P(axes[0], axes[1]))


def shard_bc2d(A2: jax.Array, mesh: Mesh, axes=("row", "col")) -> jax.Array:
    return jax.device_put(A2, bc2d_sharding(mesh, axes))


# ---------------------------------------------------------------------------
# Factorization
# ---------------------------------------------------------------------------


def _pchol2d_local(A, *, pr, pc, mr, mc, b, axis_r, axis_c,
                   n_col_chunks=8, update_dtype=None,
                   gemm_precision=None):
    """Kernel body: A is the local (mr, mc, b, b) slab."""
    r = lax.axis_index(axis_r)
    c = lax.axis_index(axis_c)
    nb = mr * pr
    g_rows = r + pr * jnp.arange(mr)          # global block-row indices
    g_cols = c + pc * jnp.arange(mc)          # global block-col indices

    cw = max(1, mc // n_col_chunks)           # chunk width in BLOCKS
    while mc % cw != 0:
        cw -= 1
    nchunks = mc // cw

    def panel(k, A):
        r0 = k % pr
        c0 = k % pc
        kr = k // pr
        kc = k // pc
        # --- 1. diagonal block to everyone (psum over both axes) ---
        blk = lax.dynamic_slice(A, (kr, kc, kr * 0, kr * 0), (1, 1, b, b))
        blk = blk[0, 0]
        here = jnp.logical_and(r == r0, c == c0)
        A_kk = lax.psum(lax.psum(jnp.where(here, blk, 0.0), axis_r),
                        axis_c)
        L_kk = jnp.linalg.cholesky(A_kk)
        iL_kk = lax.linalg.triangular_solve(
            L_kk, jnp.eye(b, dtype=A.dtype), left_side=True, lower=True)
        pan_prec = (lax.Precision.HIGH
                    if (update_dtype is not None
                        or gemm_precision == lax.Precision.HIGH)
                    else lax.Precision.HIGHEST)
        # --- 2. panel solve on grid column c0 (GEMM vs explicit inverse) --
        Ck = lax.dynamic_slice(A, (0, kc, kr * 0, kr * 0),
                               (mr, 1, b, b))[:, 0]          # (mr, b, b)
        L_pan = jnp.matmul(Ck.reshape(mr * b, b), iL_kk.T,
                           precision=pan_prec).reshape(mr, b, b)
        below = (g_rows > k)[:, None, None]
        is_k = (g_rows == k)[:, None, None]
        P_loc = jnp.where(below, L_pan, 0.0) + jnp.where(is_k, L_kk, 0.0)
        mine = (c == c0)
        # write the finished panel column on its owner grid column
        A = jnp.where(mine,
                      lax.dynamic_update_slice(
                          A, P_loc[:, None], (0, kc, kr * 0, kr * 0)),
                      A)
        # --- 3. row broadcast: my block-rows' panel blocks (mr, b, b) ---
        Prow = lax.psum(jnp.where(mine, P_loc, 0.0), axis_c)
        # --- 4. transpose assembly: panel blocks of MY grid column ---
        # I hold panel blocks for t = g_rows; those with t ≡ c (mod pc)
        # belong to my grid column at local col j = (t - c) / pc.
        tgt = (g_rows - c) // pc                              # (mr,)
        ok = jnp.logical_and((g_rows - c) % pc == 0,
                             jnp.logical_and(tgt >= 0, tgt < mc))
        contrib = jnp.zeros((mc, b, b), A.dtype)
        idx = jnp.where(ok, tgt, mc)          # out-of-range rows dropped
        contrib = contrib.at[idx].add(jnp.where(ok[:, None, None],
                                                Prow, 0.0),
                                      mode="drop")
        Pcol = lax.psum(contrib, axis_r)                      # (mc, b, b)
        # column-side mask: only global cols > k receive updates
        Pcol = jnp.where((g_cols > k)[:, None, None], Pcol, 0.0)
        # --- 5. trailing update, chunked with triangular row skip ---
        Lrows = jnp.where(below, Prow, 0.0)     # my rows' panel, rows > k
        if update_dtype is not None:
            Lrows = Lrows.astype(update_dtype)
        Lflat = Lrows.reshape(mr * b, b)
        for ch in range(nchunks):
            j0 = ch * cw                                      # local col blk
            # triangular row skip: the chunk's smallest global column is
            # c + pc·j0 ≥ pc·j0, so local row i (global r + pr·i) can only
            # be in the lower triangle if r + pr·i ≥ pc·j0; conservative
            # over (r, c) — a STATIC suffix, as in the 1-D kernel
            l0 = min(mr, max(0, -(-(pc * j0 - pr + 1) // pr)))
            mrc = mr - l0
            Pc = Pcol[j0:j0 + cw]                             # (cw, b, b)
            if update_dtype is not None:
                Pc = Pc.astype(update_dtype)
            # flatten so the GEMM computes L_i @ P_jᵀ per block pair:
            # Pflat[γ, j·b+β] = P_j[β, γ]
            Pflat = jnp.transpose(Pc, (2, 0, 1)).reshape(b, cw * b)
            # chunk needed once any of its global cols can exceed k:
            needed = jnp.max(g_cols[j0:j0 + cw]) > k

            def upd(ops, mrc=mrc, cw=cw):
                Lf, Pf = ops
                prec = None if update_dtype is not None else gemm_precision
                out = jnp.matmul(Lf, Pf, precision=prec,
                                 preferred_element_type=A.dtype)
                return out.astype(A.dtype).reshape(mrc, b, cw, b)

            delta = lax.cond(
                needed, upd,
                lambda ops: jnp.zeros((mrc, b, cw, b), A.dtype),
                (Lflat[l0 * b:], Pflat))
            delta = jnp.transpose(delta, (0, 2, 1, 3))        # (mrc,cw,b,b)
            A = A.at[l0:, j0:j0 + cw].add(-delta)
        return A

    return lax.fori_loop(0, nb, panel, A)


def pcholesky2d(A2: jax.Array, mesh: Mesh, axes=("row", "col"),
                n_col_chunks: int = 16, update_dtype=None,
                gemm_precision=None) -> jax.Array:
    """Factor an SPD matrix in 2-D block-cyclic layout; returns the lower
    factor in the same layout (upper-triangle blocks undefined — use
    ``from_block_cyclic_2d(..., tril=True)`` or the masked consumers).

    ``update_dtype=jnp.bfloat16`` runs trailing updates in bf16 with f32
    accumulation, as in the 1-D kernel.

    ``n_col_chunks`` default 16 (round-5 sweep at n=32768 b=2048 high,
    p=1: 4→725 ms, 8→633, 16→595 — skip granularity beats cond
    overhead at these shapes; chunk width floors at one block)."""
    pr, pc, mr, mc, b, _ = A2.shape

    def body(A):
        return _pchol2d_local(A[0, 0], pr=pr, pc=pc, mr=mr, mc=mc, b=b,
                              axis_r=axes[0], axis_c=axes[1],
                              n_col_chunks=n_col_chunks,
                              update_dtype=update_dtype,
                              gemm_precision=gemm_precision)[None, None]

    f = shard_map(body, mesh=mesh, in_specs=(P(axes[0], axes[1]),),
                  out_specs=P(axes[0], axes[1]), check_vma=False)
    return f(A2)


def plogdet_chol2d(L2: jax.Array, mesh: Mesh, axes=("row", "col")):
    """log det(A) = 2 Σ log diag L from the 2-D layout factor."""
    pr, pc, mr, mc, b, _ = L2.shape

    def body(L):
        L = L[0, 0]
        r = lax.axis_index(axes[0])
        c = lax.axis_index(axes[1])
        g_rows = r + pr * jnp.arange(mr)

        def acc_i(i, acc):
            gI = g_rows[i]
            # diagonal block (gI, gI) lives here iff gI ≡ c (mod pc)
            j = (gI - c) // pc
            onme = jnp.logical_and((gI - c) % pc == 0,
                                   jnp.logical_and(j >= 0, j < mc))
            blk = lax.dynamic_slice(L, (i, jnp.clip(j, 0, mc - 1),
                                        i * 0, i * 0), (1, 1, b, b))[0, 0]
            v = jnp.sum(jnp.log(jnp.maximum(jnp.diag(blk), 1e-300)))
            return acc + jnp.where(onme, v, 0.0)

        acc = lax.fori_loop(0, mr, acc_i, jnp.asarray(0.0, L.dtype))
        return lax.psum(lax.psum(2.0 * acc, axes[0]), axes[1])[None, None]

    f = shard_map(body, mesh=mesh, in_specs=(P(axes[0], axes[1]),),
                  out_specs=P(axes[0], axes[1]), check_vma=False)
    return f(L2)[0, 0]
