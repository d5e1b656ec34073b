"""Distributed blocked Cholesky, triangular solves, and inverse over a mesh.

This is the TPU-native replacement for LAPACK dpotrf/dtrsm in the reference
(SURVEY.md §2.1): a right-looking blocked Cholesky on a 1-D block-cyclic
row layout (parallel/mesh.py), communicating exclusively through named-axis
collectives inside ``shard_map`` (psum for O(b²) panel broadcasts,
all_gather for the O(n·b) panel column) which XLA lowers onto ICI.

Algorithm per panel k (nb = n/b panels, owner = k mod p):
  1. psum-broadcast the diagonal block A_kk; every device factors it
     redundantly (b×b, negligible).
  2. Each device solves its local panel rows L_ik = A_ik·L_kk⁻ᵀ (batched
     TRSM on its m local block rows — MXU work, no comms).
  3. all_gather the panel column P = L[:, kb:kb+b]; the block-cyclic order
     makes the gathered (p, m, b, b) → (n, b) reorder a pure reshape.
  4. Trailing update A_i· -= L_ik·Pᵀ as one batched (m,b,b)×(b,n) matmul
     per device (the hot MXU op), with block-row masks keeping finished
     panels untouched; the strict upper triangle is zeroed for free as each
     panel column is written.

Load balance comes from the block-cyclic assignment (every panel's trailing
work is spread over all devices).  FLOP count is ~n³/(3p) per device —
the triangular ideal: column chunks left of the panel are skipped via
``lax.cond``, and each chunk updates only the static suffix of local row
blocks that the lower triangle can touch (the block-cyclic local→global
map is monotone, so "rows ≥ chunk start" is a static slice per chunk).

Solves are block forward/backward substitution with psum broadcasts of the
O(b) pivot vectors; the distributed inverse (for NLML gradients) streams
panel rows with all_gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pygps_tpu.ops.trtri import rchol, tril_inverse


def _local_gidx(p, m, axis):
    d = lax.axis_index(axis)
    return d + p * jnp.arange(m)          # global block index of local rows


# ---------------------------------------------------------------------------
# Cholesky factorization
# ---------------------------------------------------------------------------


def _panel_precision(update_dtype, gemm_precision):
    """Panel GEMMs at HIGH (bf16_3x) in the fast modes, HIGHEST otherwise
    — NOT Precision.DEFAULT: on v5e that is a single bf16 pass whose
    ~1e-2 panel error drives the Schur complement indefinite (measured:
    NaN factor at n=2048 — probe_bf16_trajectory bisect)."""
    return (lax.Precision.HIGH
            if (update_dtype is not None
                or gemm_precision == lax.Precision.HIGH)
            else lax.Precision.HIGHEST)


def _factor_panel(A, k, *, p, m, b, n, axis, gidx, d, pan_prec):
    """Factor panel ``k`` of the local slab (diagonal psum-broadcast,
    recursive blocked factor, GEMM panel solve with row-chunk skip,
    write-back, panel-column all_gather).

    Returns ``(A, L_rows, P_cols)``: the slab with the finished panel
    column written, the masked local panel rows (m, b, b), and the
    gathered panel column (n, b) masked to columns > k.  Assumes every
    prior panel's trailing update has already been applied to column k.
    """
    cs = k * b
    owner = k % p
    kloc = k // p
    col_block = jnp.arange(n) // b
    C = lax.dynamic_slice(A, (0, 0, cs), (m, b, b))
    Ck = lax.dynamic_index_in_dim(C, kloc, axis=0, keepdims=False)
    A_kk = lax.psum(jnp.where(d == owner, Ck, jnp.zeros_like(Ck)), axis)
    # recursive blocked factor + GEMM-blocked triangular inverse:
    # XLA's cholesky/TRSM are latency-bound (~1.5 ms each at b≤1024
    # regardless of b, probe_chol_phases2) — rchol/tril_inverse keep
    # the O(b³) work on the MXU so the panel width can grow to
    # 2048-4096 (fatter trailing GEMMs, fewer sequential panels).
    L_kk = rchol(A_kk, base=1024, precision=pan_prec)
    # local panel solve X L_kkᵀ = C as ONE GEMM against the explicit
    # b×b inverse: the m-batched TRSM runs far below MXU rate on v5e;
    # L_kk is a Cholesky factor of a jitter-guarded block, so
    # cond(L_kk) ≈ √cond(A_kk) is benign.
    iL_kk = tril_inverse(L_kk)
    # Only rows with gidx > k survive the masks below, so the panel
    # solve skips row chunks entirely above the panel via lax.cond —
    # on average halves the panel-GEMM FLOPs, which at b ≥ 2048 rival
    # the trailing update in cost.
    nmc = min(4, m) if m % min(4, m) == 0 else 1
    rows_per = m // nmc
    Cf = C.reshape(m * b, b)
    parts = []
    for c in range(nmc):
        hi_gidx = gidx[(c + 1) * rows_per - 1]
        Cc = Cf[c * rows_per * b:(c + 1) * rows_per * b]

        def solve_chunk(ops):
            Cc_, iL_ = ops
            return jnp.matmul(Cc_, iL_.T, precision=pan_prec)

        parts.append(lax.cond(
            hi_gidx > k, solve_chunk,
            lambda ops: jnp.zeros((rows_per * b, b), A.dtype),
            (Cc, iL_kk)))
    L_pan = jnp.concatenate(parts, axis=0).reshape(m, b, b)
    after = (gidx > k)[:, None, None]
    is_k = (gidx == k)[:, None, None]
    P_loc = jnp.where(after, L_pan, 0.0) + jnp.where(is_k, L_kk, 0.0)
    # write the finished panel column (zeros for blocks < k → upper
    # triangle is zeroed exactly once, when its column block finishes)
    A = lax.dynamic_update_slice(A, P_loc, (0, 0, cs))
    # gather the full panel column (n, b)
    P_all = lax.all_gather(P_loc, axis)            # (p, m, b, b)
    P_dense = jnp.swapaxes(P_all, 0, 1).reshape(n, b)
    # column-side mask: only blocks > k receive updates
    P_cols = jnp.where((col_block > k)[:, None], P_dense, 0.0)
    L_rows = jnp.where(after, L_pan, 0.0)          # (m, b, b)
    return A, L_rows, P_cols


def _pchol_local(A, *, p, m, b, n, axis, n_col_chunks=16,
                 update_dtype=None, gemm_precision=None, trailing="xla"):
    """Kernel body: A is the local (m, b, n) slab; returns local L slab.

    The trailing update is split into ``n_col_chunks`` static column
    chunks; a chunk entirely left of the active panel is skipped via
    ``lax.cond`` (real TPU branch), cutting the full-width n³/(2p) update
    cost toward the n³/(3p) ideal while keeping all shapes static.
    """
    gidx = _local_gidx(p, m, axis)
    d = lax.axis_index(axis)
    nb = m * p
    cw, nchunks = _chunk_geometry(n, b, n_col_chunks)
    pan_prec = _panel_precision(update_dtype, gemm_precision)

    def panel(k, A):
        A, L_rows, P_cols = _factor_panel(
            A, k, p=p, m=m, b=b, n=n, axis=axis, gidx=gidx, d=d,
            pan_prec=pan_prec)
        if trailing == "pallas":
            # fused mask+GEMM+subtract with per-tile skip decisions on
            # the scalar core (ops/trailing_pallas.py): no lax.cond
            # branches, no delta materialization, in-place output
            from pygps_tpu.ops.trailing_pallas import trailing_update

            return trailing_update(
                A, L_rows, P_cols, k, d, p,
                tn=min(512, b), use_bf16=update_dtype is not None)
        return _trailing_chunks(
            A, L_rows, P_cols, past=(k + 1) * b, p=p, m=m, b=b,
            cw=cw, nchunks=nchunks, update_dtype=update_dtype,
            gemm_precision=gemm_precision)

    return lax.fori_loop(0, nb, panel, A)


def _chunk_geometry(n, b, n_col_chunks):
    # small problems (tests, dryruns): the FLOP savings of fine chunking
    # are negligible but every chunk adds a cond branch to the traced
    # panel body — compile time scales with it.  Cap the unroll.
    if n < 4096:
        n_col_chunks = min(n_col_chunks, 4)
    # chunk width: multiple of b, dividing n
    cw = max(b, (n // n_col_chunks) // b * b)
    while n % cw != 0:
        cw -= b
    return cw, n // cw


def _trailing_chunks(A, L_rows, P_cols, *, past, p, m, b, cw, nchunks,
                     update_dtype, gemm_precision):
    """Chunked trailing update ``A -= L_rows · P_colsᵀ`` restricted to
    columns past the (traced) global column index ``past``; ``P_cols``
    must already be zero-masked at columns ≤ ``past``.

    Chunk c covers cols [c·cw, (c+1)·cw) and needs work only if it
    extends past ``past``.  Each chunk is ONE (m·b, b)×(b, cw) GEMM (the
    (m,b,b) batch is independent over rows, so it folds into the row
    dimension); XLA keeps the chained in-place .at[].add updates fused
    (measured: a concatenate-then-subtract variant was ~20% slower at
    n=16384 on v5e)."""
    Lr = L_rows
    if update_dtype is not None:
        # mixed precision: low-precision operands, full-precision
        # accumulation (the trailing GEMM is the FLOP hot spot;
        # panels/diagonal stay full precision)
        Lr = Lr.astype(update_dtype)
    Lflat = Lr.reshape(m * b, b)
    for c in range(nchunks):
        start = c * cw
        Pc = P_cols[start:start + cw]              # (cw, b) static slice
        needed = (start + cw) > past
        # triangular row skip: only rows ≥ the chunk's first column
        # ever receive updates from this chunk (lower triangle), and
        # under the block-cyclic layout those form a STATIC suffix of
        # local blocks (local ℓ ↔ global d + p·ℓ is monotone).  l0 is
        # the conservative (min over devices) suffix start — over-
        # includes < 1 block/device, and `start` is a Python int, so
        # the slice is static.  Combined with the column-chunk skip
        # this takes the update FLOPs from n³/(2p) full-width to the
        # ~n³/(3p) triangular ideal with no Pallas and no dynamic
        # shapes.
        l0 = max(0, -(-(start // b - (p - 1)) // p))
        mc = m - l0
        Lc = Lflat[l0 * b:]                        # ((m-l0)·b, b)

        def upd(ops, mc=mc, cw=cw):
            Lf, Pcc = ops
            if update_dtype is not None:
                Pcc = Pcc.astype(update_dtype)
                return jnp.matmul(Lf, Pcc.T,
                                  preferred_element_type=A.dtype
                                  ).astype(A.dtype).reshape(mc, b, cw)
            return jnp.matmul(Lf, Pcc.T,
                              precision=gemm_precision,
                              preferred_element_type=A.dtype
                              ).astype(A.dtype).reshape(mc, b, cw)

        delta = lax.cond(needed, upd,
                         lambda ops: jnp.zeros((mc, b, cw), A.dtype),
                         (Lc, Pc))
        A = A.at[l0:, :, start:start + cw].add(-delta)
    return A


def _pchol_local_lookahead(A, *, p, m, b, n, axis,
                           update_dtype=None, gemm_precision=None):
    """Lookahead variant of ``_pchol_local``: panel k+1 is factored (and
    its column all_gathered) BEFORE panel k's bulk trailing update, so
    the gather's ICI transfer is independent of — and can be overlapped
    with — the panel's dominant trailing GEMMs by XLA's async-collective
    scheduler.  The classic lookahead/compute-ahead schedule of
    ScaLAPACK/SLATE right-looking Cholesky, re-expressed for shard_map.

    Iteration k (carrying panel k's factored column, gather in flight):
      a. apply panel k's update ONLY to panel k+1's column strip;
      b. factor panel k+1 from the updated strip; issue its all_gather;
      c. apply panel k's trailing update to the remaining columns
         (> strip) — one big GEMM chain with NO data dependency on (b)'s
         gather, which therefore rides ICI behind it.

    Numerically identical to the non-lookahead path (same update order
    per column, same precisions); only the schedule changes."""
    gidx = _local_gidx(p, m, axis)
    d = lax.axis_index(axis)
    nb = m * p
    col_block = jnp.arange(n) // b
    # chunk width pinned to the panel width: the bulk pass's past-the-strip
    # threshold then falls exactly on a chunk boundary, so the strip's
    # columns are never recomputed as zeros inside a wider chunk (measured
    # +25% wall at n=32768 b=4096 with cw=4096 straddling chunks)
    cw, nchunks = b, n // b
    pan_prec = _panel_precision(update_dtype, gemm_precision)

    kw = dict(p=p, m=m, b=b, n=n, axis=axis, gidx=gidx, d=d,
              pan_prec=pan_prec)
    A, L_rows, P_cols = _factor_panel(A, 0, **kw)

    def step(k, carry):
        A, L_rows, P_cols = carry
        ns = (k + 1) * b
        # (a) strip update: the next panel's column receives panel k's
        # trailing update first, at the same precision as the bulk path.
        # Row chunks entirely above the next panel skip via lax.cond
        # (same static-suffix trick as the panel solve).
        Pc_strip = lax.dynamic_slice(P_cols, (ns, 0), (b, b))
        strip = lax.dynamic_slice(A, (0, 0, ns), (m, b, b))
        Lr = L_rows
        Pc_s = Pc_strip
        if update_dtype is not None:
            Lr = Lr.astype(update_dtype)
            Pc_s = Pc_strip.astype(update_dtype)
        nmc = min(4, m) if m % min(4, m) == 0 else 1
        rows_per = m // nmc
        Lf = Lr.reshape(m * b, b)
        parts = []
        for c in range(nmc):
            hi_gidx = gidx[(c + 1) * rows_per - 1]
            Lc = Lf[c * rows_per * b:(c + 1) * rows_per * b]

            def strip_chunk(ops):
                Lc_, P_ = ops
                return jnp.matmul(
                    Lc_, P_.T,
                    precision=(None if update_dtype is not None
                               else gemm_precision),
                    preferred_element_type=A.dtype).astype(A.dtype)

            parts.append(lax.cond(
                hi_gidx > k, strip_chunk,
                lambda ops: jnp.zeros((rows_per * b, b), A.dtype),
                (Lc, Pc_s)))
        delta = jnp.concatenate(parts, axis=0)
        strip = strip - delta.reshape(m, b, b)
        A = lax.dynamic_update_slice(A, strip, (0, 0, ns))
        # (b) factor panel k+1 — its all_gather result is consumed only
        # by the NEXT iteration, so the collective overlaps (c)
        A, L_rows_n, P_cols_n = _factor_panel(A, k + 1, **kw)
        # (c) bulk trailing update of panel k: columns past the strip
        P_rest = jnp.where((col_block > k + 1)[:, None], P_cols, 0.0)
        A = _trailing_chunks(
            A, L_rows, P_rest, past=ns + b, p=p, m=m, b=b, cw=cw,
            nchunks=nchunks, update_dtype=update_dtype,
            gemm_precision=gemm_precision)
        return (A, L_rows_n, P_cols_n)

    A, _, _ = lax.fori_loop(0, nb - 1, step, (A, L_rows, P_cols))
    return A


def pcholesky(A_bc: jax.Array, mesh: Mesh, axis: str = "shard",
              update_dtype=None, gemm_precision=None,
              n_col_chunks: int | None = None,
              trailing: str = "xla",
              lookahead: bool = False) -> jax.Array:
    """Factor a bc-layout SPD matrix: returns L (bc layout, lower).

    ``update_dtype=jnp.bfloat16`` runs the trailing-update GEMMs in bf16
    with f32 accumulation (~4× MXU rate on v5e); panels and diagonal
    factorizations stay full precision.  Accuracy cost is characterized in
    tests/test_parallel.py::test_pcholesky_bf16_updates — use only where
    downstream tolerances allow (e.g. NLML for MCMC, not tight solves).

    ``n_col_chunks`` trades trailing-update FLOP savings (column chunks
    left of the panel skip via lax.cond, n³/(2p) → ~n³/(3p)) against TPU
    branch overhead — each cond breaks the command queue.  Defaults to
    16.  Not settable with ``lookahead=True``, whose schedule pins the
    chunk width to the panel width b (measured +25% wall at n=32768
    with wider chunks straddling the strip boundary) — passing it there
    raises.

    ``trailing="pallas"`` routes the trailing update through the fused
    masked Pallas kernel (ops/trailing_pallas.py) — per-tile skips, no
    cond branches, subtract fused into the GEMM epilogue.  TPU only
    (b and n must be multiples of 512).

    ``lookahead=True`` uses the compute-ahead schedule: the next panel
    is factored and its column's all_gather issued BEFORE the current
    panel's bulk trailing update, so the ICI transfer overlaps the
    dominant GEMMs (same numerics, different schedule — see
    ``_pchol_local_lookahead``)."""
    p, m, b, n = A_bc.shape
    if lookahead and trailing != "xla":
        raise ValueError("lookahead=True supports only the XLA trailing "
                         "path (trailing='xla'); the Pallas trailing "
                         "kernel has no lookahead variant")
    if lookahead and n_col_chunks is not None:
        raise ValueError("n_col_chunks is not settable with "
                         "lookahead=True: the lookahead schedule pins "
                         "the chunk width to the panel width b")
    if n_col_chunks is None:
        n_col_chunks = 16

    def body(A):
        if lookahead:
            return _pchol_local_lookahead(
                A[0], p=p, m=m, b=b, n=n, axis=axis,
                update_dtype=update_dtype,
                gemm_precision=gemm_precision)[None]
        return _pchol_local(A[0], p=p, m=m, b=b, n=n, axis=axis,
                            n_col_chunks=n_col_chunks,
                            update_dtype=update_dtype,
                            gemm_precision=gemm_precision,
                            trailing=trailing)[None]

    f = shard_map(body, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
                  check_vma=False)
    return f(A_bc)


# ---------------------------------------------------------------------------
# Autodiff-safe factorization (O(n²)-memory reverse pass)
# ---------------------------------------------------------------------------


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _pchol_p1_ad(A_bc, mesh, axis, kw):
    return pcholesky(A_bc, mesh, axis=axis, **dict(kw))


def _pchol_p1_ad_fwd(A_bc, mesh, axis, kw):
    L_bc = pcholesky(A_bc, mesh, axis=axis, **dict(kw))
    return L_bc, L_bc


def _pchol_p1_ad_bwd(mesh, axis, kw, L_bc, Lbar_bc):
    """Standard Cholesky reverse mode (Murray 2016; jax.linalg's
    convention — the input is treated as symmetric, so the returned
    cotangent is the symmetrized

        Ā = sym(L⁻ᵀ Φ(Lᵀ L̄) L⁻¹),   Φ = tril with the diagonal halved,

    which leaves hyperparameter gradients identical since every upstream
    K/B construction in this repo is entrywise symmetric), computed
    dense at GEMM rate via ops/trtri's blocked triangular
    inverse — O(n²) live memory, vs the O(n²·n/b) the plain blocked
    factorization's while-loop reverse makes XLA save (measured: 18.3 GB
    at n=16384, b=2048 — OOMs a 16 GB chip; see MEASUREMENTS round-5
    distributed-classification section)."""
    from pygps_tpu.parallel.mesh import from_block_cyclic, to_block_cyclic

    p, m, b, n = L_bc.shape
    kwd = dict(kw)
    prec = (lax.Precision.HIGH
            if (kwd.get("update_dtype") is not None
                or kwd.get("gemm_precision") == lax.Precision.HIGH)
            else lax.Precision.HIGHEST)
    L = jnp.tril(from_block_cyclic(L_bc))
    # Upper-triangle outputs are structural zeros: their cotangents must
    # not contribute.
    Lbar = jnp.tril(from_block_cyclic(Lbar_bc))
    S = jnp.tril(jnp.matmul(L.T, Lbar, precision=prec))
    S = S - 0.5 * jnp.diag(jnp.diagonal(S))
    Winv = tril_inverse(L, precision=prec)
    Abar = jnp.matmul(Winv.T, jnp.matmul(S, Winv, precision=prec),
                      precision=prec)
    Abar = 0.5 * (Abar + Abar.T)
    return (to_block_cyclic(Abar, b, p),)


_pchol_p1_ad.defvjp(_pchol_p1_ad_fwd, _pchol_p1_ad_bwd)


def pcholesky_ad(A_bc: jax.Array, mesh: Mesh, axis: str = "shard",
                 **kw) -> jax.Array:
    """``pcholesky`` that is safe to differentiate THROUGH at scale.

    Plain ``pcholesky`` under reverse-mode AD makes XLA checkpoint every
    panel iteration's trailing matrix (O(n³/b) reverse memory); the
    distributed classification engines (parallel/classify.py — Laplace's
    ``logdetB``, EP's whole energy) differentiate through the factor, and
    at n=16384/b=2048 that compiled to an 18.3 GB program on a 15.75 GB
    chip.  At p=1 (the single-chip engine fast path, mirroring
    parallel/pinverse.py's) this routes the backward through the analytic
    Cholesky VJP instead.  At p>1 the plain path is kept: per-device
    shards there are small in every configuration this repo runs
    (virtual-mesh tests, dryrun), and the bc-layout TRSM backward is the
    documented extension if a real pod ever needs it.
    """
    if mesh.devices.size > 1:
        return pcholesky(A_bc, mesh, axis=axis, **kw)
    return _pchol_p1_ad(A_bc, mesh, axis, tuple(sorted(kw.items())))


# ---------------------------------------------------------------------------
# Triangular solves (vector RHS)
# ---------------------------------------------------------------------------


def _solve_fwd_local(L, r, *, p, m, b, n, axis):
    """z = L⁻¹ r by block forward substitution; returns replicated z."""
    d = lax.axis_index(axis)
    nb = m * p

    def step(k, z):
        owner = k % p
        kloc = k // p
        cs = k * b
        row = lax.dynamic_index_in_dim(L, kloc, axis=0, keepdims=False)  # (b, n)
        s = row @ z                        # Σ_{j<k} L_kj z_j (z zero at ≥ kb)
        L_kk = lax.dynamic_slice(row, (0, cs), (b, b))
        # Non-owners sliced an above-diagonal (all-zero) block: its solve
        # result is masked out below, but reverse-mode still runs the
        # solve's VJP against the zero diagonal (0/0 → NaN gradients,
        # found by EP-over-mesh grad parity).  Substitute I off-owner so
        # only the owner's lane carries value AND gradient.
        L_kk = jnp.where(d == owner, L_kk, jnp.eye(b, dtype=L.dtype))
        r_k = lax.dynamic_slice(r, (cs,), (b,))
        z_k = lax.linalg.triangular_solve(
            L_kk, (r_k - s)[:, None], left_side=True, lower=True)[:, 0]
        z_k = lax.psum(jnp.where(d == owner, z_k, jnp.zeros_like(z_k)), axis)
        return lax.dynamic_update_slice(z, z_k, (cs,))

    return lax.fori_loop(0, nb, step, jnp.zeros_like(r))


def _solve_bwd_local(L, z, *, p, m, b, n, axis):
    """x = L⁻ᵀ z by block backward substitution; returns replicated x."""
    d = lax.axis_index(axis)
    gidx = _local_gidx(p, m, axis)
    nb = m * p

    def step(i, x):
        k = nb - 1 - i
        owner = k % p
        kloc = k // p
        cs = k * b
        # c = Σ_{j>k} L_jkᵀ x_j : local partials over my block rows
        C = lax.dynamic_slice(L, (0, 0, cs), (m, b, b))     # L_jk locals
        # each local block's x segment: (m, b)
        xseg = jax.vmap(lambda j: lax.dynamic_slice(x, (j * b,), (b,)))(gidx)
        mask = (gidx > k)[:, None]
        c_loc = jnp.einsum("mbc,mb->c", C, jnp.where(mask, xseg, 0.0))
        c = lax.psum(c_loc, axis)
        row = lax.dynamic_index_in_dim(L, kloc, axis=0, keepdims=False)
        L_kk = lax.dynamic_slice(row, (0, cs), (b, b))
        # Same off-owner zero-diagonal guard as the forward sweep (see
        # _solve_fwd_local): masked-out lanes must not 0/0 in the VJP.
        L_kk = jnp.where(d == owner, L_kk, jnp.eye(b, dtype=L.dtype))
        z_k = lax.dynamic_slice(z, (cs,), (b,))
        x_k = lax.linalg.triangular_solve(
            L_kk, (z_k - c)[:, None], left_side=True, lower=True,
            transpose_a=True)[:, 0]
        x_k = lax.psum(jnp.where(d == owner, x_k, jnp.zeros_like(x_k)), axis)
        return lax.dynamic_update_slice(x, x_k, (cs,))

    return lax.fori_loop(0, nb, step, jnp.zeros_like(z))


def psolve_chol(L_bc: jax.Array, r: jax.Array, mesh: Mesh,
                axis: str = "shard") -> jax.Array:
    """(L Lᵀ)⁻¹ r given the bc-layout factor; r and result replicated."""
    p, m, b, n = L_bc.shape

    def body(L, r_):
        L = L[0]
        z = _solve_fwd_local(L, r_, p=p, m=m, b=b, n=n, axis=axis)
        return _solve_bwd_local(L, z, p=p, m=m, b=b, n=n, axis=axis)

    f = shard_map(body, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
                  check_vma=False)
    return f(L_bc, r)


def plogdet_chol(L_bc: jax.Array, mesh: Mesh, axis: str = "shard") -> jax.Array:
    """log det(A) = 2 Σ log diag L from the bc-layout factor (replicated)."""
    p, m, b, n = L_bc.shape

    def body(L):
        L = L[0]
        gidx = _local_gidx(p, m, axis)

        def diag_of(j, acc):
            blk = lax.dynamic_index_in_dim(L, j, axis=0, keepdims=False)
            Dk = lax.dynamic_slice(blk, (0, gidx[j] * b), (b, b))
            return acc + jnp.sum(jnp.log(jnp.diag(Dk)))

        acc = lax.fori_loop(0, m, diag_of, jnp.asarray(0.0, L.dtype))
        return lax.psum(2.0 * acc, axis)[None]

    f = shard_map(body, mesh=mesh, in_specs=(P(axis),), out_specs=P(),
                  check_vma=False)
    return f(L_bc)[0]


def _solve_fwd_multi_local(L, R, *, p, m, b, n, axis):
    """Z = L⁻¹ R for matrix RHS R (n, k); returns replicated Z."""
    d = lax.axis_index(axis)
    nb = m * p

    def step(kk, Z):
        owner = kk % p
        kloc = kk // p
        cs = kk * b
        row = lax.dynamic_index_in_dim(L, kloc, axis=0, keepdims=False)
        S = row @ Z                          # (b, k)
        L_kk = lax.dynamic_slice(row, (cs * 0, cs), (b, b))
        R_k = lax.dynamic_slice(R, (cs, cs * 0), (b, R.shape[1]))
        Z_k = lax.linalg.triangular_solve(
            L_kk, R_k - S, left_side=True, lower=True)
        Z_k = lax.psum(jnp.where(d == owner, Z_k, jnp.zeros_like(Z_k)), axis)
        return lax.dynamic_update_slice(Z, Z_k, (cs, cs * 0))

    return lax.fori_loop(0, nb, step, jnp.zeros_like(R))


def psolve_tril(L_bc: jax.Array, R: jax.Array, mesh: Mesh,
                axis: str = "shard") -> jax.Array:
    """L⁻¹ R (forward substitution) for the bc-layout factor; R replicated
    (n, k).  Used by distributed prediction: fs2 = kss − Σ(L⁻¹Ks)²."""
    p, m, b, n = L_bc.shape

    def body(L, R_):
        return _solve_fwd_multi_local(L[0], R_, p=p, m=m, b=b, n=n,
                                      axis=axis)

    f = shard_map(body, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
                  check_vma=False)
    return f(L_bc, R)
