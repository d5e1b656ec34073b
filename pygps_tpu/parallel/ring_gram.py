"""Distributed Gram-matrix construction.

The reference evaluates kernels densely on one host (cov.py getCovMatrix);
at the n=100k north star a single f32 Gram is ~40 GB — it must be born
sharded (SURVEY.md §5.7).  Two constructions:

* :func:`gram_bc` — the workhorse: training inputs x are small (n·d) and
  replicated; each device computes only its block-cyclic block rows
  K(x_rows, x) inside shard_map.  Output feeds pcholesky directly.
* :func:`ring_gram` — the sequence/context-parallel analog (structurally
  identical to ring attention): x is row-sharded, shards circulate the ring
  via ``ppermute``, each device computes one (n/p × n/p) tile per step.
  Demonstrates the comm pattern for the regime where x itself is too large
  to replicate; output is contiguous-row sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P


# Local Gram slabs above this element count are built (and, crucially,
# backpropagated) one block-row chunk at a time under jax.checkpoint: the
# kernel VJP otherwise rematerializes 2-3 slab-sized intermediates (the
# pairwise-distance matrix, the exp'd Gram, the cotangent product) at
# once — the 16.26 GiB OOM at n=32768 p=1 (SCALING.md §A).  Below the
# threshold the one-shot path is kept (fewer dispatches, same math).
_CHUNK_SLAB_ELEMS = 3 * 10**8


def gram_bc(kernel, x: jax.Array, mesh: Mesh, b: int,
            axis: str = "shard", noise_diag=None) -> jax.Array:
    """Block-cyclic sharded train Gram (p, m, b, n); optionally adds
    ``noise_diag`` (scalar) to the diagonal.  Differentiable in the kernel
    pytree (each device backprops its local rows)."""
    p = mesh.devices.size
    n, dd = x.shape
    assert n % (b * p) == 0, "pad inputs to a multiple of block*devices"
    m = n // (b * p)
    chunk_rows = m >= 2 and (m * b * n) > _CHUNK_SLAB_ELEMS

    def body(kern, xloc):
        d = lax.axis_index(axis)
        gidx = d + p * jnp.arange(m)
        rows = jax.vmap(
            lambda g: lax.dynamic_slice(xloc, (g * b, 0), (b, dd))
        )(gidx)                                   # (m, b, d)
        if chunk_rows:
            Kr = lax.map(
                jax.checkpoint(lambda rb: kern._cross(rb, xloc)),
                rows)                              # (m, b, n)
        else:
            Kr = kern._cross(rows.reshape(m * b, dd), xloc).reshape(m, b, n)
        if noise_diag is not None:
            col = jax.vmap(lambda g: g * b + jnp.arange(b))(gidx)  # (m, b)
            eye_rows = (col[:, :, None] ==
                        jnp.arange(n)[None, None, :]).astype(Kr.dtype)
            Kr = Kr + noise_diag * eye_rows
        return Kr[None]

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P()), out_specs=P(axis), check_vma=False)
    return f(kernel, x)


def ring_gram(kernel, x_sharded: jax.Array, mesh: Mesh,
              axis: str = "shard") -> jax.Array:
    """Ring construction: x (n, d) contiguously row-sharded over the mesh;
    returns K row-sharded (n, n).  p−1 ``ppermute`` steps; each step
    overlaps a local (n/p × n/p) kernel tile with the neighbour transfer —
    the ring-attention communication pattern on ICI."""
    p = mesh.devices.size
    n, dd = x_sharded.shape
    assert n % p == 0
    ln = n // p

    def body(xloc):
        xloc = xloc.reshape(ln, dd)
        d = lax.axis_index(axis)

        def step(i, carry):
            xrem, K = carry
            src = (d - i) % p                  # whose shard we hold now
            tile = kernel._cross(xloc, xrem)   # (ln, ln)
            K = lax.dynamic_update_slice(K, tile, (src * 0, src * ln))
            xrem = lax.ppermute(
                xrem, axis, perm=[(j, (j + 1) % p) for j in range(p)])
            return xrem, K

        K0 = jnp.zeros((ln, n), dtype=xloc.dtype)
        _, K = lax.fori_loop(0, p, step, (xloc, K0))
        return K

    f = shard_map(body, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
                  check_vma=False)
    return f(x_sharded)
