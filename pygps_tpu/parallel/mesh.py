"""Device mesh and block-cyclic layout utilities.

The reference is single-process (SURVEY.md §2.2: no parallelism anywhere);
this module is the TPU-native communication backend it lacks: a named
`jax.sharding.Mesh` plus the 1-D block-cyclic row layout used by the
distributed Gram construction, Cholesky and triangular solves
(parallel/pcholesky.py), and chain sharding for NUTS.

Layout convention ("bc layout"): an (n, n) matrix with n = nb·b block rows
is stored as a (p, m, b, n) array, p = mesh size, m = nb/p local block
rows, where global block g lives at [g % p, g // p].  Block-cyclic
assignment keeps the right-looking Cholesky wavefront load-balanced (later
panels touch every device).  The leading axis is sharded over the mesh; a
reshape/transpose pair converts to/from the dense row-major matrix, so
conversion is layout-only (no gathers).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shard",
              devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` available devices.

    Raises when fewer than ``n_devices`` devices exist — a silently
    truncated mesh would make "distributed" tests/dryruns validate p=1."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devices)} device(s) "
                f"visible ({devices[:2]}…). For a virtual mesh set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}"
                " and pin jax.config.update('jax_platforms', 'cpu') before "
                "any backend use.")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host bring-up (SURVEY.md §5.8): wraps
    ``jax.distributed.initialize`` — call once per host before any other
    jax use on a pod slice; no-op when the args are absent AND the
    environment provides no coordination config."""
    import os

    if (coordinator_address is None and num_processes is None
            and "COORDINATOR_ADDRESS" not in os.environ
            and "MEGASCALE_COORDINATOR_ADDRESS" not in os.environ):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def make_host_chip_mesh(axis_host: str = "host", axis_chip: str = "chip"):
    """2-D (host, chip) mesh: DCN across hosts, ICI within a slice — the
    layout the distributed Cholesky's collectives should ride (psum along
    ``chip`` stays on ICI).  Falls back to (1, n) on a single host."""
    devices = jax.devices()
    n_hosts = max(1, jax.process_count())
    per_host = len(devices) // n_hosts
    arr = np.array(devices).reshape(n_hosts, per_host)
    return Mesh(arr, axis_names=(axis_host, axis_chip))


def pad_to_blocks(n: int, b: int, p: int) -> int:
    """Smallest n' ≥ n with n' divisible by b·p (block + device granule)."""
    g = b * p
    return ((n + g - 1) // g) * g


def to_block_cyclic(A: jax.Array, b: int, p: int) -> jax.Array:
    """Dense (n, n) → bc layout (p, m, b, n). n must divide by b·p."""
    n = A.shape[0]
    nb = n // b
    m = nb // p
    # (nb, b, n) -> global block g at (g % p, g // p)
    Ab = A.reshape(nb, b, n)          # block rows in order
    Ab = Ab.reshape(m, p, b, n)       # g = j*p + d  ->  [j, d]
    return jnp.swapaxes(Ab, 0, 1)     # (p, m, b, n): [d, j]


def from_block_cyclic(Abc: jax.Array) -> jax.Array:
    """bc layout (p, m, b, n) → dense (n, n)."""
    p, m, b, n = Abc.shape
    Ab = jnp.swapaxes(Abc, 0, 1)      # (m, p, b, n)
    return Ab.reshape(m * p * b, n)


def global_block_index(p: int, m: int) -> np.ndarray:
    """(p, m) array of global block indices: g[d, j] = j*p + d."""
    return (np.arange(m)[None, :] * p + np.arange(p)[:, None])


def bc_sharding(mesh: Mesh, axis: str = "shard") -> NamedSharding:
    """Sharding for bc-layout arrays: leading device axis sharded."""
    return NamedSharding(mesh, P(axis))


def shard_bc(Abc: jax.Array, mesh: Mesh, axis: str = "shard") -> jax.Array:
    return jax.device_put(Abc, bc_sharding(mesh, axis))
