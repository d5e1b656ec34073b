"""Chain-sharded NUTS/HMC over the device mesh.

The north-star "data parallel" analog (SURVEY.md §2.2): a chain population
(e.g. 256) is vmapped within each device and sharded across the mesh axis;
dual-averaging step-size adaptation consumes the psum-mean acceptance
statistic across the WHOLE population, so every device adapts identically
and chains stay exchangeable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygps_tpu.inference import hmc as _hmc
from pygps_tpu.inference import nuts as _nuts


def sample_nuts_sharded(logp_fn, q0, key, mesh: Mesh, axis: str = "shard",
                        sampler: str = "nuts", **kwargs):
    """Run NUTS (or HMC) with chains sharded over ``mesh``.

    q0: (C, dim) with C divisible by the mesh size.  Returns
    (samples (T, C, dim) sharded on the chain axis, stats).
    """
    p = mesh.devices.size
    C, dim = q0.shape
    assert C % p == 0, "chains must divide the mesh"
    fn = _nuts.sample_nuts if sampler == "nuts" else _hmc.sample_hmc

    def body(q0_loc, key_rep):
        # identical key on every device for lockstep adaptation randomness;
        # per-chain keys are split from it using the *global* chain index.
        d = lax.axis_index(axis)
        key_loc = jax.random.fold_in(key_rep, d)

        def ccm(x):
            return lax.pmean(jnp.mean(x), axis)

        samples, stats = fn(logp_fn, q0_loc, key_loc,
                            cross_chain_mean=ccm, **kwargs)
        return (samples, stats["accept_prob"], stats["step_size"],
                stats["inv_mass"], stats["q_final"])

    f = shard_map(body, mesh=mesh, in_specs=(P(axis), P()),
                  out_specs=(P(None, axis), P(None, axis), P(), P(),
                             P(axis)),
                  check_vma=False)
    q0s = jax.device_put(q0, NamedSharding(mesh, P(axis)))
    samples, accept, eps, inv_mass, q_final = f(q0s, key)
    return samples, {"accept_prob": accept, "step_size": eps,
                     "inv_mass": inv_mass, "q_final": q_final}
