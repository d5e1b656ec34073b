"""NLML objective construction: flat hyp vector ↔ functor pytrees.

TPU-native counterpart of pyGPs ``opt.py``'s pack/unpack helpers and its
``nlml_with_grad`` closure (opt.py:~100): here the flattening is
``jax.flatten_util.ravel_pytree`` over the (mean, kernel, lik) triple —
which reproduces the reference's depth-first hyp ordering — and the
gradient is autodiff instead of assembled ``dnlZ`` structs.  The closure is
jitted once; host-side optimizers (Rasmussen CG, SCG, scipy) call it with
numpy vectors.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def make_objective(inference_fn, mean, kernel, lik, x, y, extra=None):
    """Build ``(f, theta0, unravel)`` where ``f(theta) -> (nlZ, grad)`` is a
    jitted value-and-grad of the NLML at flat hyp vector ``theta``.

    ``inference_fn(mean, kernel, lik, x, y, **extra) -> nlZ`` must be a pure
    differentiable function (e.g. inference.exact.nlml).
    """
    extra = extra or {}
    theta0, unravel = ravel_pytree((mean, kernel, lik))

    def loss(theta):
        m, k, l = unravel(theta)
        return inference_fn(m, k, l, x, y, **extra)

    vg = jax.jit(jax.value_and_grad(loss))

    def f(theta):
        v, g = vg(jnp.asarray(theta, dtype=theta0.dtype))
        return np.asarray(v), np.asarray(g)

    return f, np.asarray(theta0), unravel


def init_aux_any(engine, mean, kernel, lik, x, y, cold=False):
    """Engine aux state; prefers the *_full hooks (engines whose aux shape
    depends on more than y, e.g. SVGP's inducing-sized variational state)."""
    if cold:
        if hasattr(engine, "cold_aux_full"):
            return tuple(engine.cold_aux_full(mean, kernel, lik, x, y))
        return tuple(engine.cold_aux(y))
    if hasattr(engine, "init_aux_full"):
        return tuple(engine.init_aux_full(mean, kernel, lik, x, y))
    return tuple(engine.init_aux(y))


def make_engine_objective(engine, mean, kernel, lik, x, y):
    """Objective from an engine object; when the engine is stateful
    (EP sites, ``engine.has_aux``) the aux state is threaded through
    successive calls — functional equivalent of the reference's
    ``last_ttau/last_tnu`` warm-start cache on ``inf.EP``."""
    theta0, unravel = ravel_pytree((mean, kernel, lik))

    if not getattr(engine, "has_aux", False):
        return make_objective(engine.nlml_fn(), mean, kernel, lik, x, y,
                              extra=engine.extra())

    aux_fn = engine.nlml_aux_fn()
    state = {"aux": init_aux_any(engine, mean, kernel, lik, x, y)}

    def loss(theta, *aux):
        m, k, l = unravel(theta)
        return aux_fn(m, k, l, x, y, *aux)

    vg = jax.jit(jax.value_and_grad(loss, has_aux=True))

    def f(theta):
        (v, aux), g = vg(jnp.asarray(theta, dtype=theta0.dtype),
                         *state["aux"])
        if np.all(np.isfinite(np.asarray(v))):
            state["aux"] = aux if isinstance(aux, tuple) else (aux,)
            engine.update_state(state["aux"])
        return np.asarray(v), np.asarray(g)

    def f_cold(theta):
        """NLML at ``theta`` from a fresh aux state (cold EP sites).

        Warm-started energies are trajectory-dependent: two restarts
        reaching different basins carry different site states, so their
        final values are not comparable, and a transiently non-converged
        sweep can report a bogus-low energy that a later cold evaluation
        (``GP.getPosterior``) cannot reproduce.  The restart loop compares
        candidates with this instead (does not touch the warm state).
        Uses ``engine.cold_aux`` — never the warm cache that init_aux may
        serve — so EP restarts are compared from genuinely cold sites."""
        (v, _), _ = vg(jnp.asarray(theta, dtype=theta0.dtype),
                       *init_aux_any(engine, mean, kernel, lik, x, y,
                                     cold=True))
        return float(np.asarray(v))

    f.cold = f_cold
    return f, np.asarray(theta0), unravel
