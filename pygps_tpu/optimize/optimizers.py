"""Optimizer façade: flat-hyp optimizers with random restarts.

Counterpart of pyGPs ``Core/opt.py`` (classes Minimize, SCG, CG, BFGS and
the restart loop).  Additions beyond the reference: ``Adam`` and ``LBFGS``
(optax, fully jitted update loop) for large-scale problems, and the NUTS
sampler lives separately in inference/nuts.py.

The objective closure comes from objective.py (jitted NLML value+grad over
the raveled (mean, kernel, lik) pytree, which reproduces the reference's
flat hyp ordering).  As in the reference, exceptions/NaNs during a restart
cause that restart to be skipped (opt.py:~150, verify-tagged).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pygps_tpu.optimize import minimize as _minimize
from pygps_tpu.optimize import scg as _scg


class Optimizer:
    """Base optimizer. ``model`` is consulted lazily so the same optimizer
    object survives ``setPrior``/``setData`` calls (as in the reference)."""

    def __init__(self, model=None, searchConfig=None):
        self.model = model
        self.searchConfig = searchConfig
        self.trailsNum = 3   # reference attribute name (number of trials)

    # -- single run --------------------------------------------------------
    def _run(self, f, theta0, num_iters):
        raise NotImplementedError

    # -- public: optimize with restarts ------------------------------------
    def findMin(self, x, y, numIters=100):
        """Returns (optimal_hyp_vector, best_nlZ). Mirrors
        opt.Optimizer.findMin(x, y, numIters)."""
        model = self.model
        from pygps_tpu.optimize.objective import make_engine_objective

        f, theta0, unravel = make_engine_objective(
            model.inffunc, model.meanfunc, model.covfunc,
            model.likfunc, x, y,
        )
        best_theta, best_val = self._safe_run(f, theta0, numIters)
        best_val = self._comparable_val(f, best_theta, best_val)

        cfg = self.searchConfig
        if cfg is not None and getattr(cfg, "num_restarts", 0):
            rng = np.random.default_rng(0)
            ranges = (list(cfg.mean_range) + list(cfg.cov_range)
                      + list(cfg.lik_range))
            for _ in range(int(cfg.num_restarts) - 1):
                if len(ranges) == len(theta0):
                    t0 = np.array([rng.uniform(lo, hi) for lo, hi in ranges])
                else:  # fall back to perturbing the initial point
                    t0 = theta0 + rng.normal(size=theta0.shape)
                th, v = self._safe_run(f, t0, numIters)
                v = self._comparable_val(f, th, v)
                if v < best_val:
                    best_theta, best_val = th, v
                if (cfg.min_threshold is not None
                        and best_val < cfg.min_threshold):
                    break
        return best_theta, best_val

    @staticmethod
    def _comparable_val(f, theta, val):
        """For stateful (warm-started EP) objectives, restart candidates are
        ranked by a cold re-evaluation at the returned point: warm energies
        are trajectory-dependent and not comparable across restarts (see
        objective.make_engine_objective.f_cold)."""
        cold = getattr(f, "cold", None)
        if cold is None or not np.isfinite(val):
            return val
        try:
            v = cold(theta)
            return v if np.isfinite(v) else np.inf
        except (FloatingPointError, np.linalg.LinAlgError, ValueError):
            return np.inf

    def _safe_run(self, f, theta0, num_iters):
        try:
            theta, history, _ = self._run(f, theta0, num_iters)
            val = history[-1] if history else np.inf
            if not np.isfinite(val):
                return theta0, np.inf
            return theta, float(val)
        except (FloatingPointError, np.linalg.LinAlgError, ValueError):
            return theta0, np.inf


class Minimize(Optimizer):
    """Rasmussen-style CG (reference opt.Minimize)."""

    def _run(self, f, theta0, num_iters):
        return _minimize.run(f, theta0, length=-int(max(num_iters, 1) * 3))


class SCG(Optimizer):
    """Scaled conjugate gradients (reference opt.SCG)."""

    def _run(self, f, theta0, num_iters):
        return _scg.run(f, theta0, niters=int(num_iters))


class _Scipy(Optimizer):
    method = "CG"

    def _run(self, f, theta0, num_iters):
        from scipy import optimize as sopt

        vals = []

        def fun(t):
            v, g = f(t)
            if np.isfinite(v):
                vals.append(float(v))
            return (float(v) if np.isfinite(v) else 1e25,
                    np.where(np.isfinite(g), g, 0.0))

        res = sopt.minimize(fun, theta0, jac=True, method=self.method,
                            options={"maxiter": int(num_iters)})
        final = float(res.fun)
        return res.x, (vals if vals else [final]) + [final], res.nit


class CG(_Scipy):
    """scipy conjugate gradients (reference opt.CG)."""
    method = "CG"


class BFGS(_Scipy):
    """scipy BFGS (reference opt.BFGS)."""
    method = "BFGS"


class _Optax(Optimizer):
    """Fully jitted optax loop (TPU-resident; no host round-trips per step)."""

    needs_value = False

    def make_tx(self):
        raise NotImplementedError

    def _run(self, f, theta0, num_iters):
        # Rebuild the loss from the model so the whole loop jits on-device.
        import jax.flatten_util as fu

        model = self.model
        theta0_j = jnp.asarray(theta0)
        mean, kernel, lik = model.meanfunc, model.covfunc, model.likfunc
        _, unravel = fu.ravel_pytree((mean, kernel, lik))
        engine = model.inffunc
        has_aux = getattr(engine, "has_aux", False)
        x, y = model.x, model.y

        from pygps_tpu.optimize.objective import init_aux_any

        if has_aux:
            aux_fn = engine.nlml_aux_fn()

            def loss_aux(t, aux):
                m, k, l = unravel(t)
                return aux_fn(m, k, l, x, y, *aux)

            loss = lambda t: loss_aux(
                t, init_aux_any(engine, mean, kernel, lik, x, y))[0]
        else:
            nlml_fn = model._inference_nlml()
            extra = model._inference_extra()

            def loss(t):
                m, k, l = unravel(t)
                return nlml_fn(m, k, l, x, y, **extra)

        tx = self.make_tx()
        needs_value = self.needs_value

        def step(carry, _):
            t, opt_state, aux = carry
            if has_aux:
                (v, aux), g = jax.value_and_grad(
                    loss_aux, has_aux=True)(t, aux)
            else:
                v, g = jax.value_and_grad(loss)(t)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            if needs_value:
                updates, opt_state = tx.update(
                    g, opt_state, t, value=v, grad=g, value_fn=loss)
            else:
                updates, opt_state = tx.update(g, opt_state, t)
            t_new = optax.apply_updates(t, updates)
            # reject non-finite steps (keeps parity with restart skipping)
            t_new = jnp.where(jnp.isfinite(t_new), t_new, t)
            return (t_new, opt_state, aux), v

        aux0 = init_aux_any(engine, mean, kernel, lik, x, y) \
            if has_aux else ()

        @jax.jit
        def run_loop(t0, aux0):
            return jax.lax.scan(step, (t0, tx.init(t0), aux0), None,
                                length=int(num_iters))

        (theta, _, _), vals = run_loop(theta0_j, aux0)
        vals = np.asarray(vals)
        # append the final value for "best nlZ at returned point" semantics
        final = float(f(np.asarray(theta))[0])
        return np.asarray(theta), [float(v) for v in vals] + [final], int(num_iters)


class Adam(_Optax):
    def __init__(self, model=None, searchConfig=None, lr=0.05):
        super().__init__(model, searchConfig)
        self.lr = lr

    def make_tx(self):
        return optax.adam(self.lr)


class LBFGS(_Optax):
    needs_value = True

    def make_tx(self):
        return optax.lbfgs()


__all__ = ["Optimizer", "Minimize", "SCG", "CG", "BFGS", "Adam", "LBFGS"]
