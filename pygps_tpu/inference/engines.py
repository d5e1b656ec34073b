"""Inference engine objects — the pluggable layer models dispatch on.

Counterpart of pyGPs ``inf.py``'s engine classes (Exact, Laplace, EP,
FITC_Exact, FITC_Laplace, FITC_EP) and its ``postStruct``/``dnlZStruct``
contracts.  Each engine wraps the pure jit-compatible functions in its
module and exposes:

* ``evaluate_fn``  — (mean, kernel, lik, x, y, **extra) → (Posterior, nlZ)
* ``nlml_fn``      — differentiable NLML for optimizers/samplers
* ``evaluate(...)``— pyGPs-compatible: returns (post, nlZ, dnlZ) with dnlZ
  a :class:`DnlZ` of flat per-block gradient lists (autodiff).

EP statefulness: the reference caches ``last_ttau/last_tnu`` on the engine
instance to warm-start across ``evaluate`` calls during optimization
(inf.py:~500, SURVEY.md §2.4).  The EP engines here reproduce that outside
jit: converged sites are stored on the instance and passed as ``ttau0/tnu0``
next call (shape-guarded).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import tree_util

from pygps_tpu import config
from pygps_tpu.inference import ep as _ep
from pygps_tpu.inference import exact as _exact
from pygps_tpu.inference import fitc as _fitc
from pygps_tpu.inference import laplace as _laplace


class DnlZ:
    """pyGPs dnlZStruct-compatible: .mean/.cov/.lik flat gradient lists."""

    def __init__(self, dmean, dcov, dlik):
        self.mean = dmean
        self.cov = dcov
        self.lik = dlik

    def __repr__(self):
        return f"DnlZ(mean={self.mean}, cov={self.cov}, lik={self.lik})"


def _flat(grad_functor):
    out = []
    for leaf in tree_util.tree_leaves(grad_functor):
        out.extend(np.atleast_1d(np.asarray(leaf)).reshape(-1).tolist())
    return out


class Inference:
    """Base engine."""

    def _evaluate(self, mean, kernel, lik, x, y):
        raise NotImplementedError

    def _nlml(self):
        raise NotImplementedError

    # -- model-facing ------------------------------------------------------
    def evaluate_fn(self):
        return self._evaluate

    def nlml_fn(self):
        return self._nlml()

    def extra(self):
        """Engine-specific extra kwargs threaded into nlml/evaluate
        (e.g. EP warm-start sites)."""
        return {}

    #: True when nlml_aux_fn exists: the optimizer threads an aux state
    #: (EP sites) through evaluations instead of cold-starting each one.
    has_aux = False

    def nlml_aux_fn(self):
        """fn(mean, kernel, lik, x, y, *aux) -> (nlZ, aux_new)."""
        raise NotImplementedError

    def init_aux(self, y):
        """Initial aux state for a dataset with targets y."""
        raise NotImplementedError

    def cold_aux(self, y):
        """Aux state with NO warm-start — a genuinely fresh evaluation.

        Unlike :meth:`init_aux` (which stateful engines may serve from
        their warm cache, e.g. EP's ``last_ttau/last_tnu``), this always
        builds the algorithm's cold initialization, so restart candidates
        evaluated through it are trajectory-independent and comparable.
        Default: same as init_aux (correct for engines whose init_aux is
        already stateless, e.g. Laplace's zeros)."""
        return self.init_aux(y)

    def update_state(self, aux):
        """Hook for stateful engines (EP warm start)."""

    # -- pyGPs compat ------------------------------------------------------
    def evaluate(self, meanfunc, covfunc, likfunc, x, y, nargout=3):
        x = config.asarray(x)
        y = config.asarray(y).reshape(-1)
        post, nlZ = self._evaluate(meanfunc, covfunc, likfunc, x, y)
        if nargout <= 1:
            return post
        if nargout == 2:
            return post, nlZ
        nlml = self._nlml()
        gm, gk, gl = jax.grad(nlml, argnums=(0, 1, 2))(
            meanfunc, covfunc, likfunc, x, y)
        return post, float(nlZ), DnlZ(_flat(gm), _flat(gk), _flat(gl))


class Exact(Inference):
    """Reference inf.Exact."""

    def _evaluate(self, mean, kernel, lik, x, y):
        return _exact.evaluate(mean, kernel, lik, x, y)

    def _nlml(self):
        return _exact.nlml


class Laplace(Inference):
    """Reference inf.Laplace (warm-started Newton via aux threading,
    mirroring the reference's last_alpha cache)."""

    has_aux = True

    def _evaluate(self, mean, kernel, lik, x, y):
        return _laplace.evaluate(mean, kernel, lik, x, y)

    def _nlml(self):
        return _laplace.nlml

    def nlml_aux_fn(self):
        def fn(mean, kernel, lik, x, y, a0):
            return _laplace.nlml_with_state(mean, kernel, lik, x, y, a0)
        return fn

    def init_aux(self, y):
        return (jnp.zeros(np.shape(y)[0], dtype=config.default_dtype()),)

    def update_state(self, aux):
        pass


class EP(Inference):
    """Reference inf.EP (stateful warm start reproduced outside jit)."""

    def __init__(self):
        self.last_ttau = None
        self.last_tnu = None

    def _evaluate(self, mean, kernel, lik, x, y, ttau0=None, tnu0=None):
        if ttau0 is None:
            ttau0, tnu0 = self._warm(y)
        post, nlZ, (ttau, tnu) = _ep.evaluate(
            mean, kernel, lik, x, y, ttau0, tnu0)
        self.last_ttau = np.asarray(ttau)
        self.last_tnu = np.asarray(tnu)
        return post, nlZ

    def _warm(self, y):
        if (self.last_ttau is not None
                and self.last_ttau.shape == np.shape(y)):
            return (config.asarray(self.last_ttau),
                    config.asarray(self.last_tnu))
        return None, None

    def _nlml(self):
        return _ep.nlml

    has_aux = True

    def nlml_aux_fn(self):
        return _ep.nlml_with_sites

    def init_aux(self, y):
        w = self._warm(y)
        if w[0] is not None:
            return w
        return self.cold_aux(y)

    def cold_aux(self, y):
        z = jnp.zeros(np.shape(y)[0], dtype=config.default_dtype())
        return (z, z)

    def update_state(self, aux):
        self.last_ttau = np.asarray(aux[0])
        self.last_tnu = np.asarray(aux[1])


class Iterative(Inference):
    """Matrix-free exact GPR engine (no reference counterpart): BBMM-style
    preconditioned CG solves + SLQ log det (inference/iterative.py), with
    the rank-k pivoted-Cholesky Woodbury preconditioner (utils/pchol.py).
    O(n²) memory / O(n²·iters) compute — use where Cholesky's O(n³) or a
    stored factor is the bottleneck.  Gauss likelihood only."""

    def __init__(self, num_probes=16, lanczos_iters=30, cg_tol=1e-8,
                 cg_iters=512, precond_rank=100, seed=0, tol_nlz=None,
                 max_probes=256):
        self._cfg = dict(num_probes=num_probes,
                         lanczos_iters=lanczos_iters, cg_tol=cg_tol,
                         cg_iters=cg_iters, precond_rank=precond_rank,
                         seed=seed, tol_nlz=tol_nlz,
                         max_probes=max_probes)

    def _evaluate(self, mean, kernel, lik, x, y):
        from pygps_tpu.inference import iterative as _iterative

        return _iterative.evaluate(mean, kernel, lik, x, y, **self._cfg)

    def _nlml(self):
        from pygps_tpu.inference import iterative as _iterative

        cfg = self._cfg

        def f(mean, kernel, lik, x, y):
            return _iterative.nlml(mean, kernel, lik, x, y, **cfg)

        return f


class SVGP(Inference):
    """Whitened stochastic variational sparse GP as a pluggable engine
    (north-star VI component; no reference counterpart — pyGPs's only
    sparse method is FITC).  Reachable from the model layer via
    ``GPR_FITC().useInference("SVGP")`` / ``GPC_FITC().useInference("SVGP")``
    — the FITC wrapper supplies the inducing inputs; works with ANY
    likelihood (Gauss closed form, Gauss–Hermite otherwise).

    Structure mirrors the EP engine: the variational state (whitened mean
    μ and Cholesky factor C of q(v)) is the aux threaded through
    optimizer evaluations (warm-started, cached on the instance), found
    by an inner jitted Adam loop on −ELBO with the hyperparameters
    frozen; the returned energy is −ELBO at the optimized state with the
    variational parameters stop-gradiented.  By the envelope theorem the
    hyperparameter gradient of that value equals the gradient of the
    inner-optimized ELBO once the inner loop is near its optimum (same
    stationarity argument as EP's fixed-site gradient, inf.py:~680).

    Note: nlZ here is the NEGATIVE ELBO — an upper bound on the true
    NLML, not the NLML itself (documented delta vs the other engines).
    """

    has_aux = True

    def __init__(self, inner_steps=25, eval_steps=300, lr=0.05):
        self.inner_steps = int(inner_steps)
        self.eval_steps = int(eval_steps)
        self.lr = float(lr)
        self.last_mu = None
        self.last_c = None

    # -- aux plumbing -------------------------------------------------------
    def _z_of(self, kernel, x):
        from pygps_tpu.core import kernels as cov

        if not isinstance(kernel, cov.FITC):
            raise TypeError(
                "SVGP engine needs a FITC-wrapped kernel (inducing inputs);"
                " use GPR_FITC/GPC_FITC or cov.FITC(kernel, u)")
        return kernel.xu.value.astype(x.dtype)

    def init_aux_full(self, mean, kernel, lik, x, y):
        m = self._z_of(kernel, x).shape[0]
        if self.last_mu is not None and self.last_mu.shape == (m,):
            return (config.asarray(self.last_mu),
                    config.asarray(self.last_c))
        return self.cold_aux_full(mean, kernel, lik, x, y)

    def cold_aux_full(self, mean, kernel, lik, x, y):
        m = self._z_of(kernel, x).shape[0]
        dt = config.default_dtype()
        return (jnp.zeros(m, dtype=dt), jnp.eye(m, dtype=dt))

    def update_state(self, aux):
        self.last_mu = np.asarray(aux[0])
        self.last_c = np.asarray(aux[1])

    # -- inner fit ----------------------------------------------------------
    def _fit_aux(self, mean, kernel, lik, x, y, mu, c_raw, steps):
        import optax
        from jax import lax

        from pygps_tpu.inference import svgp as _svgp

        z = self._z_of(kernel, x)
        frozen = jax.tree_util.tree_map(
            lax.stop_gradient, (mean, kernel.inner, lik))
        tx = optax.adam(self.lr)

        def loss(var):
            p = _svgp.SVGPParams(z=z, mu=var[0], c_raw=var[1], prior=frozen)
            return -_svgp.elbo(p, x, y)

        def step(carry, _):
            var, opt_state = carry
            g = jax.grad(loss)(var)
            updates, opt_state = tx.update(g, opt_state, var)
            return (optax.apply_updates(var, updates), opt_state), ()

        var0 = (mu, c_raw)
        (var, _), _ = lax.scan(step, (var0, tx.init(var0)), None,
                               length=steps)
        return lax.stop_gradient(var[0]), lax.stop_gradient(var[1])

    def _energy(self, mean, kernel, lik, x, y, mu, c_raw):
        from pygps_tpu.inference import svgp as _svgp

        z = self._z_of(kernel, x)
        p = _svgp.SVGPParams(z=z, mu=mu, c_raw=c_raw,
                             prior=(mean, kernel.inner, lik))
        return -_svgp.elbo(p, x, y)

    # -- engine interface ---------------------------------------------------
    def nlml_aux_fn(self):
        def fn(mean, kernel, lik, x, y, mu, c_raw):
            mu, c_raw = self._fit_aux(mean, kernel, lik, x, y, mu, c_raw,
                                      self.inner_steps)
            return (self._energy(mean, kernel, lik, x, y, mu, c_raw),
                    (mu, c_raw))
        return fn

    def _nlml(self):
        eng = self

        def f(mean, kernel, lik, x, y):
            mu0, c0 = eng.cold_aux_full(mean, kernel, lik, x, y)
            mu, c_raw = eng._fit_aux(mean, kernel, lik, x, y, mu0, c0,
                                     eng.eval_steps)
            return eng._energy(mean, kernel, lik, x, y, mu, c_raw)

        return f

    def _evaluate(self, mean, kernel, lik, x, y):
        from pygps_tpu.inference import svgp as _svgp

        mu0, c0 = self.init_aux_full(mean, kernel, lik, x, y)
        mu, c_raw = self._fit_aux(mean, kernel, lik, x, y, mu0, c0,
                                  self.eval_steps)
        self.update_state((mu, c_raw))
        z = self._z_of(kernel, x)
        params = _svgp.SVGPParams(z=z, mu=mu, c_raw=c_raw,
                                  prior=(mean, kernel.inner, lik))
        post = _svgp.posterior(params)
        nlZ = self._energy(mean, kernel, lik, x, y, mu, c_raw)
        return post, nlZ


class FITC_Exact(Inference):
    """Reference inf.FITC_Exact."""

    def _evaluate(self, mean, kernel, lik, x, y):
        return _fitc.exact_evaluate(mean, kernel, lik, x, y)

    def _nlml(self):
        return _fitc.exact_nlml


class FITC_Laplace(Laplace):
    """Reference inf.FITC_Laplace (structured O(n·m²), see fitc.py)."""

    def _evaluate(self, mean, kernel, lik, x, y):
        return _fitc.laplace_evaluate(mean, kernel, lik, x, y)

    def _nlml(self):
        return _fitc.laplace_nlml

    def nlml_aux_fn(self):
        def fn(mean, kernel, lik, x, y, a0):
            return _laplace.fitc_nlml_with_state(mean, kernel, lik, x, y, a0)
        return fn


class FITC_EP(EP):
    """Reference inf.FITC_EP (structured O(n·m²), see fitc.py)."""

    def _evaluate(self, mean, kernel, lik, x, y, ttau0=None, tnu0=None):
        if ttau0 is None:
            ttau0, tnu0 = self._warm(y)
        post, nlZ, (ttau, tnu) = _fitc.ep_evaluate(
            mean, kernel, lik, x, y, ttau0, tnu0)
        self.last_ttau = np.asarray(ttau)
        self.last_tnu = np.asarray(tnu)
        return post, nlZ

    def _nlml(self):
        return _fitc.ep_nlml

    def nlml_aux_fn(self):
        return _ep.fitc_nlml_with_sites


__all__ = ["Inference", "Exact", "Laplace", "EP", "Iterative", "SVGP",
           "FITC_Exact", "FITC_Laplace", "FITC_EP", "DnlZ"]
