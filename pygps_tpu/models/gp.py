"""User-facing GP model classes.

TPU-native counterpart of pyGPs ``pyGPs/Core/gp.py``: classes ``GP`` (base,
gp.py:~40), ``GPR`` (:~400), ``GPC`` (:~500), ``GPMC`` (:~600),
``GPR_FITC`` (:~750), ``GPC_FITC`` (:~900) with the reference's method
surface: ``setData``, ``setPrior``, ``setNoise``, ``setOptimizer``,
``useInference``, ``useLikelihood``, ``optimize``, ``getPosterior``,
``predict``, ``predict_with_posterior``, ``plot``.

Deltas vs the reference:
* Prediction is one jitted, MXU-batched evaluation instead of the
  reference's Python loop over ~1000-point chunks (gp.py:~260-340); an
  optional ``batch_size`` re-chunks via ``lax.map`` to bound memory for
  very large test sets.
* ``getPosterior`` returns the same (nlZ, dnlZ, post) triple; dnlZ comes
  from autodiff.
* Hyperparameter state lives in the functor pytrees; ``optimize`` runs a
  host-side optimizer driving a jitted NLML value+grad closure.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygps_tpu import config
from pygps_tpu.core import kernels as cov
from pygps_tpu.core import likelihoods as lik
from pygps_tpu.core import means as mean
from pygps_tpu.core.posteriors import predict_latent
from pygps_tpu.inference import engines
from pygps_tpu.optimize import conf as _conf
from pygps_tpu.optimize import optimizers as opt


def _as_2d(x):
    a = config.asarray(x)
    if a.ndim == 1:
        a = a[:, None]
    return a


class GP:
    """Base GP model (reference gp.GP)."""

    def __init__(self):
        self.meanfunc = mean.Zero()
        self.covfunc = cov.RBF()
        self.likfunc = lik.Gauss()
        self.inffunc = engines.Exact()
        self.optimizer = opt.Minimize(self)
        self.x = None
        self.y = None
        self.posterior = None
        self.nlZ = None
        self.dnlZ = None
        # prediction cache (set by predict)
        self.ym = self.ys2 = self.fm = self.fs2 = self.lp = None
        self._pred_jit = None

    # -- data / prior wiring ----------------------------------------------
    def setData(self, x, y):
        self.x = _as_2d(x)
        self.y = config.asarray(y).reshape(-1)
        self.posterior = None
        return self

    def setPrior(self, mean=None, kernel=None):
        if mean is not None:
            self.meanfunc = mean
        if kernel is not None:
            self.covfunc = kernel
        self.posterior = None
        self._pred_jit = None
        return self

    def setOptimizer(self, method, num_restarts=None, min_threshold=None,
                     meanRange=None, covRange=None, likRange=None):
        conf = None
        if num_restarts is not None or min_threshold is not None:
            conf = _conf.random_init_conf(
                num_restarts=num_restarts or 0,
                min_threshold=min_threshold,
                mean_range=meanRange or [],
                cov_range=covRange or [],
                lik_range=likRange or [],
            )
        table = {"Minimize": opt.Minimize, "SCG": opt.SCG, "CG": opt.CG,
                 "BFGS": opt.BFGS, "Adam": opt.Adam, "LBFGS": opt.LBFGS}
        if isinstance(method, str):
            if method not in table:
                raise ValueError(f"unknown optimizer {method!r}")
            self.optimizer = table[method](self, searchConfig=conf)
        else:
            self.optimizer = method
            self.optimizer.model = self
            if conf is not None:
                self.optimizer.searchConfig = conf
        return self

    def useInference(self, newInf):
        table = {"Exact": engines.Exact, "Laplace": engines.Laplace,
                 "EP": engines.EP, "Iterative": engines.Iterative}
        if isinstance(newInf, str):
            if newInf not in table:
                raise ValueError(f"unknown inference {newInf!r}")
            self.inffunc = table[newInf]()
        else:
            self.inffunc = newInf
        self.posterior = None
        self._pred_jit = None
        return self

    def useLikelihood(self, newLik):
        table = {"Gauss": lik.Gauss, "Erf": lik.Erf,
                 "Laplace": lik.Laplace, "Logistic": lik.Logistic}
        if isinstance(newLik, str):
            if newLik not in table:
                raise ValueError(f"unknown likelihood {newLik!r}")
            self.likfunc = table[newLik]()
        else:
            self.likfunc = newLik
        self.posterior = None
        self._pred_jit = None
        return self

    # -- engine plumbing ---------------------------------------------------
    def _inference_nlml(self):
        return self.inffunc.nlml_fn()

    def _inference_extra(self):
        return self.inffunc.extra()

    # -- core operations ---------------------------------------------------
    def getPosterior(self, x=None, y=None, der=True):
        """Run inference; returns (nlZ, dnlZ, post) like the reference
        (dnlZ=None when der=False). Caches all three on the model."""
        if x is not None or y is not None:
            self.setData(x if x is not None else self.x,
                         y if y is not None else self.y)
        if self.x is None:
            raise ValueError("no data: call setData first")
        out = self.inffunc.evaluate(
            self.meanfunc, self.covfunc, self.likfunc, self.x, self.y,
            nargout=3 if der else 2)
        if der:
            post, nlZ, dnlZ = out
        else:
            post, nlZ = out
            dnlZ = None
        self.posterior, self.nlZ, self.dnlZ = post, float(nlZ), dnlZ
        return self.nlZ, self.dnlZ, post

    def optimize(self, x=None, y=None, numIterations=40):
        """Fit hyperparameters by NLML minimization (reference
        gp.GP.optimize → opt.*.findMin)."""
        if x is not None:
            self.setData(x, y)
        if self.x is None:
            raise ValueError("no data: call setData first")
        theta, best = self.optimizer.findMin(self.x, self.y,
                                             numIters=numIterations)
        # write optimum back into the functors
        from jax.flatten_util import ravel_pytree
        _, unravel = ravel_pytree((self.meanfunc, self.covfunc, self.likfunc))
        m, k, l = unravel(jnp.asarray(theta))
        self.meanfunc, self.covfunc, self.likfunc = m, k, l
        self._pred_jit = None
        self.getPosterior()
        return self.nlZ, self.posterior

    # -- prediction --------------------------------------------------------
    def _predict_fn(self):
        """Jitted latent+likelihood predict over all test points at once."""
        if self._pred_jit is None:
            def run(meanf, covf, likf, post, x, xs, ys):
                # for FITC kernels K(x, xs) is K(u, xs): the posterior lives
                # on the inducing values (see cov.FITC._cross)
                Ks = covf.K(x, xs)
                kss = covf.Kdiag(xs)
                ms = meanf(xs)
                fmu, fs2 = predict_latent(post, Ks, kss, ms)
                lp, ymu, ys2 = likf.predict(fmu, fs2, y=ys)
                return fmu, fs2, ymu, ys2, lp

            self._pred_jit = jax.jit(run)
        return self._pred_jit

    def predict(self, xs, ys=None, batch_size=None):
        """(ym, ys2, fm, fs2, lp) at test inputs (reference gp.GP.predict
        ordering). lp is None unless ys is given.

        ``batch_size`` bounds peak memory for very large test sets: the
        reference loops ~1000-point chunks in Python (gp.py:~280); here a
        single jitted chunk program is reused over padded chunks."""
        if self.posterior is None:
            self.getPosterior(der=False)
        return self.predict_with_posterior(self.posterior, xs, ys,
                                           batch_size=batch_size)

    def predict_with_posterior(self, post, xs, ys=None, batch_size=None):
        xs = _as_2d(xs)
        ys_a = None if ys is None else config.asarray(ys).reshape(-1)
        ns = xs.shape[0]
        fn = self._predict_fn()

        if batch_size is None or ns <= batch_size:
            fmu, fs2, ymu, ys2, lp = fn(self.meanfunc, self.covfunc,
                                        self.likfunc, post, self.x, xs, ys_a)
        else:
            b = int(batch_size)
            pad = (-ns) % b
            xs_p = jnp.concatenate([xs, jnp.tile(xs[-1:], (pad, 1))], 0) \
                if pad else xs
            ys_p = None
            if ys_a is not None:
                ys_p = jnp.concatenate(
                    [ys_a, jnp.tile(ys_a[-1:], (pad,))]) if pad else ys_a
            chunks = []
            for i in range(0, ns + pad, b):
                yb = None if ys_p is None else ys_p[i:i + b]
                chunks.append(fn(self.meanfunc, self.covfunc, self.likfunc,
                                 post, self.x, xs_p[i:i + b], yb))
            parts = list(zip(*chunks))
            cat = [None if parts[k][0] is None
                   else jnp.concatenate(parts[k])[:ns] for k in range(5)]
            fmu, fs2, ymu, ys2, lp = cat

        self.fm, self.fs2 = np.asarray(fmu)[:, None], np.asarray(fs2)[:, None]
        self.ym, self.ys2 = np.asarray(ymu)[:, None], np.asarray(ys2)[:, None]
        self.lp = None if lp is None else np.asarray(lp)[:, None]
        return self.ym, self.ys2, self.fm, self.fs2, self.lp

    def predict_full(self, xs):
        """(fmu, Sigma) — latent predictive mean and FULL joint covariance
        at xs (extension; the reference returns marginals only)."""
        from pygps_tpu.core.posteriors import predict_latent_full

        if self.posterior is None:
            self.getPosterior(der=False)
        xs = _as_2d(xs)

        def run(meanf, covf, likf, post, x, xs):
            Ks = covf.K(x, xs)
            Kss = covf.Ktrain(xs)
            return predict_latent_full(post, Ks, Kss, meanf(xs))

        fmu, Sig = jax.jit(run)(self.meanfunc, self.covfunc, self.likfunc,
                                self.posterior, self.x, xs)
        return np.asarray(fmu), np.asarray(Sig)

    def posterior_samples(self, xs, n_samples=10, seed=0):
        """Joint posterior function draws f* ~ N(fmu, Sigma) at xs."""
        from pygps_tpu.utils.tools import safe_cholesky

        fmu, Sig = self.predict_full(xs)
        fmu_j, Sig_j = jnp.asarray(fmu), jnp.asarray(Sig)
        L, _ = safe_cholesky(Sig_j + 1e-10 * jnp.eye(Sig_j.shape[0],
                                                     dtype=Sig_j.dtype))
        z = jax.random.normal(jax.random.PRNGKey(seed),
                              (Sig_j.shape[0], n_samples), Sig_j.dtype)
        return np.asarray(fmu_j[:, None] + L @ z).T    # (n_samples, ns)

    # -- sampling (north-star extension; no reference counterpart) ---------
    def sample(self, num_samples=200, num_warmup=200, num_chains=8,
               sampler="nuts", seed=0, mesh=None, hyperprior_std=3.0,
               checkpoint_to=None, resume_from=None, **kwargs):
        """Sample hyperparameters from p(θ|y) ∝ exp(−NLML(θ))·N(θ|0,σ²I)
        with NUTS (default), HMC, or likelihood-tempered SMC
        (``sampler="smc"``); chains vmapped, or sharded over a mesh when
        one is given (psum-synchronized dual averaging).

        Returns (samples (T, C, n_hyp), stats).  For SMC, samples is the
        final particle population shaped (1, P, n_hyp) (P =
        ``num_particles``, default 8·num_chains) and stats additionally
        carries ``log_evidence`` — the tempered-SMC estimate of
        log ∫ p(y|θ) p(θ) dθ, which no other sampler provides.  The weak
        Gaussian hyperprior keeps the posterior proper (the reference's
        optimizer has no prior; the flat-prior limit is
        hyperprior_std → ∞)."""
        import jax.flatten_util as fu

        from pygps_tpu.inference import hmc as _hmc
        from pygps_tpu.inference import nuts as _nuts

        if self.x is None:
            raise ValueError("no data: call setData first")
        theta0, unravel = fu.ravel_pytree(
            (self.meanfunc, self.covfunc, self.likfunc))
        nlml_fn = self._inference_nlml()
        extra = self._inference_extra()
        x, y = self.x, self.y
        inv_var = 1.0 / (hyperprior_std ** 2)

        def logp(t):
            m, k, l = unravel(t)
            return (-nlml_fn(m, k, l, x, y, **extra)
                    - 0.5 * inv_var * jnp.sum(t * t))

        key = jax.random.PRNGKey(seed)
        k_init, k_run = jax.random.split(key)

        if sampler == "smc":
            from pygps_tpu.inference import smc as _smc

            P = int(kwargs.pop("num_particles", 8 * num_chains))
            # particles MUST start from the prior N(0, σ²I) — it is the
            # β=0 target of the tempering schedule and the reference
            # measure of the evidence estimate; non-finite NLML in the
            # prior tails is guarded to −1e30 inside sample_smc (those
            # particles die at the first reweight, as they should)
            q0 = hyperprior_std * jax.random.normal(
                k_init, (P, theta0.shape[0]), theta0.dtype)

            def log_prior(t):
                return -0.5 * inv_var * jnp.sum(t * t)

            def log_lik(t):
                m, k, l = unravel(t)
                return -nlml_fn(m, k, l, x, y, **extra)

            # Per-stage dispatch by default at TPU-size n: the monolithic
            # scan exceeds the per-dispatch execution budget and faults
            # the device (see sample_smc's staged doc).  Small problems
            # keep the single fused program.
            staged = bool(kwargs.pop("staged", x.shape[0] >= 1024))
            if staged:
                q, logZ, stats = _smc.sample_smc(
                    log_prior, log_lik, q0, k_run, staged=True, **kwargs)
            else:
                run = jax.jit(lambda q0, k: _smc.sample_smc(
                    log_prior, log_lik, q0, k, **kwargs))
                q, logZ, stats = run(q0, k_run)
            stats = dict(stats)
            stats["log_evidence"] = float(logZ)
            stats["q_final"] = q
            return q[None, :, :], stats

        q0 = theta0[None, :] + 0.1 * jax.random.normal(
            k_init, (num_chains, theta0.shape[0]), theta0.dtype)
        if resume_from is not None:
            # resume mid-run: chain state + adaptation from a checkpoint
            # (SURVEY.md §5.3/§5.4) — skips warmup entirely
            from pygps_tpu.utils import checkpoint as _ckpt

            like = {"q": q0, "eps": jnp.zeros(()),
                    "inv_mass": jnp.zeros(theta0.shape[0]),
                    "key": jnp.zeros(2, jnp.uint32)}
            state, _ = _ckpt.load(resume_from, like)
            q0 = state["q"]
            kwargs["warm_state"] = (state["eps"], state["inv_mass"])
            k_run = jax.random.wrap_key_data(state["key"]) \
                if hasattr(jax.random, "wrap_key_data") else k_run
        if mesh is not None:
            from pygps_tpu.parallel.sampling import sample_nuts_sharded

            samples, stats = sample_nuts_sharded(
                logp, q0, k_run, mesh, sampler=sampler,
                num_warmup=num_warmup, num_samples=num_samples, **kwargs)
        elif "chain_chunk" in kwargs and sampler == "nuts":
            # chain-axis chunking: bounds COMPILE size at chain_chunk
            # vmapped chains regardless of num_chains (the 256-wide
            # program crashes the remote compile helper) — see nuts.py
            samples, stats = _nuts.sample_nuts_chain_chunked(
                logp, q0, k_run, num_warmup=num_warmup,
                num_samples=num_samples, **kwargs)
        elif "chunk_size" in kwargs and sampler == "nuts":
            # chunked dispatch: bounds per-call device time (tunnel/device
            # execution limits at large C·T·2^depth) — see nuts.py
            samples, stats = _nuts.sample_nuts_chunked(
                logp, q0, k_run, num_warmup=num_warmup,
                num_samples=num_samples, **kwargs)
        else:
            fn = _nuts.sample_nuts if sampler == "nuts" else _hmc.sample_hmc
            run = jax.jit(lambda q0, k: fn(
                logp, q0, k, num_warmup=num_warmup,
                num_samples=num_samples, **kwargs))
            samples, stats = run(q0, k_run)
        if checkpoint_to is not None:
            from pygps_tpu.utils import checkpoint as _ckpt

            k_next = jax.random.fold_in(k_run, num_samples)
            _ckpt.save(checkpoint_to, {
                "q": stats["q_final"],
                "eps": jnp.asarray(stats["step_size"]),
                "inv_mass": jnp.asarray(stats["inv_mass"]),
                "key": jax.random.key_data(k_next)
                if hasattr(jax.random, "key_data") else jnp.zeros(2, jnp.uint32),
            }, meta={"sampler": sampler, "num_chains": num_chains})
        return samples, stats

    # -- plotting ----------------------------------------------------------
    def plot(self, *args, **kwargs):  # pragma: no cover - visual
        raise NotImplementedError("plot() is model-specific")


class GPR(GP):
    """Exact GP regression (reference gp.GPR): mean Zero, cov RBF,
    lik Gauss, inf Exact, optimizer Minimize."""

    def __init__(self):
        super().__init__()

    def setNoise(self, log_sigma):
        """Fix the observation noise (reference GPR.setNoise)."""
        self.likfunc = lik.Gauss(log_sigma=log_sigma)
        self.posterior = None
        return self

    def plot(self, axisvals=None):  # pragma: no cover - visual
        import matplotlib.pyplot as plt

        xs = np.linspace(float(self.x.min()) - 0.2,
                         float(self.x.max()) + 0.2, 201)[:, None]
        ym, ys2, _, _, _ = self.predict(xs)
        ym, s = ym[:, 0], np.sqrt(ys2[:, 0])
        plt.fill_between(xs[:, 0], ym - 2 * s, ym + 2 * s, alpha=0.3)
        plt.plot(xs[:, 0], ym)
        plt.plot(np.asarray(self.x)[:, 0], np.asarray(self.y), "+")
        if axisvals:
            plt.axis(axisvals)
        plt.show()


class GPC(GP):
    """Binary GP classification with ±1 targets (reference gp.GPC):
    lik Erf, inf EP by default; switchable to Laplace."""

    def __init__(self):
        super().__init__()
        self.likfunc = lik.Erf()
        self.inffunc = engines.EP()

    def plot(self, x1, x2, t1, t2, axisvals=None):  # pragma: no cover
        import matplotlib.pyplot as plt

        grid = np.stack(np.meshgrid(t1, t2), axis=-1).reshape(-1, 2)
        ym, _, _, _, _ = self.predict(grid)
        p = (ym[:, 0] + 1) / 2.0
        plt.contourf(t1, t2, p.reshape(len(t2), len(t1)), levels=20)
        plt.plot(x1[:, 0], x1[:, 1], "b+")
        plt.plot(x2[:, 0], x2[:, 1], "r+")
        if axisvals:
            plt.axis(axisvals)
        plt.show()


class GPMC:
    """One-vs-rest multiclass wrapper over binary GPC models
    (reference gp.GPMC, gp.py:~600-750)."""

    def __init__(self, n_class):
        self.n_class = int(n_class)
        self.binary = [GPC() for _ in range(self.n_class)]
        self.x = None
        self.y = None

    def setData(self, x, y):
        self.x = _as_2d(x)
        self.y = np.asarray(y).reshape(-1).astype(int)
        return self

    def useInference(self, name):
        for m in self.binary:
            m.useInference(name)
        return self

    def useLikelihood(self, name):
        for m in self.binary:
            m.useLikelihood(name)
        return self

    def setPrior(self, mean=None, kernel=None):
        import copy

        for m in self.binary:
            m.setPrior(mean=copy.deepcopy(mean) if mean is not None else None,
                       kernel=copy.deepcopy(kernel) if kernel is not None else None)
        return self

    def _binary_targets(self, c):
        return jnp.where(jnp.asarray(self.y) == c, 1.0, -1.0).astype(
            config.default_dtype())

    def optimizeAndPredict(self, xs, numIterations=40):
        """Optimize each binary model then vote (reference
        GPMC.optimizeAndPredict): returns (predictive_vote, class)."""
        return self._run(xs, optimize=True, numIterations=numIterations)

    def fitAndPredict(self, xs):
        """Posterior (no hyp optimization) + vote (reference
        GPMC.fitAndPredict)."""
        return self._run(xs, optimize=False)

    def _run(self, xs, optimize, numIterations=40):
        xs = _as_2d(xs)
        votes = np.zeros((xs.shape[0], self.n_class))
        for c in range(self.n_class):
            m = self.binary[c]
            yb = self._binary_targets(c)
            m.setData(self.x, yb)
            if optimize:
                m.optimize(numIterations=numIterations)
            ym, _, _, _, lp = m.predict(xs, ys=np.ones(xs.shape[0]))
            votes[:, c] = np.exp(lp[:, 0])    # p(y*=+1)
        vote = votes / np.maximum(votes.sum(axis=1, keepdims=True), 1e-300)
        return vote, vote.argmax(axis=1)


class _FITCMixin:
    """Shared FITC wiring (reference GPR_FITC.setData/setPrior default
    inducing-grid rule, gp.py:~750; the grid rule is verify-tagged upstream —
    here the default is an equispaced subsample of the training inputs)."""

    DEFAULT_M = 64

    def __init__(self):
        self.u = None
        self._base_cov = None

    def setPrior(self, mean=None, kernel=None, inducing_points=None):
        if inducing_points is not None:
            self.u = _as_2d(inducing_points)
        if kernel is not None:
            self._base_cov = kernel
        GP.setPrior(self, mean=mean,
                    kernel=self._wrap() if self._base_cov is not None else None)
        return self

    def _wrap(self):
        if self.u is None:
            return self._base_cov   # wrapped lazily in setData
        return cov.FITC(self._base_cov, self.u)

    def setData(self, x, y):
        GP.setData(self, x, y)
        if self._base_cov is None:
            self._base_cov = (self.covfunc.inner
                              if isinstance(self.covfunc, cov.FITC)
                              else self.covfunc)
        if self.u is None:
            n = self.x.shape[0]
            m = min(n, self.DEFAULT_M)
            idx = np.linspace(0, n - 1, m).round().astype(int)
            self.u = self.x[idx]
        self.covfunc = cov.FITC(self._base_cov, self.u)
        self._pred_jit = None
        return self


class GPR_FITC(_FITCMixin, GPR):
    """Sparse FITC regression (reference gp.GPR_FITC)."""

    def __init__(self):
        GPR.__init__(self)
        _FITCMixin.__init__(self)
        self.inffunc = engines.FITC_Exact()

    def useInference(self, newInf):
        table = {"Exact": engines.FITC_Exact,
                 "Laplace": engines.FITC_Laplace,
                 "EP": engines.FITC_EP,
                 "SVGP": engines.SVGP}
        if isinstance(newInf, str) and newInf in table:
            self.inffunc = table[newInf]()
            self.posterior = None
            return self
        return GP.useInference(self, newInf)


class GPC_FITC(_FITCMixin, GPC):
    """Sparse FITC classification (reference gp.GPC_FITC): FITC_EP default,
    switchable to FITC_Laplace."""

    def __init__(self):
        GPC.__init__(self)
        _FITCMixin.__init__(self)
        self.inffunc = engines.FITC_EP()

    def useInference(self, newInf):
        table = {"Laplace": engines.FITC_Laplace, "EP": engines.FITC_EP,
                 "SVGP": engines.SVGP}
        if isinstance(newInf, str) and newInf in table:
            self.inffunc = table[newInf]()
            self.posterior = None
            return self
        return GP.useInference(self, newInf)


__all__ = ["GP", "GPR", "GPC", "GPMC", "GPR_FITC", "GPC_FITC"]
