"""Batched low-latency prediction serving.

The reference has no serving layer (SURVEY.md §0: "no serving/CLI
layer"); this is the production-path counterpart for a trained GP model:

* the posterior and training inputs live on-device once (`warm()`),
* requests are padded to a fixed set of batch shapes so every request
  after warmup hits an already-compiled program (no jit recompiles on the
  request path — the classic serving trap with XLA),
* per-request work is one cross-Gram + two triangular ops, O(n·b) —
  milliseconds at n=10k.

Usage::

    srv = PredictServer(model, batch_sizes=(32, 256))
    srv.warm()
    ym, ys2 = srv.predict(xq)          # xq: (q, d), any q
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygps_tpu import config
from pygps_tpu.core.posteriors import predict_latent


class PredictServer:
    """Compile-once, pad-and-dispatch predictive server for a GP model."""

    def __init__(self, model, batch_sizes=(32, 256, 1024)):
        if model.posterior is None:
            model.getPosterior(der=False)
        self.model = model
        self.batch_sizes = tuple(sorted(batch_sizes))
        self._fn = None
        self._dev_state = None

    def _build(self):
        model = self.model
        if model.posterior is None:
            model.getPosterior(der=False)

        if self._fn is None:
            def run(meanf, covf, likf, post, x, xs):
                Ks = covf.K(x, xs)
                kss = covf.Kdiag(xs)
                fmu, fs2 = predict_latent(post, Ks, kss, meanf(xs))
                _, ymu, ys2 = likf.predict(fmu, fs2)
                return ymu, ys2

            self._fn = jax.jit(run)
        self._dev_state = (model.meanfunc, model.covfunc, model.likfunc,
                           jax.device_put(model.posterior),
                           jax.device_put(model.x))
        self._src_ids = self._model_ids()

    def _model_ids(self):
        m = self.model
        return (id(m.meanfunc), id(m.covfunc), id(m.likfunc),
                id(m.posterior), id(m.x))

    def _refresh_if_stale(self):
        """Re-snapshot device state when the model changed underneath us.

        Every mutating model operation (setData/setPrior/useLikelihood/
        optimize/getPosterior) REPLACES the functor/posterior/x objects, so
        an identity comparison against the build-time snapshot detects
        staleness exactly; the compiled program is shape-keyed and reused."""
        if self._dev_state is None or self._model_ids() != self._src_ids:
            self._build()

    def warm(self):
        """Compile every batch shape ahead of traffic."""
        self._refresh_if_stale()
        d = self.model.x.shape[1]
        for b in self.batch_sizes:
            xq = jnp.zeros((b, d), dtype=self.model.x.dtype)
            out = self._fn(*self._dev_state, xq)
            jax.block_until_ready(out)
        return self

    def _bucket(self, q):
        for b in self.batch_sizes:
            if q <= b:
                return b
        return self.batch_sizes[-1]

    def predict(self, xq):
        """(ymu, ys2) for a query batch of any size; requests larger than
        the biggest bucket are chunked. Serves the model's CURRENT state:
        if the model was re-optimized / re-fit since the last build, the
        device snapshot is refreshed first (no stale predictions)."""
        self._refresh_if_stale()
        xq = config.asarray(xq)
        if xq.ndim == 1:
            xq = xq[:, None]
        xq = xq.astype(self.model.x.dtype)
        q = xq.shape[0]
        bmax = self.batch_sizes[-1]
        outs_m, outs_v = [], []
        for start in range(0, q, bmax):
            chunk = xq[start:start + bmax]
            b = self._bucket(chunk.shape[0])
            pad = b - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.tile(chunk[-1:], (pad, 1))], axis=0)
            ymu, ys2 = self._fn(*self._dev_state, chunk)
            outs_m.append(np.asarray(ymu)[:b - pad if pad else b])
            outs_v.append(np.asarray(ys2)[:b - pad if pad else b])
        return np.concatenate(outs_m), np.concatenate(outs_v)
