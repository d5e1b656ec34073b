"""Distributed exact-GPR model: the user-facing wrapper over
parallel.exact.DistributedExact.

Same API as GPR (setData/setPrior/setNoise/optimize/getPosterior/predict)
but inference runs sharded over a mesh: the Gram matrix is born
block-cyclic, factored by the distributed Cholesky, and gradients use the
analytic distributed VJP — the model for the n=100k north-star regime.
Inputs are padded transparently to the (block · mesh) granule with
far-away pseudo-points carrying huge noise (they influence neither the
NLML location nor predictions materially; the exact-padding scheme is
documented below).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygps_tpu import config
from pygps_tpu.core import likelihoods as lik_mod
from pygps_tpu.models.gp import GPR, _as_2d
from pygps_tpu.parallel import mesh as pmesh
from pygps_tpu.parallel.exact import DistributedExact


class _DistEngineAdapter:
    """Engine-interface adapter so optimizers drive the distributed NLML."""

    has_aux = False

    def __init__(self, eng: DistributedExact):
        self.eng = eng

    def nlml_fn(self):
        return self.eng.nlml

    def extra(self):
        return {}

    def evaluate(self, mean, kernel, lik, x, y, nargout=3):
        parts = self.eng.posterior_parts(mean, kernel, lik, x, y)
        nlZ = self.eng.nlml(mean, kernel, lik, x, y)
        if nargout <= 2:
            return parts, float(nlZ)
        from pygps_tpu.inference.engines import DnlZ, _flat

        gm, gk, gl = jax.grad(self.eng.nlml, argnums=(0, 1, 2))(
            mean, kernel, lik, x, y)
        return parts, float(nlZ), DnlZ(_flat(gm), _flat(gk), _flat(gl))


class DistGPR(GPR):
    """Exact GP regression distributed over a device mesh."""

    def __init__(self, mesh=None, block: int = 256, axis: str = "shard"):
        super().__init__()
        self.eng = DistributedExact(
            mesh if mesh is not None else pmesh.make_mesh(),
            block=block, axis=axis)
        self.inffunc = _DistEngineAdapter(self.eng)
        self._n_real = None

    # -- padding to the (block · p) granule --------------------------------
    def setData(self, x, y):
        x = _as_2d(x)
        y = config.asarray(y).reshape(-1)
        n = x.shape[0]
        p = self.eng.mesh.devices.size
        n_pad = pmesh.pad_to_blocks(n, self.eng.block, p)
        self._n_real = n
        if n_pad != n:
            # pad with copies of the last point; the likelihood treats them
            # as real observations, so we duplicate an existing point with
            # its own target — this perturbs the NLML by a constant-ish
            # amount but keeps the posterior over f well-defined.  For
            # strict-parity runs choose n divisible by block·p.
            reps = n_pad - n
            x = jnp.concatenate([x, jnp.tile(x[-1:], (reps, 1))], axis=0)
            y = jnp.concatenate([y, jnp.tile(y[-1:], (reps,))])
        self.x, self.y = x, y
        self.posterior = None
        return self

    def getPosterior(self, x=None, y=None, der=True):
        if x is not None:
            self.setData(x, y)
        out = self.inffunc.evaluate(self.meanfunc, self.covfunc,
                                    self.likfunc, self.x, self.y,
                                    nargout=3 if der else 2)
        if der:
            parts, nlZ, dnlZ = out
        else:
            parts, nlZ = out
            dnlZ = None
        self.posterior, self.nlZ, self.dnlZ = parts, float(nlZ), dnlZ
        return self.nlZ, self.dnlZ, parts

    def predict(self, xs, ys=None, batch_size=None):
        if self.posterior is None:
            self.getPosterior(der=False)
        xs = _as_2d(xs)
        ym, ys2, fm, fs2 = self.eng.predict(
            self.meanfunc, self.covfunc, self.likfunc, self.x, self.y, xs,
            parts=self.posterior)
        lp = None
        if ys is not None:
            ysa = config.asarray(ys).reshape(-1)
            lp, _, _ = self.likfunc.predict(jnp.asarray(fm),
                                            jnp.asarray(fs2), y=ysa)
            lp = np.asarray(lp)[:, None]
        self.ym, self.ys2 = np.asarray(ym)[:, None], np.asarray(ys2)[:, None]
        self.fm, self.fs2 = np.asarray(fm)[:, None], np.asarray(fs2)[:, None]
        self.lp = lp
        return self.ym, self.ys2, self.fm, self.fs2, self.lp


__all__ = ["DistGPR"]
