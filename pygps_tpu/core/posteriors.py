"""Posterior representation shared by all inference engines.

Keeps the reference's universal ``post = (alpha, sW, L)`` contract
(pyGPs inf.py ``postStruct``, inf.py:~30; consumed by gp.py:~250-330) —
this is what makes inference engines pluggable and ``predict``
engine-agnostic:

* ``alpha``: (n,) with predictive mean μ* = m(x*) + K*ᵀ·alpha
* ``sW``:    (n,) sqrt of likelihood / site precision
* ``L``:     lower Cholesky factor of B = I + sW·K·sW   (``is_tril=True``)
             OR an explicit matrix such that
             fs2 = kss + Σ(Ks ∘ (L·Ks))                 (``is_tril=False``)

(The reference stores an *upper* factor and dispatches on
``np.allclose(L, tril(L))``; here the orientation is fixed to lower and the
dispatch is a static flag — no runtime structure sniffing under jit.)

For FITC/SVGP engines the same contract holds with n replaced by the number
of inducing points m and K* meaning K(u, x*).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import tree_util

from pygps_tpu.utils.tools import solve_tril


@tree_util.register_pytree_node_class
class Posterior:
    """(alpha, sW, L) posterior triple; ``is_tril`` selects the variance
    formula (static, not traced)."""

    def __init__(self, alpha, sW, L, is_tril: bool = True):
        self.alpha = alpha
        self.sW = sW
        self.L = L
        self.is_tril = bool(is_tril)

    def tree_flatten(self):
        return (self.alpha, self.sW, self.L), (self.is_tril,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        alpha, sW, L = children
        return cls(alpha, sW, L, is_tril=aux[0])

    def __repr__(self):
        return (f"Posterior(alpha={self.alpha.shape}, sW={self.sW.shape}, "
                f"L={self.L.shape}, is_tril={self.is_tril})")


def predict_latent(post: Posterior, Ks: jax.Array, kss: jax.Array,
                   ms: jax.Array):
    """Latent predictive (fmu, fs2) at test points.

    Args:
      post: posterior triple (over training or inducing points).
      Ks:  (n, ns) cross-covariance K(x_rep, x*).
      kss: (ns,)   prior self-variances diag K(x*, x*).
      ms:  (ns,)   prior mean m(x*).

    Implements the two variance formulas of the reference (gp.py:~290-320);
    negative variances are clipped to 0 exactly as the reference does.
    """
    fmu = ms + Ks.T @ post.alpha
    if post.is_tril:
        V = solve_tril(post.L, post.sW[:, None] * Ks)
        fs2 = kss - jnp.sum(V * V, axis=0)
    else:
        fs2 = kss + jnp.sum(Ks * (post.L @ Ks), axis=0)
    return fmu, jnp.maximum(fs2, 0.0)


def predict_latent_full(post: Posterior, Ks: jax.Array, Kss: jax.Array,
                        ms: jax.Array):
    """Latent predictive with the FULL (ns, ns) covariance.

    Extension beyond the reference (which only returns marginal
    variances): Σ* = K** − Vᵀ V (triangular branch) or
    K** + Ksᵀ L Ks (explicit-matrix branch).  Enables joint posterior
    function draws."""
    fmu = ms + Ks.T @ post.alpha
    if post.is_tril:
        V = solve_tril(post.L, post.sW[:, None] * Ks)
        Sig = Kss - V.T @ V
    else:
        Sig = Kss + Ks.T @ (post.L @ Ks)
    return fmu, 0.5 * (Sig + Sig.T)


__all__ = ["Posterior", "predict_latent", "predict_latent_full"]
