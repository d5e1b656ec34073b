"""Pytree functor base class.

The reference represents kernels/means/likelihoods as stateful objects
carrying a flat ``hyp`` list plus hand-written ``getDerMatrix`` derivative
methods (pyGPs cov.py / mean.py / lik.py).  Here every functor *is a JAX
pytree*: its trainable (log-)parameters are the leaves, so

* ``jax.grad(loss)(kernel)`` returns a kernel-shaped pytree of gradients —
  the entire hand-derivative surface of the reference collapses;
* functors pass transparently through jit/vmap/shard_map;
* composition (Sum/Product/Scale) nests pytrees, which reproduces the
  reference's "concatenate child hyp lists in order" semantics for free.

A pyGPs-compatible ``hyp`` property (flat list of floats, ordered like the
reference) is kept on top for API parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import tree_util

from pygps_tpu import config


def register(cls):
    """Class decorator: register a Functor subclass as a pytree node."""
    tree_util.register_pytree_node_class(cls)
    return cls


class Functor:
    """Base for kernels / means / likelihoods.

    Subclasses declare ``_hyp_fields`` (ordered names of trainable leaf
    attributes — jnp scalars/vectors, or child functors for composites) and
    ``_static_fields`` (hashable aux data, e.g. a Matern degree).
    """

    _hyp_fields: tuple = ()
    _static_fields: tuple = ()

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._hyp_fields)
        aux = tuple(getattr(self, f) for f in self._static_fields)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        for f, v in zip(cls._hyp_fields, children):
            setattr(obj, f, v)
        for f, v in zip(cls._static_fields, aux):
            setattr(obj, f, v)
        return obj

    # -- pyGPs-compatible flat hyp view ------------------------------------
    @property
    def hyp(self) -> list:
        """Flat list of hyperparameters, ordered as the reference orders
        them (depth-first over composites, each functor's own fields in
        declaration order)."""
        leaves = tree_util.tree_leaves(self)
        out = []
        for leaf in leaves:
            out.extend(jnp.atleast_1d(leaf).reshape(-1).tolist())
        return out

    @hyp.setter
    def hyp(self, values):
        leaves, treedef = tree_util.tree_flatten(self)
        flat = [float(v) for v in values]
        new_leaves = []
        i = 0
        for leaf in leaves:
            leaf = jnp.asarray(leaf)
            k = int(leaf.size)
            new_leaves.append(
                jnp.asarray(flat[i:i + k], dtype=leaf.dtype).reshape(leaf.shape)
            )
            i += k
        if i != len(flat):
            raise ValueError(
                f"hyp setter: expected {i} values, got {len(flat)}"
            )
        new = tree_util.tree_unflatten(treedef, new_leaves)
        for f in self._hyp_fields:
            setattr(self, f, getattr(new, f))

    @property
    def n_hyp(self) -> int:
        return sum(int(jnp.asarray(l).size) for l in tree_util.tree_leaves(self))

    def __repr__(self):
        fields = ", ".join(
            f"{f}={getattr(self, f)!r}" for f in (*self._hyp_fields, *self._static_fields)
        )
        return f"{type(self).__name__}({fields})"


def _p(v, dtype=None) -> jax.Array:
    """Normalise a user-supplied hyperparameter to a jnp array leaf."""
    a = jnp.asarray(v, dtype=dtype if dtype is not None else config.default_dtype())
    return a
