"""Solver-state caching: serialize the device operator pytrees to disk.

Setup (assembly + AMG hierarchies + factorizations) is host-bound and can
dwarf solve time on slow hosts; production use is "set up once, solve many
steps/configs".  These helpers snapshot the fully-built solver state
(ELL operators, preconditioner pytrees, BC arrays) as a pickled pytree of
numpy arrays and restore it without re-running any host setup.

The reference has no equivalent (PETSc re-assembles every run); this is a
deliberate capability addition (SURVEY.md §5 checkpoint gap, applied to
operators rather than time-state).
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def to_host(tree):
    """Device pytree -> picklable host pytree (numpy leaves)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def to_device(tree, dtype=None):
    """Host pytree -> device pytree (jnp leaves, dtypes preserved)."""
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x), tree)


def config_key(**kwargs) -> str:
    """Stable hash key for a cache entry."""
    blob = repr(sorted(kwargs.items())).encode()
    return hashlib.sha1(blob).hexdigest()[:16]


def save(path: str, tree):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        pickle.dump(to_host(tree), fh, protocol=4)


def load(path: str):
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        return to_device(pickle.load(fh))
