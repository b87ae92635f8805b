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


# Bump whenever any cached pytree layout changes (ELL/DIA/AMG/PC classes).
# A cache written under a different schema silently misses -> rebuild;
# round 1 shipped a bench crash from exactly this (stale pickled AMG layout).
SCHEMA = "r5.1"  # r5: AMG levels row-padded to 128; DIA gains dataT child


def _tmp_name(path: str) -> str:
    # unique per writer: two concurrent saves to the same path must not
    # interleave into one tmp file (os.replace of a corrupt pickle would
    # silently discard the cache benefit)
    import threading

    return f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"


def save(path: str, tree):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = _tmp_name(path)
    with open(tmp, "wb") as fh:
        pickle.dump({"schema": SCHEMA, "tree": to_host(tree)}, fh, protocol=4)
    os.replace(tmp, path)


def save_async(path: str, tree):
    """Snapshot to host immediately, write the pickle in the background.

    The host copy (to_host) happens on the calling thread so later device
    mutation cannot race; the multi-second disk write of the ~GB state is
    moved off the setup critical path.  The tmp+rename protocol keeps the
    cache atomic: an interrupted write leaves the previous cache (or
    nothing) in place, never a corrupt file — and load() tolerates
    corruption anyway.  The writer joins at interpreter exit.
    """
    import atexit
    import threading

    host_tree = to_host(tree)

    def _write():
        try:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            tmp = _tmp_name(path)
            with open(tmp, "wb") as fh:
                pickle.dump({"schema": SCHEMA, "tree": host_tree}, fh, protocol=4)
            os.replace(tmp, path)
        except Exception:  # a failed cache write must never break the run
            pass

    t = threading.Thread(target=_write, name="porotpu-cache-save", daemon=False)
    t.start()
    atexit.register(t.join)
    return t


def load(path: str):
    """Load a cached pytree; returns None on miss, schema mismatch, or ANY
    corruption — a cache can only ever cause a rebuild, never a crash."""
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as fh:
            blob = pickle.load(fh)
        if not isinstance(blob, dict) or blob.get("schema") != SCHEMA:
            return None
        return to_device(blob["tree"])
    except Exception:
        return None
