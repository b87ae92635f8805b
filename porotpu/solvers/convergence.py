"""Field-wise convergence testing (the reference's custom KSP test).

Reference lib/Solver.py:8-51 prepares a per-field infinity-norm test
(residual split into s/f/p subvectors, absolute inf-norms and relative
versions normalized by max of the per-field RHS 2-norms) but never
registers it (``args = None`` dead code at lib/Solver.py:115).  Here the
test is implemented *and actually wired in* (SURVEY.md §2.1 item 8):
solvers accept ``fieldwise=FieldwiseTest(...)`` and then evaluate
convergence on the true residual split per field.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class FieldwiseTest:
    """Per-field infinity-norm convergence test over contiguous segments."""

    offsets: tuple  # static: (0, ns, ns+nf, n)
    b0_norms: jax.Array  # (nfields,) per-field 2-norms of initial RHS

    def tree_flatten(self):
        return (self.b0_norms,), (self.offsets,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0])

    @classmethod
    def from_sizes(cls, sizes, b):
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + int(s))
        b0 = jnp.stack(
            [jnp.linalg.norm(b[offs[i] : offs[i + 1]]) for i in range(len(sizes))]
        )
        return cls(tuple(offs), b0)

    @property
    def nfields(self):
        return len(self.offsets) - 1

    def field_norms(self, r: jax.Array) -> jax.Array:
        """Per-field infinity norms of a residual vector."""
        return jnp.stack(
            [
                jnp.max(jnp.abs(r[self.offsets[i] : self.offsets[i + 1]]))
                for i in range(self.nfields)
            ]
        )

    def errors(self, r: jax.Array):
        """(error_abs, error_rel) per reference lib/Solver.py:17,25-33.

        normalize = max over fields of per-field RHS 2-norms;
        error_abs = max field inf-norm; error_rel = error_abs / normalize.
        """
        res = self.field_norms(r)
        normalize = jnp.max(self.b0_norms)
        error_abs = jnp.max(res)
        error_rel = error_abs / jnp.where(normalize > 0, normalize, 1.0)
        return error_abs, error_rel
