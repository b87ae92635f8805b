"""Common solver result container (KSP-like reporting surface).

Mirrors the information the reference reads back from PETSc KSP:
iteration count (lib/Solver.py:145-146), convergence flag
(lib/Solver.py:42-51) and per-iteration residual history (monitor).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class SolveResult:
    x: jax.Array
    iters: jax.Array  # int32 scalar
    res: jax.Array  # final residual norm (solver's norm type)
    converged: jax.Array  # bool scalar (True = tolerance met)
    history: jax.Array  # (maxiter+1,) residual norms, NaN-padded
    diverged: jax.Array  # bool scalar (True = error_abs exceeded divtol,
    # reference lib/Solver.py:46-48 "convergence test" return -1)

    def tree_flatten(self):
        return (
            self.x,
            self.iters,
            self.res,
            self.converged,
            self.history,
            self.diverged,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def getIterationNumber(self):
        """PETSc KSP API parity (reference lib/AAR.py:130-131)."""
        return int(self.iters)
