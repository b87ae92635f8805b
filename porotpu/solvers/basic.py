"""Trivial solver types: preonly and (damped) Richardson.

PETSc parity: ``-ksp_type preonly`` (one PC application, the reference's
exact inner solves, petsc-options-exact:11-35) and ``-ksp_type richardson``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def preonly(A, b, M, x0=None):
    """x = M(b): single preconditioner application."""
    del A, x0
    return M(b)


def richardson(A, b, M=None, omega=1.0, iters=10, x0=None):
    """Damped preconditioned Richardson: x += omega * M(b - A x)."""
    if M is None:
        M = lambda r: r
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros(n, dtype=b.dtype)

    def body(x, _):
        x = x + omega * M(b - A(x))
        return x, None

    x, _ = jax.lax.scan(body, x0, None, length=iters)
    return x
