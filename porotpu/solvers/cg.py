"""Preconditioned conjugate gradients as a single jitted while_loop.

Replaces PETSc KSP cg (used for the inexact inner solves:
``-s_ksp_type cg -s_ksp_norm_type unpreconditioned``,
reference petsc-options-inexact:12-15).  Entirely static shapes; the
tolerance-based early exit is the while_loop condition, matching the
"unpreconditioned" norm type of the reference options.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .convergence import FieldwiseTest
from .result import SolveResult


def cg(
    A,
    b,
    x0=None,
    M=None,
    rtol=1e-6,
    atol=0.0,
    maxiter=100,
    fieldwise: FieldwiseTest | None = None,
    divtol=1e20,
):
    """Solve A x = b with preconditioned CG.

    A, M: callables array->array.  Convergence on the unpreconditioned
    residual 2-norm (or the field-wise inf-norm test when ``fieldwise``
    is given — reference lib/Solver.py:8-51 semantics: converge when
    error_abs < atol OR error_rel < rtol).  Exits early with
    result.diverged=True when error_abs > ``divtol``
    (reference lib/Solver.py:46-48).
    """
    n = b.shape[0]
    dt = b.dtype
    if x0 is None:
        x0 = jnp.zeros(n, dtype=dt)
    if M is None:
        M = lambda r: r

    r0 = b - A(x0)
    z0 = M(r0)
    bnorm = jnp.linalg.norm(b)
    tol2 = jnp.maximum(atol, rtol * bnorm)

    history = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.float32)

    def res_ok(r):
        if fieldwise is not None:
            ea, er = fieldwise.errors(r)
            return (ea < atol) | (er < rtol), jnp.maximum(ea, 0.0)
        rn = jnp.linalg.norm(r)
        return rn <= tol2, rn

    done0, rn0 = res_ok(r0)
    history = history.at[0].set(rn0.astype(jnp.float32))

    def cond(c):
        x, r, z, p, rz, k, done, div, hist = c
        return (~done) & (~div) & (k < maxiter)

    def body(c):
        x, r, z, p, rz, k, done, div, hist = c
        Ap = A(p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        d, rn = res_ok(r)
        hist = hist.at[k + 1].set(rn.astype(jnp.float32))
        return (x, r, z, p, rz_new, k + 1, d, rn > divtol, hist)

    x, r, z, p, rz, k, done, div, history = jax.lax.while_loop(
        cond,
        body,
        (x0, r0, z0, z0, jnp.vdot(r0, z0), jnp.int32(0), done0,
         rn0 > divtol, history),
    )
    _, rn = res_ok(r)
    return SolveResult(x, k, rn, done, history, div)


def cg_fixed(A, b, x0=None, M=None, iters: int = 10):
    """Fixed-iteration CG (no convergence test) — jit/scan friendly.

    The TPU-native replacement for tolerance-based *inner* solves: the
    reference caps its inner fieldsplit CG at 10 iterations anyway
    (petsc-options-inexact:88 ``-fp_fieldsplit_0_ksp_max_it 10``).
    """
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros(n, dtype=b.dtype)
    if M is None:
        M = lambda r: r
    r0 = b - A(x0)
    z0 = M(r0)

    def body(c, _):
        x, r, z, p, rz = c
        Ap = A(p)
        pAp = jnp.vdot(p, Ap)
        safe = jnp.abs(pAp) > 0
        alpha = jnp.where(safe, rz / jnp.where(safe, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, z, p, rz_new), None

    (x, *_), _ = jax.lax.scan(
        body, (x0, r0, z0, z0, jnp.vdot(r0, z0)), None, length=iters
    )
    return x
