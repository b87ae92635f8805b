"""Alternating Anderson-Richardson (AAR) linear solver.

Re-implements lib/AAR.py as one jitted while_loop: preconditioned
Richardson steps ``x += omega * f`` on every iteration except each p-th,
which takes an Anderson step mixing the increment history
(lib/AAR.py:94-111).  The residual is *preconditioned*:
``f = PC (b - A x)`` (lib/AAR.py:133-137), and convergence is tested on
||f||_2 absolute and relative to the initial unpreconditioned residual
norm (lib/AAR.py:56-58, 67-73, 117-118).

TPU-native deviations (SURVEY.md §2.5 + §7.5):
- the Anderson least squares uses distributed-friendly Gram normal
  equations instead of the reference's gather-to-rank-0 QR + bcast
  (lib/AAR.py:100-108) — no sequential bottleneck, shards under psum;
- history pairs (dx_j, df_j) are kept aligned (the reference's X window
  trails its F window by one entry — an indexing artifact of its list
  zipping); this is the standard AAR formulation.

``pc_accel_order`` > 0 additionally wraps the preconditioner output in
Anderson acceleration across iterations — the reference's "inner accel
order" feature (lib/Preconditioner.py:28,248-249) — with the accelerator
state threaded through the loop carry (functional, jit-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .anderson import AndersonAccelerator, gram_ls_alpha
from .result import SolveResult


def aar(
    A,
    b,
    M=None,
    x0=None,
    order: int = 10,
    p: int = 5,
    omega: float = 1.0,
    beta: float = 1.0,
    rtol: float = 1e-8,
    atol: float = 1e-12,
    maxiter: int = 1000,
    pc_accel_order: int = 0,
    divtol: float = 1e20,
    monitor: bool = False,
):
    """Solve A x = b with the preconditioned AAR method.

    Parameters mirror the reference dict keys "AAR order"/"AAR p"/
    "AAR omega"/"AAR beta" (footing.py:80-83).  ``monitor`` prints the
    per-iteration step type ``[R]``/``[A]`` and residual norm from inside
    the jitted loop (reference lib/AAR.py:121-123).
    """
    n = b.shape[0]
    dt = b.dtype
    if x0 is None:
        x0 = jnp.zeros(n, dtype=dt)
    if M is None:
        M = lambda r: r
    m = max(order, 1)

    acc = AndersonAccelerator(pc_accel_order) if pc_accel_order > 0 else None
    acc_state0 = acc.init(n, dtype=dt) if acc else jnp.zeros((), dtype=dt)

    f_unprec = b - A(x0)
    error0 = jnp.linalg.norm(f_unprec)
    error0 = jnp.where(error0 > 0, error0, 1.0)
    # initial fk for the first Anderson pair is the *preconditioned*
    # residual, like the reference's first f (lib/AAR.py:133-137); error0
    # above stays unpreconditioned (lib/AAR.py:56-58)
    f0_prec = M(f_unprec)

    X0 = jnp.zeros((m, n), dtype=dt)
    F0 = jnp.zeros((m, n), dtype=dt)
    history = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.float32)
    history = history.at[0].set(error0.astype(jnp.float32))

    def cond(c):
        X, F, xk, fk, prev_dx, nh, it, err_abs, err_rel, hist, ast = c
        return (
            (err_abs > atol)
            & (err_rel > rtol)
            & (err_abs <= divtol)
            & (it < maxiter)
        )

    def body(c):
        X, F, xk, fk_old, prev_dx, nh, it, _, _, hist, ast = c
        g = M(b - A(xk))
        if acc is not None:
            ast, g = acc.step(ast, g)
        fk = g

        push = it > 0
        df = fk - fk_old
        X2 = jnp.where(push, jnp.roll(X, -1, axis=0).at[-1].set(prev_dx), X)
        F2 = jnp.where(push, jnp.roll(F, -1, axis=0).at[-1].set(df), F)
        nh2 = jnp.where(push, jnp.minimum(nh + 1, order), nh)

        fnorm = jnp.linalg.norm(fk)
        tiny = fnorm < 1e-14
        is_accel = (order > 0) & (((it + 1) % p) == 0) & (nh2 > 0)

        def accel(_):
            alpha = gram_ls_alpha(F2, fk, nh2)
            return xk + beta * fk + alpha @ (X2 + beta * F2)

        def richardson(_):
            return xk + omega * fk

        x2 = jax.lax.cond(is_accel, accel, richardson, None)
        x2 = jnp.where(tiny, xk, x2)

        if monitor:
            # reference lib/AAR.py:121-123 prints the step type per it
            jax.lax.cond(
                is_accel,
                lambda r: jax.debug.print(
                    "---- [AAR] it {i}  [A] res = {r:.6e}", i=it, r=r
                ),
                lambda r: jax.debug.print(
                    "---- [AAR] it {i}  [R] res = {r:.6e}", i=it, r=r
                ),
                fnorm,
            )

        err_abs = fnorm
        err_rel = err_abs / error0
        hist = hist.at[it + 1].set(err_abs.astype(jnp.float32))
        return (X2, F2, x2, fk, x2 - xk, nh2, it + 1, err_abs, err_rel, hist, ast)

    init = (
        X0,
        F0,
        x0,
        f0_prec,
        jnp.zeros(n, dtype=dt),
        jnp.int32(0),
        jnp.int32(0),
        error0,
        jnp.array(1.0, dtype=error0.dtype),
        history,
        acc_state0,
    )
    (X, F, xk, fk, prev_dx, nh, it, err_abs, err_rel, history, ast) = (
        jax.lax.while_loop(cond, body, init)
    )
    converged = (err_abs <= atol) | (err_rel <= rtol)
    return SolveResult(xk, it, err_abs, converged, history, err_abs > divtol)
