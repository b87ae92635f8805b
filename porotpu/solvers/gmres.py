"""GMRES / FGMRES with right preconditioning, as one jitted computation.

Replaces PETSc KSP gmres/fgmres (the reference's outer solver:
lib/Solver.py:92-101, ``-global_ksp_type gmres -global_ksp_pc_side right``,
restart = maxiter i.e. effectively unrestarted, lib/Solver.py:100).

TPU-first design decisions:
- the Krylov basis lives in a preallocated (m+1, n) buffer; orthogonalization
  is CGS2 (two passes of classical Gram-Schmidt) — two (m+1, n) matmuls that
  map onto the MXU, numerically equivalent to modified Gram-Schmidt but
  without the sequential inner loop MGS would force on the compiler
  (``-fp_ksp_gmres_modifiedgramschmidt`` parity in robustness, not in
  schedule).
- flexible (FGMRES) variant stores the preconditioned directions Z — needed
  because the block preconditioner contains inner *iterative* solves, hence
  is not a constant operator (SURVEY.md §2.3 PETSc KSP row).
- convergence on the unpreconditioned residual 2-norm
  (``-global_ksp_norm_type unpreconditioned``, petsc-options-inexact:5) or
  the field-wise inf-norm test of lib/Solver.py:8-51 via ``fieldwise=``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .anderson import AndersonAccelerator
from .convergence import FieldwiseTest
from .result import SolveResult


def _triangular_coeffs(H, g, kk, m):
    """Solve the leading kk x kk upper-triangular system, masked for jit."""
    i = jnp.arange(m)
    live = (i[:, None] < kk) & (i[None, :] < kk)
    Hm = jnp.where(live, H[:m, :m], jnp.eye(m, dtype=H.dtype))
    gm = jnp.where(i < kk, g[:m], 0.0)
    return jax.scipy.linalg.solve_triangular(Hm, gm, lower=False)


def _gmres_impl(
    A,
    b,
    x0,
    M,
    restart,
    rtol,
    atol,
    maxiter,
    flexible,
    fieldwise,
    divtol=1e20,
    pc_accel_order=0,
):
    n = b.shape[0]
    dt = b.dtype
    m = restart
    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(atol, rtol * bnorm)
    history = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.float32)
    # Anderson acceleration of the preconditioner output — the reference
    # applies "inner accel order" to *every* PC apply regardless of the
    # outer solver (lib/Preconditioner.py:28,248-249); state is threaded
    # through the Arnoldi loop carry (functional, jit-safe).
    acc = AndersonAccelerator(pc_accel_order) if pc_accel_order > 0 else None

    def cycle(x0c, it0, history, ast0):
        r0 = b - A(x0c)
        beta = jnp.linalg.norm(r0)
        V = jnp.zeros((m + 1, n), dtype=dt)
        V = V.at[0].set(r0 / jnp.where(beta > 0, beta, 1.0))
        Z = jnp.zeros((m if flexible else 1, n), dtype=dt)
        H = jnp.zeros((m + 1, m), dtype=dt)  # rotated (upper triangular R)
        Ho = jnp.zeros((m + 1, m), dtype=dt) if fieldwise is not None else None
        cs = jnp.zeros((m,), dtype=dt)
        sn = jnp.zeros((m,), dtype=dt)
        g = jnp.zeros((m + 1,), dtype=dt).at[0].set(beta)

        if fieldwise is not None:
            ea0, er0 = fieldwise.errors(r0)
            done0 = (ea0 < atol) | (er0 < rtol)
            res0 = ea0
        else:
            done0 = beta <= tol
            res0 = beta
        div0 = res0 > divtol
        history = history.at[it0].set(res0.astype(jnp.float32))

        def cond(c):
            (V, Z, H, Ho, cs, sn, g, k, res, done, div, hist, ast) = c
            return (~done) & (~div) & (k < m) & (it0 + k < maxiter)

        def body(c):
            (V, Z, H, Ho, cs, sn, g, k, res, done, div, hist, ast) = c
            v = V[k]
            z = M(v)
            if acc is not None:
                ast, z = acc.step(ast, z)
            w = A(z)
            if flexible:
                Z2 = Z.at[k].set(z)
            else:
                Z2 = Z
            mask = (jnp.arange(m + 1) <= k).astype(dt)
            h1 = (V @ w) * mask
            w = w - h1 @ V
            h2 = (V @ w) * mask
            w = w - h2 @ V
            h = h1 + h2
            hk1 = jnp.linalg.norm(w)
            V2 = V.at[k + 1].set(w / jnp.where(hk1 > 0, hk1, 1.0))

            col = h.at[k + 1].set(hk1)
            if Ho is not None:
                Ho2 = Ho.at[:, k].set(col)
            else:
                Ho2 = Ho

            # apply previous Givens rotations 0..k-1
            def rot(j, colc):
                t1 = cs[j] * colc[j] + sn[j] * colc[j + 1]
                t2 = -sn[j] * colc[j] + cs[j] * colc[j + 1]
                return colc.at[j].set(t1).at[j + 1].set(t2)

            col = jax.lax.fori_loop(0, k, rot, col)
            denom = jnp.sqrt(col[k] ** 2 + col[k + 1] ** 2)
            ok = denom > 0
            ck = jnp.where(ok, col[k] / jnp.where(ok, denom, 1.0), 1.0)
            sk = jnp.where(ok, col[k + 1] / jnp.where(ok, denom, 1.0), 0.0)
            cs2 = cs.at[k].set(ck)
            sn2 = sn.at[k].set(sk)
            col = col.at[k].set(denom).at[k + 1].set(0.0)
            H2 = H.at[:, k].set(col)
            g2 = g.at[k + 1].set(-sk * g[k]).at[k].set(ck * g[k])
            res2 = jnp.abs(g2[k + 1])

            if fieldwise is not None:
                # The true-residual reconstruction r = V_{k+2} (beta e1 -
                # Hbar y) costs an (m+1) x n matvec per iteration.  The
                # fieldwise error_abs is ||r||_inf (fields cover r), and
                # ||r||_inf >= ||r||_2 / sqrt(n) with ||r||_2 = |g[k+1]|
                # free from the Givens recurrence — so error_abs < fw_tol
                # is IMPOSSIBLE while |g[k+1]| >= sqrt(n) * fw_tol.  Only
                # reconstruct once the cheap bound admits convergence:
                # skips the matmul for all early iterations, can never
                # delay convergence detection.
                fw_tol = jnp.maximum(atol, rtol * jnp.max(fieldwise.b0_norms))
                fw_tol = fw_tol * jnp.sqrt(jnp.asarray(n, dtype=dt))

                def _reconstruct(_):
                    y = _triangular_coeffs(H2, g2, k + 1, m)
                    zeta = (
                        jnp.zeros((m + 1,), dtype=dt).at[0].set(beta)
                        - Ho2[:, :m] @ y
                    )
                    rvec = zeta @ V2
                    ea, er = fieldwise.errors(rvec)
                    return (ea < atol) | (er < rtol), ea

                def _skip(_):
                    # report the 2-norm upper bound; not converged yet
                    return jnp.bool_(False), res2

                done2, res_rep = jax.lax.cond(
                    res2 < fw_tol, _reconstruct, _skip, None
                )
            else:
                done2 = res2 <= tol
                res_rep = res2
            div2 = res_rep > divtol
            hist = hist.at[it0 + k + 1].set(res_rep.astype(jnp.float32))
            return (V2, Z2, H2, Ho2, cs2, sn2, g2, k + 1, res_rep, done2, div2, hist, ast)

        carry = (V, Z, H, Ho, cs, sn, g, jnp.int32(0), res0, done0, div0, history, ast0)
        (V, Z, H, Ho, cs, sn, g, k, res, done, div, history, ast) = jax.lax.while_loop(
            cond, body, carry
        )

        y = _triangular_coeffs(H, g, k, m)
        if flexible:
            dx = y @ Z
        else:
            dx = M(y[: m] @ V[:m])
            if acc is not None:
                # PETSc-parity: the final right-PC application goes through
                # the same (stateful) accelerated PC context
                # (lib/Preconditioner.py:248-249 under KSPBuildSolution)
                ast, dx = acc.step(ast, dx)
        return x0c + dx, it0 + k, res, done, div, history, ast

    def outer_cond(c):
        x, it, res, done, div, hist, ast = c
        return (~done) & (~div) & (it < maxiter)

    def outer_body(c):
        x, it, res, done, div, hist, ast = c
        x, it, res, done, div, hist, ast = cycle(x, it, hist, ast)
        return (x, it, res, done, div, hist, ast)

    r_init = b - A(x0)
    if fieldwise is not None:
        ea, er = fieldwise.errors(r_init)
        done_init = (ea < atol) | (er < rtol)
        res_init = ea
    else:
        res_init = jnp.linalg.norm(r_init)
        done_init = res_init <= tol
    ast0 = acc.init(n, dtype=dt) if acc else jnp.zeros((), dtype=dt)

    x, it, res, done, div, history, ast = jax.lax.while_loop(
        outer_cond,
        outer_body,
        (x0, jnp.int32(0), res_init, done_init, res_init > divtol, history, ast0),
    )
    return SolveResult(x, it, res, done, history, div)


def fgmres(
    A,
    b,
    x0=None,
    M=None,
    restart=None,
    rtol=1e-6,
    atol=0.0,
    maxiter=100,
    fieldwise: FieldwiseTest | None = None,
    divtol=1e20,
    pc_accel_order: int = 0,
):
    """Flexible GMRES, right-preconditioned (stores Z directions).

    ``divtol``: divergence guard — exit with result.diverged=True when the
    residual exceeds it (reference lib/Solver.py:46-48, PETSc default 1e20).
    ``pc_accel_order``: Anderson-accelerate the PC output every iteration
    (reference "inner accel order", lib/Preconditioner.py:248-249).
    """
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros(n, dtype=b.dtype)
    if M is None:
        M = lambda r: r
    if restart is None:
        restart = maxiter
    restart = min(restart, maxiter)
    return _gmres_impl(
        A, b, x0, M, restart, rtol, atol, maxiter, True, fieldwise,
        divtol, pc_accel_order,
    )


def gmres(
    A,
    b,
    x0=None,
    M=None,
    restart=None,
    rtol=1e-6,
    atol=0.0,
    maxiter=100,
    fieldwise: FieldwiseTest | None = None,
    divtol=1e20,
    pc_accel_order: int = 0,
):
    """Right-preconditioned GMRES (constant M; recomputes M(V y) per cycle).

    NOTE: with an inner-iterative (non-constant) preconditioner this is only
    correct in the FGMRES sense; the model layer selects fgmres whenever the
    preconditioner contains inner Krylov solves, like PETSc users switching
    gmres->fgmres.  Kept for parity with ``"solver type": "gmres"``.

    ``pc_accel_order`` matters here specifically: Anderson-mixing the PC
    output inside *flexible* GMRES provably leaves the minimization span
    (hence the residual history) unchanged — the mixed direction is a linear
    combination of previous stored directions plus the new one.  The
    reference's "inner accel order" changes convergence exactly because
    PETSc gmres is NOT flexible (lib/Preconditioner.py:248-249 under
    ``-global_ksp_type gmres``); this variant reproduces that behavior.
    """
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros(n, dtype=b.dtype)
    if M is None:
        M = lambda r: r
    if restart is None:
        restart = maxiter
    restart = min(restart, maxiter)
    return _gmres_impl(
        A, b, x0, M, restart, rtol, atol, maxiter, False, fieldwise, divtol,
        pc_accel_order,
    )
